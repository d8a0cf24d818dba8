"""Pallas TPU kernel: single-pass tiled prefix structure for segment sums.

The scatter-free segment reduction (ops/segment.py) needs, for a sorted
stream of N rows: per-chunk inclusive prefix sums plus the chunk totals
(its hierarchical two-level structure).  XLA lowers jnp.cumsum to a
multi-pass scan over HBM; this kernel produces BOTH outputs in one
HBM read / one write per element:

  grid tile i (rows [i*T, (i+1)*T)):
      local  = cumsum(tile)          # VPU within-tile scan
      out[i] = local                 # per-chunk inclusive prefix
      tots[i]= local[-1]             # chunk total

The second-level (tiny, n_tiles x D) scan and the boundary gathers stay in
XLA.  Keeping per-chunk (not global) prefixes also bounds float32
cancellation by the tile length, matching ops/segment.py semantics
(CHUNK == tile size).

Falls back to pure jnp off-TPU (interpret mode used in CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fish_eye_bundle_adjustment_tpu.ops import segment

TILE = segment.CHUNK  # keep numerics identical to the jnp path


def _kernel(x_ref, out_ref):
    # Hillis-Steele inclusive scan along the sublane axis (Mosaic has no
    # cumsum primitive): log2(TILE) shifted adds, all VPU-elementwise.
    x = x_ref[:]
    d = x.shape[1]
    shift = 1
    while shift < x.shape[0]:
        shifted = jnp.concatenate(
            [jnp.zeros((shift, d), x.dtype), x[:-shift]], axis=0
        )
        x = x + shifted
        shift *= 2
    out_ref[:] = x


def chunk_prefix_pallas(vals, interpret: bool = False):
    """vals (N, D), N % TILE == 0 -> (per-chunk inclusive prefix (N, D),
    chunk totals (N//TILE, D)).  Chunk totals are the last row of each
    chunk's prefix (a tiny strided slice — a separate small-block output
    would violate the (8, 128) tile constraint)."""
    n, d = vals.shape
    assert n % TILE == 0, (n, TILE)
    n_tiles = n // TILE
    # NB: the zero block coordinate must be i32 — with jax_enable_x64 a
    # bare `0` literal traces as i64 and Mosaic fails to legalize the
    # index-map return (mixed i32/i64).
    zero = lambda i: (i, jnp.zeros((), jnp.int32))
    prefix = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((TILE, d), zero, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, d), zero, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), vals.dtype),
        interpret=interpret,
    )(vals)
    chunk_tot = prefix[TILE - 1 :: TILE]
    return prefix, chunk_tot


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def sorted_segment_sum_pallas(vals, layout: segment.SegmentLayout,
                              interpret: bool = False):
    """Pallas-accelerated sorted segment sum (same contract/numerics as
    segment.sorted_segment_sum).  The chunk prefix is computed once and
    shared between the begin/end boundary lookups."""
    n, d = vals.shape
    if n % TILE != 0:
        pad = TILE - n % TILE
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, d), vals.dtype)], axis=0
        )
    local_flat, chunk_tot = chunk_prefix_pallas(vals, interpret=interpret)
    offs = jnp.concatenate(
        [jnp.zeros((1, d), vals.dtype), jnp.cumsum(chunk_tot, axis=0)], axis=0
    )

    def ex(rows):
        q = rows // TILE
        m = rows % TILE
        inner = jnp.where(
            (m > 0)[:, None], local_flat[jnp.maximum(rows - 1, 0)], 0.0
        )
        return offs[q] + inner

    return ex(layout.ends) - ex(layout.begs)
