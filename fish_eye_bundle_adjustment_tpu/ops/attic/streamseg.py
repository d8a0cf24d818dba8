"""Pallas TPU kernel: streaming segmented reduce over a sorted stream.

The round-2 verdict mandated a real attempt at a streaming segmented
reduction that makes ONE pass over the tie-sorted observation stream with
no scan tree and no scatter (reference analogue: the serial accumulation
in BuildAwG.m:46 / main.m:424-425).  This is that kernel, in the form
that is actually expressible on TPU (per-row dynamic indexing inside a
kernel is not — see bench_pallas_gather.py):

  * Segments are grouped M at a time (host-static GroupedSegPlan).  A
    group's rows are one contiguous span of the sorted stream, padded to
    the worst-case span T over all groups (T also absorbs the 128-lane
    alignment of each span's DMA start).
  * The stream is passed TRANSPOSED as (D, N): sublane dim D (8-padded),
    lane dim N — unpadded HBM layout, unlike (N, D<128) arrays which XLA
    tiles to 128 lanes (3.6-21x physical amplification).
  * Grid step g: manual DMAs copy the span (D, T) plus a static
    rel-segment-id row (seg_id % M, f32) into VMEM; the (M, T)
    membership mask is rel == broadcasted_iota (no per-row indexing),
    guarded to the group's own rows by two scalar-prefetched bounds; the
    partial sums are one (D, T) x (T, M) MXU contraction written to the
    aligned output block (D, g*M:(g+1)*M).

One HBM read of the stream (amplified only by the span padding T/avg and
the sublane rounding of D), zero intermediate HBM traffic, no log-N scan
passes.  A/B numbers vs the XLA prefix-sum segsum are recorded in
BASELINE.md; `sorted_segment_sum_streaming` is the drop-in entry.

PRODUCTION LINEAGE (round 4): this kernel's grouped-span design — the
host-static GroupedSegPlan, 128-aligned DMA starts, the rel-row tie
mask, the (D, N) transposed stream layout — is the foundation of
ops/fusedmv.py, which generalizes it from one segmented reduction to
the ENTIRE matrix-free Schur operator (expansion + elimination +
reduction + preconditioner in one pass) and is what solve_schur runs
on TPU.  This standalone op remains the minimal form of the idea (and
its regression benchmark, bench_streamseg.py); routing the generic
DualAxisPlan reductions through it was measured NOT to pay because the
(N, D) -> (D, N) transpose at the call boundary costs more than the
2.1x reduction win — the fused kernel wins precisely because it keeps
the whole pipeline in the transposed layout.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


class GroupTooWide(ValueError):
    """A segment group's span exceeds the VMEM-safe bound; fall back to
    the XLA prefix-sum segment sum (ops/segment.py)."""


@dataclasses.dataclass(frozen=True)
class GroupedSegPlan:
    """Host-static grouping of consecutive segments for the streaming
    reduce: group g covers segments [g*M, (g+1)*M) whose rows form the
    contiguous span [first_row[g], end_row[g]), DMA'd from the 128-aligned
    row_start[g] with span <= T."""

    row_start: np.ndarray  # (G,) int32 128-aligned DMA start per group
    first_row: np.ndarray  # (G,) int32 first row owned by the group
    end_row: np.ndarray  # (G,) int32 one past the last row owned
    rel: np.ndarray  # (n_pad,) float32 seg_id % M per row (-1 padding)
    n_seg: int
    n_rows: int  # unpadded stream length N
    n_pad: int  # padded stream length the kernel expects
    T: int  # worst-case aligned span, rounded up to 128 lanes
    M: int  # segments per group

    @staticmethod
    def build(begs: np.ndarray, ends: np.ndarray, M: int = 128,
              max_T: int = 64 * 1024) -> "GroupedSegPlan":
        """Raises GroupTooWide when the worst-case aligned span exceeds
        `max_T` lanes: one hot segment (a tie seen by thousands of
        observations, or heavily skewed counts) would make the (D, T)
        VMEM scratch and per-step DMA arbitrarily large — past ~16 MB
        VMEM the kernel cannot compile, and well before that the
        read amplification erases the one-pass advantage.  Callers fall
        back to the XLA prefix-sum path (ops/segment.py)."""
        begs = np.asarray(begs, np.int64)
        ends = np.asarray(ends, np.int64)
        n_seg = begs.shape[0]
        if n_seg:
            # segments must contiguously tile [0, n_rows): `rel` is built
            # by np.repeat from segment lengths, so a leading gap or
            # overlapping segments would silently misalign it vs rows
            if int(begs[0]) != 0 or not np.array_equal(begs[1:], ends[:-1]):
                raise ValueError(
                    "GroupedSegPlan requires contiguous segments tiling "
                    "[0, n_rows) (begs[0]==0, begs[i+1]==ends[i])"
                )
        n_rows = int(ends[-1]) if n_seg else 0
        G = max(1, -(-max(n_seg, 1) // M))
        pad = G * M - n_seg
        begs_p = np.concatenate([begs, np.full(pad, n_rows, np.int64)])
        ends_p = np.concatenate([ends, np.full(pad, n_rows, np.int64)])
        gb = begs_p.reshape(G, M)
        ge = ends_p.reshape(G, M)
        first_row = gb[:, 0]
        end_row = ge[:, -1]
        # DMA lane offsets must be 128-aligned (HBM (8,128) tiling): align
        # each span start down; the worst-case span T absorbs the slack.
        row_start = (first_row // 128) * 128
        span = end_row - row_start
        T = int(max(128, -(-int(span.max()) // 128) * 128)) if n_seg else 128
        if T > max_T:
            raise GroupTooWide(
                f"worst-case group span T={T} exceeds max_T={max_T} "
                f"(M={M} segments/group; a hot or skewed segment)"
            )
        n_pad = int(max(row_start.max() + T, n_rows)) if n_seg else T
        # static rel-segment ids: seg_id % M per row; -1 on padding rows
        seg_id = np.repeat(
            np.arange(n_seg, dtype=np.int64), (ends - begs).astype(np.int64)
        )
        rel = np.full(n_pad, -1.0, np.float32)
        rel[:n_rows] = (seg_id % M).astype(np.float32)
        return GroupedSegPlan(
            row_start=row_start.astype(np.int32),
            first_row=first_row.astype(np.int32),
            end_row=end_row.astype(np.int32),
            rel=rel,
            n_seg=n_seg,
            n_rows=n_rows,
            n_pad=n_pad,
            T=T,
            M=M,
        )

    @property
    def G(self) -> int:
        return self.row_start.shape[0]

    @property
    def read_amplification(self) -> float:
        """HBM rows read / logical rows (span + alignment overhead)."""
        return self.G * self.T / max(self.n_rows, 1)


def _kernel(rs_ref, fr_ref, er_ref, vals_ref, rel_ref, out_ref,
            scratch, rel_s, sem, sem2, *, T, M, D):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    # start is carried in 128-lane block units so Mosaic can prove the DMA
    # offset is tile-aligned (a raw i32 offset fails to legalize)
    start = rs_ref[i] * 128
    copy = pltpu.make_async_copy(
        vals_ref.at[:, pl.ds(start, T)], scratch, sem
    )
    copy.start()
    copy2 = pltpu.make_async_copy(
        rel_ref.at[:, pl.ds(start, T)], rel_s, sem2
    )
    copy2.start()
    lo = fr_ref[i] - start  # first column owned by this group
    hi = er_ref[i] - start  # one past the last owned column
    col = jax.lax.broadcasted_iota(jnp.int32, (M, T), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (M, T), 0)
    copy2.wait()
    rel = rel_s[0, :].astype(jnp.int32).reshape(1, T)
    mask = jnp.logical_and(
        row == rel, jnp.logical_and(col >= lo, col < hi)
    ).astype(jnp.float32)
    copy.wait()
    # HIGHEST precision: the default MXU f32 path truncates operands to
    # bf16 (measured 1.7e-3 rel err); the mask is exact 0/1 so full f32
    # product fidelity is needed on the vals operand.
    out_ref[:, :] = jax.lax.dot_general(
        scratch[:, :], mask,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (D, M)


def streaming_segment_sum_t(vals_t: jax.Array, plan: GroupedSegPlan,
                            interpret: bool = False):
    """Segment sums of a sorted stream held TRANSPOSED.

    vals_t: (D, n) float32, n >= plan.n_rows (padded to plan.n_pad here;
    padding rows belong to no segment).  Returns (D, n_seg)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = vals_t.shape[0]
    G, M, T = plan.G, plan.M, plan.T
    if vals_t.shape[1] < plan.n_pad:
        vals_t = jnp.pad(
            vals_t, ((0, 0), (0, plan.n_pad - vals_t.shape[1]))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # row_start/128, first_row, end_row (SMEM)
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # vals (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # rel row (manual DMA)
        ],
        # NB: literal 0 in an index map traces as i64 under jax_enable_x64
        # and Mosaic fails to legalize the mixed i32/i64 return (see
        # ops/prefix.py) — use an i32 zero.
        out_specs=pl.BlockSpec(
            (D, M), lambda g, *_: (jnp.zeros((), jnp.int32), g),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((D, T), jnp.float32),
            pltpu.VMEM((1, T), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, M=M, D=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, G * M), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(plan.row_start) // 128,
        jnp.asarray(plan.first_row),
        jnp.asarray(plan.end_row),
        vals_t,
        jnp.asarray(plan.rel).reshape(1, -1),
    )
    return out[:, : plan.n_seg]


def sorted_segment_sum_streaming(vals: jax.Array, plan: GroupedSegPlan,
                                 interpret: bool = False):
    """Drop-in (N, D) -> (n_seg, D) wrapper: transposes at the boundary.

    The transpose costs one (N, D) pass; producers that can emit the
    transposed stream directly should call streaming_segment_sum_t."""
    return streaming_segment_sum_t(vals.T, plan, interpret=interpret).T
