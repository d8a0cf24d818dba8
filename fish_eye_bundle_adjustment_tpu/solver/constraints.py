"""Inner-constraints (free-network datum) matrix G.

The reference adds d=7 datum-defect constraints (3 translation, 3 rotation,
1 scale) over the camera-station EOP block only — tie-point and IOP rows of
G stay zero (BuildAwG.m:514-527) — and solves the bordered KKT system
[N G; G' 0] (main.m:428-440).

Per-image 6x7 block, built from the CURRENT pose estimates each iteration
(columns: Tx Ty Tz Rx Ry Rz scale):

  Xc row:  [1 0 0 |   0  -Zc   Yc | Xc]
  Yc row:  [0 1 0 |  Zc    0  -Xc | Yc]
  Zc row:  [0 0 1 | -Yc   Xc    0 | Zc]
  w  row:  [0 0 0 |  -1  -sin(w)tan(p)  cos(w)tan(p) | 0]
  p  row:  [0 0 0 |   0  -cos(w)        -sin(w)      | 0]
  k  row:  [0 0 0 |   0   sin(w)/cos(p) -cos(w)/cos(p) | 0]

The reference's row placement assumes all six EOPs are estimated (it always
writes 6 rows at the image's xhat offset); we validate that instead of
silently mis-aligning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

NUM_INNER_CONSTRAINTS = 7


def _g_block(eop):
    Xc, Yc, Zc, w, p = eop[0], eop[1], eop[2], eop[3], eop[4]
    sw, cw = jnp.sin(w), jnp.cos(w)
    tp = jnp.tan(p)
    sec = 1.0 / jnp.cos(p)
    z = jnp.zeros((), Xc.dtype)
    one = jnp.ones((), Xc.dtype)
    return jnp.array(
        [
            [one, z, z, z, -Zc, Yc, Xc],
            [z, one, z, Zc, z, -Xc, Yc],
            [z, z, one, -Yc, Xc, z, Zc],
            [z, z, z, -one, -sw * tp, cw * tp, z],
            [z, z, z, z, -cw, -sw, z],
            [z, z, z, z, sw * sec, -cw * sec, z],
        ]
    )


def validate_inner_constraints(layout: ParamLayout):
    if layout.n_eop != 6:
        raise ValueError(
            "Inner_Constraints requires all six EOPs to be estimated "
            "(the reference's G-row placement assumes it, BuildAwG.m:522-526)"
        )


def build_G(layout: ParamLayout, q):
    """(u, 7) inner-constraint matrix from the current q-vector.

    EOP entries have unit conditioning scale, so q-space == x-space here.
    jittable."""
    eop, _, _ = layout.unpack_scaled(q)
    blocks = jax.vmap(_g_block)(eop)  # (n_img, 6, 7)
    G = jnp.zeros((layout.u, NUM_INNER_CONSTRAINTS), dtype=q.dtype)
    return G.at[: layout.eop_size].set(blocks.reshape(layout.eop_size, 7))
