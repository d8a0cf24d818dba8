"""Fused banded Pallas kernel for the matrix-free Schur operator.

One pallas_call evaluates the whole reduced-camera-system product

    S v = Ac' Ac v  -  Ac' Ap Hpp^-1 Ap' Ac v

over the tie-RANK-sorted observation stream (ops/bandplan.py): the XLA
path pays five ~2.6 ns/row gather/segsum passes per matvec
(solver/schur.py schur_matvec); here every coupling is an MXU mask
contraction against host-planned structure:

  per group g (M tie ranks, span T lanes, image band [base, base+W)):
    V   = vb . mask_img          camera-vector expansion  (one-hot cols)
    a   = sum_d Aex_d * V_d (+ IOP terms + optional injected rows)
    t   = [Ap a] . mask_tie'     per-tie reduction
    y   = Hpp^-1 t               3x3 blocks, contiguous in rank order
    Y   = y . mask_tie           per-tie expansion (one-hot cols)
    b   = a - sum_d Ap_d Y_d
    out+= [Ac b] . mask_img'     camera-axis reduction (accumulated)

All streams are sqrt(W)-folded (Ae = sqrt(w) Je etc.), carried
TRANSPOSED (D, n_pad) — the unpadded HBM layout (see ops/attic/streamseg.py) —
and double-buffer DMA'd span by span.  The camera vector lives whole in
VMEM (8 x n_img_pad floats) and is sliced per group at the 128-aligned
band offset.

Precision: MXU f32 ops truncate operands to bf16.  The masks are exact
0/1; the value operand is split hi/lo ("bf16x2": v = hi + lo, two dots,
f32 accumulation, ~1.5e-5 relative) by default — enough for CG, whose
fixed point is set by the residual evaluation, not the matvec (an
inexact operator only perturbs the iteration path).  'bf16' is a
cheaper knob for the loose early forcing tolerances.

Modes (static): with_v expands the camera vector; with_a adds injected
per-row values (whitened residuals).  One kernel therefore serves
  matvec          (with_v, not with_a)
  reduced_rhs     (rows = sqrt(w) r; negate outside)
  back_substitute (v = dc, rows = sqrt(w) r; dp = -y)

Reference analogue being replaced: the dense N = A'PA products of
main.m:424-425 built from BuildAwG.m:46's serial loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fish_eye_bundle_adjustment_tpu.ops.bandplan import BandPlan


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BandArrays:
    """Device-side banded-plan arrays + static geometry (meta fields)."""

    sb: jax.Array  # (G,) int32 row_start // 128
    fr: jax.Array  # (G,) int32 first owned row
    er: jax.Array  # (G,) int32 one past last owned row
    ib: jax.Array  # (G,) int32 img_base // 128
    rel: jax.Array  # (1, n_pad) f32 tie rank % M (-1 pad)
    imgrow: jax.Array  # (1, n_pad) f32 image rank (-1 pad)
    img_of_imgrank: jax.Array  # (n_img,) int32
    imgrank_of_img: jax.Array  # (n_img,) int32
    rank_of_slot: jax.Array  # (n_tie,) int32
    slot_of_rank: jax.Array  # (n_tie,) int32
    M: int = dataclasses.field(metadata=dict(static=True), default=128)
    T: int = dataclasses.field(metadata=dict(static=True), default=128)
    W: int = dataclasses.field(metadata=dict(static=True), default=128)
    G: int = dataclasses.field(metadata=dict(static=True), default=1)
    n_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_img_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_tie: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_img: int = dataclasses.field(metadata=dict(static=True), default=0)

    @staticmethod
    def from_plan(plan: BandPlan) -> "BandArrays":
        return BandArrays(
            sb=jnp.asarray(plan.row_start // 128),
            fr=jnp.asarray(plan.first_row),
            er=jnp.asarray(plan.end_row),
            ib=jnp.asarray(plan.img_base // 128),
            rel=jnp.asarray(plan.rel).reshape(1, -1),
            imgrow=jnp.asarray(plan.imgrow).reshape(1, -1),
            img_of_imgrank=jnp.asarray(plan.img_of_imgrank),
            imgrank_of_img=jnp.asarray(plan.imgrank_of_img),
            rank_of_slot=jnp.asarray(plan.rank_of_slot),
            slot_of_rank=jnp.asarray(plan.slot_of_rank),
            M=plan.M, T=plan.T, W=plan.W, G=plan.G,
            n_pad=plan.n_pad, n_img_pad=plan.n_img_pad,
            n_tie=plan.n_tie, n_img=plan.n_img,
        )


def _hilo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, dims, precision):
    """f32-accumulated mask contraction with bf16 / bf16x2 operand split.

    `b` is an exact 0/1 mask (bf16-representable); only `a` needs the
    hi/lo treatment."""
    bb = b.astype(jnp.bfloat16)
    if precision == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), bb, dims,
            preferred_element_type=jnp.float32,
        )
    hi, lo = _hilo(a)
    out = jax.lax.dot_general(
        hi, bb, dims, preferred_element_type=jnp.float32
    )
    return out + jax.lax.dot_general(
        lo, bb, dims, preferred_element_type=jnp.float32
    )


_CONTRACT_LAST = (((1,), (1,)), ((), ()))  # (p, T) x (q, T) -> (p, q)


def _kernel(sb, fr, er, ib, vi_ref,  # scalar prefetch
            acam, apt, relv, imgv, arows, vpose_ref, hpi_ref,  # inputs
            *refs,  # outputs (3 or 5 with_precond), then scratch
            ne, ni, M, T, W, G, with_v, with_a, with_precond, precision):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if with_precond:
        (out_pose, out_iop, out_y, out_p21, out_i55,
         sc_cam, sc_pt, sc_rel, sc_img, sc_a, sems) = refs
    else:
        (out_pose, out_iop, out_y,
         sc_cam, sc_pt, sc_rel, sc_img, sc_a, sems) = refs
        out_p21 = out_i55 = None

    g = pl.program_id(0)
    CA = sc_cam.shape[1]
    f32 = jnp.float32

    def dmas(gi, slot):
        start = sb[gi] * 128
        streams = [(acam, sc_cam), (apt, sc_pt), (relv, sc_rel),
                   (imgv, sc_img)]
        if with_a:
            streams.append((arows, sc_a))
        for j, (src, dst) in enumerate(streams):
            yield pltpu.make_async_copy(
                src.at[:, pl.ds(start, T)], dst.at[slot],
                sems.at[slot, jnp.int32(j)],
            )

    # NB: literals trace as i64 under jax_enable_x64 — keep indices i32
    one = jnp.int32(1)
    two = jnp.int32(2)
    slot = jax.lax.rem(g, two)
    nxt = jax.lax.rem(g + one, two)

    zero = jnp.int32(0)

    @pl.when(g == 0)
    def _():
        for c in dmas(zero, zero):
            c.start()
        # zero the resident accumulators once
        out_pose[...] = jnp.zeros(out_pose.shape, jnp.float32)
        out_iop[...] = jnp.zeros(out_iop.shape, jnp.float32)
        if with_precond:
            out_p21[...] = jnp.zeros(out_p21.shape, jnp.float32)
            out_i55[...] = jnp.zeros(out_i55.shape, jnp.float32)

    @pl.when(g + one < G)
    def _():
        for c in dmas(g + one, nxt):
            c.start()

    for c in dmas(g, slot):
        c.wait()

    start = sb[g] * 128
    lo = fr[g] - start
    hi_b = er[g] - start
    base = ib[g] * 128

    cam = sc_cam[slot]  # (CA, T)
    pt = sc_pt[slot]  # (8, T)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    live = jnp.logical_and(col >= lo, col < hi_b)
    livef = live.astype(f32)

    img_i = sc_img[slot][0, :].astype(jnp.int32).reshape(1, T)
    wrow = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0) + base
    mimg = jnp.logical_and(wrow == img_i, live).astype(f32)  # (W, T)

    # a = Ac v (+ injected rows), masked to the group's own columns
    ax = jnp.zeros((1, T), f32)
    ay = jnp.zeros((1, T), f32)
    if with_v:
        vb = vpose_ref[:, pl.ds(pl.multiple_of(base, 128), W)]  # (8, W)
        V = _dot(vb, mimg, (((1,), (0,)), ((), ())), precision)  # (8, T)
        ax = ax + jnp.sum(cam[0:ne] * V[0:ne], axis=0, keepdims=True)
        ay = ay + jnp.sum(cam[ne : 2 * ne] * V[0:ne], axis=0, keepdims=True)
        for i in range(ni):
            vi = vi_ref[i]
            ax = ax + vi * cam[2 * ne + i : 2 * ne + i + 1]
            ay = ay + vi * cam[2 * ne + ni + i : 2 * ne + ni + i + 1]
    if with_a:
        a_sc = sc_a[slot]
        ax = ax + a_sc[0:1]
        ay = ay + a_sc[1:2]
    ax = ax * livef
    ay = ay * livef

    # per-tie reduction -> Hpp^-1 -> expansion
    rel_i = sc_rel[slot][0, :].astype(jnp.int32).reshape(1, T)
    mrow = jax.lax.broadcasted_iota(jnp.int32, (M, T), 0)
    mtie = jnp.logical_and(mrow == rel_i, live).astype(f32)  # (M, T)
    P2 = pt[0:3] * ax + pt[3:6] * ay  # (3, T)
    t = _dot(P2, mtie, _CONTRACT_LAST, precision)  # (3, M)
    hb = hpi_ref[...]  # (16, M), rows p*3+q of Hpp^-1
    y = jnp.concatenate(
        [
            sum(hb[3 * p + q : 3 * p + q + 1] * t[q : q + 1] for q in range(3))
            for p in range(3)
        ],
        axis=0,
    )  # (3, M)
    out_y[...] = jnp.concatenate(
        [y, jnp.zeros((out_y.shape[0] - 3, M), f32)], axis=0
    )
    Y = _dot(
        y, mtie, (((1,), (0,)), ((), ())), precision
    )  # (3, M) x (M, T) -> (3, T)
    bx = ax - jnp.sum(pt[0:3] * Y, axis=0, keepdims=True)
    by = ay - jnp.sum(pt[3:6] * Y, axis=0, keepdims=True)

    # camera-axis reductions (accumulated across groups)
    Be = cam[0:ne] * bx + cam[ne : 2 * ne] * by  # (ne, T)
    if ne < 8:
        Be = jnp.concatenate([Be, jnp.zeros((8 - ne, T), f32)], axis=0)
    O = _dot(Be, mimg, _CONTRACT_LAST, precision)  # (8, W)
    off = pl.ds(pl.multiple_of(base, 128), W)
    out_pose[:, off] = out_pose[:, off] + O
    if ni:
        Pi = (
            cam[2 * ne : 2 * ne + ni] * bx
            + cam[2 * ne + ni : 2 * ne + 2 * ni] * by
        )  # (ni, T)
        part = jnp.sum(Pi.reshape(ni, T // 128, 128), axis=1)  # (ni, 128)
        if ni < 8:
            part = jnp.concatenate(
                [part, jnp.zeros((8 - ni, 128), f32)], axis=0
            )
        out_iop[...] = out_iop[...] + part

    if with_precond:
        # Schur-Jacobi blocks in one extra pass over the VMEM-resident
        # spans: pose-diagonal sym columns with the exact per-observation
        # Hpp^-1 correction (schur.py pose_precond_sym semantics), IOP
        # diagonal without correction (iop_precond_sym)
        Hrow = _dot(
            hb, mtie, (((1,), (0,)), ((), ())), precision
        )  # (16, T): row 3p+q = Hpp^-1[p,q] of the row's tie
        B = [
            [
                cam[e : e + 1] * pt[p : p + 1]
                + cam[ne + e : ne + e + 1] * pt[3 + p : 3 + p + 1]
                for p in range(3)
            ]
            for e in range(ne)
        ]
        C = [
            [
                sum(
                    B[e][p] * Hrow[3 * p + q : 3 * p + q + 1]
                    for p in range(3)
                )
                for q in range(3)
            ]
            for e in range(ne)
        ]
        rows = []
        for e in range(ne):
            for f in range(e, ne):
                hcc = (
                    cam[e : e + 1] * cam[f : f + 1]
                    + cam[ne + e : ne + e + 1] * cam[ne + f : ne + f + 1]
                )
                corr = sum(C[e][q] * B[f][q] for q in range(3))
                rows.append(hcc - corr)
        npair = len(rows)
        p_rows = out_p21.shape[0]
        sym = jnp.concatenate(
            rows + [jnp.zeros((p_rows - npair, T), f32)], axis=0
        ) * livef  # (p_rows, T)
        Op = _dot(sym, mimg, _CONTRACT_LAST, precision)  # (p_rows, W)
        out_p21[:, off] = out_p21[:, off] + Op
        if ni:
            rows_i = []
            for i in range(ni):
                for j in range(i, ni):
                    rows_i.append(
                        cam[2 * ne + i : 2 * ne + i + 1]
                        * cam[2 * ne + j : 2 * ne + j + 1]
                        + cam[2 * ne + ni + i : 2 * ne + ni + i + 1]
                        * cam[2 * ne + ni + j : 2 * ne + ni + j + 1]
                    )
            ipair = len(rows_i)
            i_rows = out_i55.shape[0]
            symi = jnp.concatenate(
                rows_i + [jnp.zeros((i_rows - ipair, T), f32)], axis=0
            ) * livef
            parti = jnp.sum(
                symi.reshape(i_rows, T // 128, 128), axis=1
            )  # (i_rows, 128)
            out_i55[...] = out_i55[...] + parti


def _hpp_kernel(sb, fr, er, ib,  # scalar prefetch
                acam, apt, relv, imgv,  # HBM inputs
                out_hs, out_de, out_di,  # outputs
                sc_cam, sc_pt, sc_rel, sc_img, sems,  # scratch
                *, ne, ni, M, T, W, G, precision):
    """Linearization pass: per-tie Hpp sym columns + raw diag(Hcc), one
    sweep over the already-folded streams (replaces the XLA sym6 segsum +
    the adaptive-LM dcc segment sums — two full per-row passes).

    Per group g:  hs[:6] = [ApxApx_ab + ApyApy_ab] . mtie'   (6, M)
                  de[:ne] += [Aex^2 + Aey^2] . mimg'          (ne, W)
                  di[:ni] += lane-partials of [Aix^2 + Aiy^2] (ni, 128)
    (streams are sqrt(w)-folded, so products are the WEIGHTED normal
    equation entries directly).  Control-tail groups have an empty tie
    mask (rel = -1) and contribute only to de/di — exactly the Hcc
    semantics of schur.py linearize."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    f32 = jnp.float32

    def dmas(gi, slot):
        start = sb[gi] * 128
        for j, (src, dst) in enumerate(
            [(acam, sc_cam), (apt, sc_pt), (relv, sc_rel), (imgv, sc_img)]
        ):
            yield pltpu.make_async_copy(
                src.at[:, pl.ds(start, T)], dst.at[slot],
                sems.at[slot, jnp.int32(j)],
            )

    one = jnp.int32(1)
    two = jnp.int32(2)
    slot = jax.lax.rem(g, two)
    nxt = jax.lax.rem(g + one, two)
    zero = jnp.int32(0)

    @pl.when(g == 0)
    def _():
        for c in dmas(zero, zero):
            c.start()
        out_de[...] = jnp.zeros(out_de.shape, f32)
        out_di[...] = jnp.zeros(out_di.shape, f32)

    @pl.when(g + one < G)
    def _():
        for c in dmas(g + one, nxt):
            c.start()

    for c in dmas(g, slot):
        c.wait()

    start = sb[g] * 128
    lo = fr[g] - start
    hi_b = er[g] - start
    base = ib[g] * 128

    cam = sc_cam[slot]  # (CA, T)
    pt = sc_pt[slot]  # (8, T)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    live = jnp.logical_and(col >= lo, col < hi_b)
    livef = live.astype(f32)

    rel_i = sc_rel[slot][0, :].astype(jnp.int32).reshape(1, T)
    mrow = jax.lax.broadcasted_iota(jnp.int32, (M, T), 0)
    mtie = jnp.logical_and(mrow == rel_i, live).astype(f32)  # (M, T)

    img_i = sc_img[slot][0, :].astype(jnp.int32).reshape(1, T)
    wrow = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0) + base
    mimg = jnp.logical_and(wrow == img_i, live).astype(f32)  # (W, T)

    sym_rows = [
        pt[a : a + 1] * pt[b : b + 1]
        + pt[3 + a : 3 + a + 1] * pt[3 + b : 3 + b + 1]
        for a in range(3) for b in range(a, 3)
    ]
    sym = jnp.concatenate(
        sym_rows + [jnp.zeros((2, T), f32)], axis=0
    ) * livef  # (8, T)
    out_hs[...] = _dot(sym, mtie, _CONTRACT_LAST, precision)  # (8, M)

    de_rows = [
        cam[e : e + 1] * cam[e : e + 1]
        + cam[ne + e : ne + e + 1] * cam[ne + e : ne + e + 1]
        for e in range(ne)
    ]
    de8 = jnp.concatenate(
        de_rows + [jnp.zeros((8 - ne, T), f32)], axis=0
    ) * livef
    O = _dot(de8, mimg, _CONTRACT_LAST, precision)  # (8, W)
    off = pl.ds(pl.multiple_of(base, 128), W)
    out_de[:, off] = out_de[:, off] + O
    if ni:
        di_rows = [
            cam[2 * ne + i : 2 * ne + i + 1] ** 2
            + cam[2 * ne + ni + i : 2 * ne + ni + i + 1] ** 2
            for i in range(ni)
        ]
        di8 = jnp.concatenate(
            di_rows + [jnp.zeros((8 - ni, T), f32)], axis=0
        ) * livef
        parti = jnp.sum(di8.reshape(8, T // 128, 128), axis=1)
        out_di[...] = out_di[...] + parti


def fused_hpp_pass(
    band: BandArrays,
    acam_t: jax.Array,  # (CA, n_pad) f32 folded camera streams
    apt_t: jax.Array,  # (8, n_pad) f32 folded point streams
    ne: int,
    ni: int,
    precision: str = "bf16x2",
    interpret: bool = False,
):
    """Returns (hs (8, G*M): rows 0-5 = per-tie Hpp sym cols in RANK
    column order, de (8, n_img_pad): rows 0..ne-1 = raw pose diag(Hcc) in
    image-RANK columns, di (8, 128): IOP diag lane-partials)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, T, W, G = band.M, band.T, band.W, band.G
    n_img_pad = band.n_img_pad
    CA = acam_t.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # sb, fr, er, ib
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # acam
            pl.BlockSpec(memory_space=pl.ANY),  # apt
            pl.BlockSpec(memory_space=pl.ANY),  # rel
            pl.BlockSpec(memory_space=pl.ANY),  # imgrow
        ],
        out_specs=[
            pl.BlockSpec(  # hs per group
                (8, M), lambda g, *_: (jnp.zeros((), jnp.int32), g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # de resident accumulator
                (8, n_img_pad),
                lambda g, *_: (jnp.zeros((), jnp.int32),) * 2,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # di resident lane-partials
                (8, 128), lambda g, *_: (jnp.zeros((), jnp.int32),) * 2,
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CA, T), jnp.float32),
            pltpu.VMEM((2, 8, T), jnp.float32),
            pltpu.VMEM((2, 1, T), jnp.float32),
            pltpu.VMEM((2, 1, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((8, G * M), jnp.float32),
        jax.ShapeDtypeStruct((8, n_img_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]
    kern = functools.partial(
        _hpp_kernel, ne=ne, ni=ni, M=M, T=T, W=W, G=G, precision=precision
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret
    )(band.sb, band.fr, band.er, band.ib,
      acam_t, apt_t, band.rel, band.imgrow)


def fused_schur_apply(
    band: BandArrays,
    acam_t: jax.Array,  # (CA, n_pad) f32, rows [Aex | Aey | Aix | Aiy]
    apt_t: jax.Array,  # (8, n_pad) f32, rows [Apx(3) | Apy(3) | 0 0]
    hpi_t: jax.Array,  # (16, G*M) f32, rows p*3+q of Hpp^-1, rank order
    ne: int,
    ni: int,
    vpose: Optional[jax.Array] = None,  # (8, n_img_pad) f32, rank order
    vi: Optional[jax.Array] = None,  # (128,) f32
    a_rows: Optional[jax.Array] = None,  # (8, n_pad) f32, rows [ax | ay]
    precision: str = "bf16x2",
    interpret: bool = False,
    with_precond: bool = False,
):
    """Returns (out_pose (8, n_img_pad), out_iop (8, 128) lane-partial,
    y (8, G*M)[, p21 (p_rows, n_img_pad), i55 (i_rows, 128)]) — see
    module docstring for the operator semantics; with_precond adds the
    Schur-Jacobi diagonal sym columns in the same pass."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, T, W, G = band.M, band.T, band.W, band.G
    n_pad, n_img_pad = band.n_pad, band.n_img_pad
    CA = acam_t.shape[0]
    with_v = vpose is not None
    with_a = a_rows is not None
    p_rows = -(-(ne * (ne + 1) // 2) // 8) * 8
    i_rows = max(8, -(-(ni * (ni + 1) // 2) // 8) * 8)
    if not with_a:
        a_rows = jnp.zeros((8, 128), jnp.float32)  # placeholder, never read
    if vpose is None:
        vpose = jnp.zeros((8, 128), jnp.float32)
    if vi is None:
        vi = jnp.zeros((128,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # sb, fr, er, ib, vi
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # acam
            pl.BlockSpec(memory_space=pl.ANY),  # apt
            pl.BlockSpec(memory_space=pl.ANY),  # rel
            pl.BlockSpec(memory_space=pl.ANY),  # imgrow
            pl.BlockSpec(memory_space=pl.ANY),  # a_rows
            pl.BlockSpec(  # vpose: whole, resident
                vpose.shape,
                lambda g, *_: (jnp.zeros((), jnp.int32),) * 2,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # hpi: auto-pipelined per group
                (16, M), lambda g, *_: (jnp.zeros((), jnp.int32), g),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(  # out_pose: whole, resident accumulator
                (8, n_img_pad),
                lambda g, *_: (jnp.zeros((), jnp.int32),) * 2,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # out_iop: resident lane-partial accumulator
                (8, 128), lambda g, *_: (jnp.zeros((), jnp.int32),) * 2,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # y per group
                (8, M), lambda g, *_: (jnp.zeros((), jnp.int32), g),
                memory_space=pltpu.VMEM,
            ),
        ]
        + (
            [
                pl.BlockSpec(  # precond pose sym columns, resident
                    (p_rows, n_img_pad),
                    lambda g, *_: (jnp.zeros((), jnp.int32),) * 2,
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # precond IOP sym lane-partials, resident
                    (i_rows, 128),
                    lambda g, *_: (jnp.zeros((), jnp.int32),) * 2,
                    memory_space=pltpu.VMEM,
                ),
            ]
            if with_precond
            else []
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CA, T), jnp.float32),
            pltpu.VMEM((2, 8, T), jnp.float32),
            pltpu.VMEM((2, 1, T), jnp.float32),
            pltpu.VMEM((2, 1, T), jnp.float32),
            pltpu.VMEM((2, 8, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((8, n_img_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, G * M), jnp.float32),
    ] + (
        [
            jax.ShapeDtypeStruct((p_rows, n_img_pad), jnp.float32),
            jax.ShapeDtypeStruct((i_rows, 128), jnp.float32),
        ]
        if with_precond
        else []
    )
    kern = functools.partial(
        _kernel, ne=ne, ni=ni, M=M, T=T, W=W, G=G,
        with_v=with_v, with_a=with_a, with_precond=with_precond,
        precision=precision,
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret
    )(
        band.sb, band.fr, band.er, band.ib, vi,
        acam_t, apt_t, band.rel, band.imgrow, a_rows, vpose, hpi_t,
    )
