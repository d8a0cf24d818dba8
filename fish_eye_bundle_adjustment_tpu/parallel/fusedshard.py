"""Distributed Schur solver running the FUSED banded Pallas kernel under
shard_map (VERDICT r4 missing #2 / next-round item 3).

Through r4 the fused kernel was pinned single-device (ObsData.pspec set
band=None under sharding), so every multi-device GN step paid the 5-pass
XLA matvec the kernel had just made 4-6x faster.  This mode removes the
pin with a GROUP-PARTITIONED global band plan (ops/bandplan.py
split_band_plan):

- the single global banded stream is cut at group boundaries; each group
  owns M whole tie ranks, so per-shard tie reductions are COMPLETE by
  construction — the point state is implicitly rank-sharded with no
  boundary exchange at all (tighter than parallel/tieshard.py's O(N)
  exchange: zero);
- each device runs the unmodified fused kernel (ops/fusedmv.py) over its
  128-aligned row window; alignment lead-in rows duplicated from the
  neighbor are W=0 dead in the XLA-side sums and masked by fr/er in the
  kernel;
- camera-side kernel outputs ((8, n_img_pad) pose planes, IOP lane
  partials, Schur-Jacobi sym columns) are completed with one psum each —
  the same reduced-camera-vector payload class as
  parallel/dist_schur.py's replicated mode;
- the back-substituted point correction lives rank-sharded ((G_loc*M, 3)
  per device) and materializes globally ONCE per step via one all_gather
  (the replicated delta_q step boundary, as tieshard does);
- the adaptive-LM lambda rides through as the same traced scalar as the
  single-device step (diag(Hcc) from the kernel's fused_hpp_pass, psum).

Applies under the single-device fused gate (f32, one camera, tie points,
pose block) plus a mesh; solve_schur_fused_sharded falls back is NOT
automatic — callers (cli/dryrun) pick the mode explicitly, keeping
dist_schur's XLA path as the general fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from fish_eye_bundle_adjustment_tpu.io.problem import BAProblem
from fish_eye_bundle_adjustment_tpu.ops.bandplan import (
    ShardedBandPlan,
    build_band_plan,
    split_band_plan,
)
from fish_eye_bundle_adjustment_tpu.ops.fusedmv import (
    BandArrays,
    fused_hpp_pass,
    fused_schur_apply,
)
from fish_eye_bundle_adjustment_tpu.parallel.mesh import OBS_AXIS, make_mesh
from fish_eye_bundle_adjustment_tpu.solver.constraints import (
    validate_inner_constraints,
)
from fish_eye_bundle_adjustment_tpu.solver.dense import DenseResult
from fish_eye_bundle_adjustment_tpu.solver.schur import (
    ObsData,
    SchurKernel,
    SchurOptions,
    _clamp_diag,
    _expand_sym,
    _finalize,
    _pcg,
    _stable_sum,
    make_projection_builder,
    run_gn_loop,
)
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

AX = OBS_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedShardData:
    """Per-shard expanded observation stream + band geometry (leaves with
    a leading n_shards axis shard on the mesh; tables replicated)."""

    img: jax.Array  # (N, L) int32 original image ids
    cam: jax.Array  # (N, L) int32
    pt: jax.Array  # (N, L) int32
    tie: jax.Array  # (N, L) int32 GLOBAL tie rank (n_tie for control/dead)
    xy: jax.Array  # (N, L, 2)
    W: jax.Array  # (N, L, 2) — 0 on dead/duplicate rows
    sb: jax.Array  # (N, G_loc) int32
    fr: jax.Array
    er: jax.Array
    ib: jax.Array
    rel: jax.Array  # (N, 1, L) f32
    imgrow: jax.Array  # (N, 1, L) f32
    # replicated
    ydir_cam: jax.Array
    iop_scale_cam: jax.Array
    img_of_imgrank: jax.Array
    imgrank_of_img: jax.Array
    slot_of_rank: jax.Array
    rank_of_slot: jax.Array

    def pspec(self, ax: str):
        sh, rep = P(ax), P()
        return FusedShardData(
            img=sh, cam=sh, pt=sh, tie=sh, xy=sh, W=sh,
            sb=sh, fr=sh, er=sh, ib=sh, rel=sh, imgrow=sh,
            ydir_cam=rep, iop_scale_cam=rep,
            img_of_imgrank=rep, imgrank_of_img=rep,
            slot_of_rank=rep, rank_of_slot=rep,
        )


def build_fused_shard_data(problem: BAProblem, layout: ParamLayout,
                           sp: ShardedBandPlan) -> FusedShardData:
    """Expand the observation arrays into the per-shard windows."""
    n_tie = layout.n_tie
    tie = problem.target_tie_slot[problem.obs_pt]
    tie = np.where(tie >= 0, tie, n_tie).astype(np.int64)
    rank = np.where(
        tie < n_tie, sp.rank_of_slot[np.minimum(tie, n_tie - 1)], n_tie
    ).astype(np.int32)

    rows = sp.shard_rows  # (N, L) original rows, -1 dead
    live = rows >= 0
    safe = np.where(live, rows, 0)

    def expand(a, fill=0):
        out = a[safe]
        out = np.where(
            live.reshape(live.shape + (1,) * (out.ndim - 2))
            if out.ndim > 2 else live,
            out, fill,
        )
        return out

    img = np.where(live, problem.obs_img[safe], 0).astype(np.int32)
    cam = np.where(live, problem.obs_cam[safe], 0).astype(np.int32)
    pt = np.where(live, problem.obs_pt[safe], 0).astype(np.int32)
    tie_x = np.where(live, rank[safe], n_tie).astype(np.int32)
    xy = problem.obs_xy[safe]
    xy = np.where(live[..., None], xy, 0.0)
    W = problem.obs_weights()[safe]
    # zero W on dead AND non-owned duplicate rows
    W = np.where((live & sp.owned)[..., None], W, 0.0).astype(np.float32)

    iop_scale = layout.iop_scale_full

    return FusedShardData(
        img=jnp.asarray(img), cam=jnp.asarray(cam), pt=jnp.asarray(pt),
        tie=jnp.asarray(tie_x),
        xy=jnp.asarray(xy.astype(np.float32)),
        W=jnp.asarray(W),
        sb=jnp.asarray(sp.sb), fr=jnp.asarray(sp.fr),
        er=jnp.asarray(sp.er), ib=jnp.asarray(sp.ib),
        rel=jnp.asarray(sp.rel[:, None, :]),
        imgrow=jnp.asarray(sp.imgrow[:, None, :]),
        ydir_cam=jnp.asarray(problem.y_dir.astype(np.float32)),
        iop_scale_cam=jnp.asarray(iop_scale.astype(np.float32)),
        img_of_imgrank=jnp.asarray(sp.img_of_imgrank),
        imgrank_of_img=jnp.asarray(sp.imgrank_of_img),
        slot_of_rank=jnp.asarray(sp.slot_of_rank),
        rank_of_slot=jnp.asarray(sp.rank_of_slot),
    )


def make_fused_sharded_step(problem: BAProblem, mesh,
                            options: Optional[SchurOptions] = None):
    """Build (step_fn, data, layout, sp).  step_fn(x, data, cg_tol, lam)
    runs one fused GN iteration SPMD over the mesh (replicated x in/out,
    same contract as the other distributed steps)."""
    opts = options or SchurOptions()
    layout = ParamLayout(problem)
    use_ic = problem.settings.inner_constraints
    if use_ic:
        validate_inner_constraints(layout)
    if not (
        np.dtype(opts.dtype) == np.float32
        and problem.n_cam == 1
        and layout.n_tie > 0
        and layout.n_eop > 0
    ):
        raise ValueError(
            "fused sharded mode needs the fused gate: f32, one camera, "
            "tie points, pose unknowns (use dist_schur otherwise)"
        )
    n_dev = int(np.prod(mesh.devices.shape))
    tie = problem.target_tie_slot[problem.obs_pt]
    tie = np.where(tie >= 0, tie, layout.n_tie)
    plan = build_band_plan(
        tie, problem.obs_img, layout.n_tie, problem.n_img,
        M=opts.band_M, max_W=opts.band_max_W,
    )
    if plan is None:
        raise ValueError("band structure too ragged for the fused kernel")
    sp = split_band_plan(plan, n_dev)
    data = build_fused_shard_data(problem, layout, sp)
    data = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        data, data.pspec(AX),
    )

    kernel = SchurKernel(layout, opts, obs_order="tie")
    ne, ni = kernel.ne, kernel.ni
    n_img = kernel.n_img
    scale = jnp.asarray(layout.scale, dtype=np.float32)
    project_builder = make_projection_builder(layout, kernel.nc, use_ic)
    adaptive = opts.adaptive_damping
    G_loc, M, L = sp.G_loc, sp.M, sp.slice_len
    n_tie = sp.n_tie
    rank_pad = sp.rank_pad
    interp = jax.default_backend() not in ("tpu", "axon")
    eye3 = np.eye(3, dtype=np.float32)

    def body(x, d: FusedShardData, cg_tol, lam):
        q = x * scale
        lam_t = lam if adaptive else None
        # local ObsData view feeding the shared per-row machinery
        obs_view = ObsData(
            img=d.img[0], cam=d.cam[0], pt=d.pt[0], tie=d.tie[0],
            xy=d.xy[0], W=d.W[0],
            ydir_cam=d.ydir_cam, iop_scale_cam=d.iop_scale_cam,
            plan=None, band=None,
        )
        rx, ry, Jex, Jey, Jix, Jiy, Jpx, Jpy = kernel.blocks(q, obs_view)
        wx, wy = obs_view.W[:, 0], obs_view.W[:, 1]
        f32 = jnp.float32
        sx = jnp.sqrt(wx).astype(f32)
        sy = jnp.sqrt(wy).astype(f32)
        rows = [
            (Jex * sx[:, None]).T.astype(f32),
            (Jey * sy[:, None]).T.astype(f32),
        ]
        if ni:
            rows += [
                (Jix * sx[:, None]).T.astype(f32),
                (Jiy * sy[:, None]).T.astype(f32),
            ]
        acam_t = jnp.concatenate(rows, axis=0)
        acam_t = jnp.pad(acam_t, ((0, -acam_t.shape[0] % 8), (0, 0)))
        apt_t = jnp.concatenate(
            [
                (Jpx * sx[:, None]).T.astype(f32),
                (Jpy * sy[:, None]).T.astype(f32),
            ],
            axis=0,
        )
        apt_t = jnp.pad(apt_t, ((0, 2), (0, 0)))

        band = BandArrays(
            sb=d.sb[0], fr=d.fr[0], er=d.er[0], ib=d.ib[0],
            rel=d.rel[0], imgrow=d.imgrow[0],
            img_of_imgrank=d.img_of_imgrank,
            imgrank_of_img=d.imgrank_of_img,
            rank_of_slot=d.rank_of_slot, slot_of_rank=d.slot_of_rank,
            M=M, T=sp.T, W=sp.W, G=G_loc, n_pad=L,
            n_img_pad=sp.n_img_pad, n_tie=n_tie, n_img=n_img,
        )

        # ---- fused linearization pass (local ranks) --------------------
        hs8, de8, di8 = fused_hpp_pass(
            band, acam_t, apt_t, ne, ni,
            precision=opts.fused_precision, interpret=interp,
        )
        Hs = hs8[:6].T  # (G_loc*M, 6) local ranks
        Hpp_inv = kernel._damped_hpp_inv(Hs, lam_t)  # (G_loc*M, 3, 3)
        # padding ranks (global rank >= n_tie) carry zero sums whose
        # "inverse" is f32 garbage — force identity (their t/y are 0)
        shard_id = jax.lax.axis_index(AX)
        g_rank = shard_id * (G_loc * M) + jnp.arange(G_loc * M)
        rank_ok = (g_rank < n_tie)[:, None, None]
        Hpp_inv = jnp.where(rank_ok, Hpp_inv, jnp.asarray(eye3))
        hpi_t = jnp.pad(Hpp_inv.reshape(G_loc * M, 9).T, ((0, 7), (0, 0)))

        def apply(vpose=None, vi=None, a_rows=None, with_precond=False,
                  precision=None):
            return fused_schur_apply(
                band, acam_t, apt_t, hpi_t, ne, ni,
                vpose=vpose, vi=vi, a_rows=a_rows,
                with_precond=with_precond,
                precision=precision or opts.fused_precision,
                interpret=interp,
            )

        def fused_v(vc):
            vp_img = vc[: layout.eop_size].reshape(n_img, ne)
            vp_ranked = vp_img[d.img_of_imgrank].astype(f32)
            vpose = jnp.zeros((8, sp.n_img_pad), f32)
            vpose = jax.lax.dynamic_update_slice(vpose, vp_ranked.T, (0, 0))
            vi = jnp.zeros((128,), f32)
            if ni:
                vi = vi.at[:ni].set(
                    vc[layout.eop_size :].astype(f32))
            return vpose, vi

        def cam_out(out_pose, out_iop):
            op = jax.lax.psum(out_pose, AX)[:ne, :n_img].T
            op = op[d.imgrank_of_img]
            parts = [op.reshape(-1)]
            if ni:
                parts.append(jnp.sum(jax.lax.psum(out_iop, AX)[:ni], axis=1))
            return jnp.concatenate(parts)

        a_rows = jnp.pad(
            jnp.stack([sx * rx, sy * ry], axis=0).astype(f32),
            ((0, 6), (0, 0)),
        )

        # rhs + Schur-Jacobi preconditioner in one pass
        out_pose, out_iop, _, p21, i55 = apply(
            a_rows=a_rows, with_precond=True
        )
        rhs = -cam_out(out_pose, out_iop)
        npair = ne * (ne + 1) // 2
        sym = jax.lax.psum(p21[:npair, :n_img], AX).T[d.imgrank_of_img]
        Pb = _expand_sym(sym, ne)
        blocks = [("pose", Pb)]
        if ni:
            ipair = ni * (ni + 1) // 2
            symi = jnp.sum(
                jax.lax.psum(i55[:ipair], AX), axis=1
            ).reshape(1, ipair)
            blocks.append(("iop", _expand_sym(symi, ni)))

        dcc = None
        if lam_t is not None:
            de = jax.lax.psum(de8, AX).T[d.imgrank_of_img][:, :ne]
            parts = [_clamp_diag(de).reshape(-1)]
            if ni:
                di = jnp.sum(
                    jax.lax.psum(di8[:ni], AX), axis=1
                ).reshape(1, ni)
                parts.append(_clamp_diag(di).reshape(-1))
            dcc = jnp.concatenate(parts)

        eye_reg = 1e-300
        Ms = []
        off = 0
        for kind, B in blocks:
            nb = B.shape[-1]
            eye = jnp.eye(nb, dtype=B.dtype)
            if lam_t is not None:
                dslice = dcc[off : off + B.shape[0] * nb].reshape(-1, nb)
                B = B + lam_t * dslice[..., None] * eye
            off += B.shape[0] * nb
            Ms.append((kind, jnp.linalg.inv(B + eye_reg * eye)))

        def precond(vc):
            vp = vc[: layout.eop_size].reshape(n_img, ne)
            parts = []
            for kind, Minv in Ms:
                if kind == "pose":
                    parts.append(
                        jnp.einsum("bij,bj->bi", Minv, vp).reshape(-1))
                else:
                    vi = vc[layout.eop_size :].reshape(1, ni)
                    parts.append(
                        jnp.einsum("bij,bj->bi", Minv, vi).reshape(-1))
            return jnp.concatenate(parts)

        def matvec(vc):
            vpose, vi = fused_v(vc)
            out_pose, out_iop, _ = apply(
                vpose=vpose, vi=vi, precision=kernel.mv_precision
            )
            out = cam_out(out_pose, out_iop)
            if opts.camera_damping:
                out = out + opts.camera_damping * vc
            if lam_t is not None:
                out = out + (lam_t * dcc) * vc
            return out

        project = project_builder(q)
        dc, cg_iters, _ = _pcg(
            matvec, rhs, precond, project, cg_tol, opts.cg_maxiter
        )

        # back-substitution: local rank block, one all_gather per step
        vpose, vi = fused_v(dc)
        _, _, y = apply(vpose=vpose, vi=vi, a_rows=a_rows)
        dp_loc = -y[:3].T  # (G_loc*M, 3) local ranks
        dp_rank = jax.lax.all_gather(
            dp_loc, AX, axis=0, tiled=True
        )  # (rank_pad, 3)
        dp_slot = dp_rank[d.rank_of_slot]  # (n_tie, 3) layout order
        delta_q = jnp.concatenate([dc, dp_slot.reshape(-1)])
        delta_x = delta_q / scale

        # per-row linearized residuals (this shard's owned rows)
        vp_img = dc[: layout.eop_size].reshape(n_img, ne)
        vg = vp_img[obs_view.img]
        ax = jnp.sum(Jex * vg, axis=1)
        ay = jnp.sum(Jey * vg, axis=1)
        if ni:
            vi_c = dc[layout.eop_size :]
            ax = ax + Jix @ vi_c
            ay = ay + Jiy @ vi_c
        dp_ext = jnp.concatenate(
            [dp_rank, jnp.zeros((1, 3), f32)], axis=0
        )
        yg = dp_ext[jnp.minimum(obs_view.tie, rank_pad)]
        px = jnp.sum(Jpx * yg, axis=1)
        py = jnp.sum(Jpy * yg, axis=1)
        vx = jnp.where(wx > 0, ax + px + rx, 0.0)
        vy = jnp.where(wy > 0, ay + py + ry, 0.0)
        vPv = jax.lax.psum(_stable_sum(vx * vx * wx + vy * vy * wy), AX)
        sum_vx2 = jax.lax.psum(jnp.sum(vx * vx), AX)
        sum_vy2 = jax.lax.psum(jnp.sum(vy * vy), AX)
        rxm = jnp.where(wx > 0, rx, 0.0)
        rym = jnp.where(wy > 0, ry, 0.0)
        cost_old = jax.lax.psum(
            _stable_sum(wx * rxm**2 + wy * rym**2), AX)
        x_trial = x + delta_x
        # trial validated DEFERRED against the next step's cost_old
        stats = jnp.stack([vPv, sum_vx2, sum_vy2, cost_old])
        v_local = jnp.stack([vx, vy], axis=1)
        return x_trial, jnp.sum(jnp.abs(delta_x)), v_local, stats, cg_iters

    step = jax.jit(
        shard_map(
            body, mesh=mesh,
            in_specs=(P(), data.pspec(AX), P(), P()),
            out_specs=(P(), P(), P(AX), P(), P()),
            check_vma=False,
        )
    )
    return step, data, layout, sp


def solve_schur_fused_sharded(
    problem: BAProblem,
    mesh=None,
    options: Optional[SchurOptions] = None,
    keep_history: bool = False,
    x0=None,
    progress_fn=None,
    checkpoint_path=None,
    checkpoint_every: int = 1,
    compute_covariance: bool = False,
) -> DenseResult:
    """Distributed solve through the fused banded kernel (same result
    contract as solve_schur_distributed)."""
    opts = options or SchurOptions(dtype=np.float32)
    mesh = mesh if mesh is not None else make_mesh()
    step, data, layout, sp = make_fused_sharded_step(problem, mesh, opts)
    use_device_loop = opts.device_loop
    if use_device_loop is None:
        use_device_loop = not keep_history
    if use_device_loop and not keep_history:
        from fish_eye_bundle_adjustment_tpu.solver.device_loop import (
            run_gn_loop_device,
        )

        (x, history, delta_history, v_shard, stats, count, converged,
         elapsed, stopped_on) = run_gn_loop_device(
            step, data, layout, problem, opts, x0=x0,
            progress_fn=progress_fn, checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, chunk=opts.device_chunk,
            # residual rows are (n_shards, L, 2) in FusedShardData —
            # the global padded row count is the product
            n_pad=int(data.W.shape[0]) * int(data.W.shape[1]),
        )
    else:
        (x, history, delta_history, v_shard, stats, count, converged,
         elapsed, stopped_on) = run_gn_loop(
            step, data, layout, problem, opts,
            keep_history=keep_history, x0=x0, progress_fn=progress_fn,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every,
            x_sharding=NamedSharding(mesh, P()),
        )
    # report-order residual rows: pick each observation's owned copy
    v_flat = np.asarray(v_shard).reshape(-1, 2)
    v_np = v_flat[sp.owned_pos].reshape(-1)
    result = _finalize(
        problem, layout, x, history, delta_history, v_np, np.asarray(stats),
        count, converged, elapsed, keep_history, stopped_on,
    )
    if compute_covariance:
        from fish_eye_bundle_adjustment_tpu.solver.covariance import (
            compute_stds,
        )

        std, Cc_q, method = compute_stds(
            problem, layout, result.x, result.sigma02, mesh=mesh
        )
        if std is not None:
            result.std = std
            result.Cc_q = Cc_q
            result.std_method = method
    return result
