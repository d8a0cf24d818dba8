"""Schur-complement Gauss-Newton solver — the scalable TPU path.

The reference materializes a dense n x u design matrix and inverts the
dense normal matrix every iteration (main.m:424-443, O(u^3)).  This solver
never materializes A or N.  Per-observation Jacobian blocks feed a
block-sparse normal system:

    [ Hcc  Hcp ] [dc]   [gc]         c = poses (6/img) + shared IOPs
    [ Hpc  Hpp ] [dp] = [gp]         p = tie points (3/pt)

Point blocks are eliminated in closed form (Hpp is block-diagonal 3x3,
batched inverse), and the reduced camera system

    S dc = gc - Hcp Hpp^-1 gp,   S = Hcc - Hcp Hpp^-1 Hpc

is solved matrix-free with preconditioned conjugate gradients: every
S-matvec is two passes of gather -> per-observation 2xk block products ->
segment-sum, which XLA maps onto the VPU/MXU without any scatter of pair
blocks.  The preconditioner is exact Schur-Jacobi on the pose diagonal
(each (image, point) pair has exactly one observation, so the diagonal
Schur correction is itself a segment sum).

Free-network datum (Inner_Constraints): CG runs projected onto
null(G^T) — the CG solution of the projected system coincides with the
bordered KKT solution of the dense path (tested against it on cam0).

Distribution: all per-observation work is embarrassingly parallel and all
coupling flows through the segment sums, so the same kernel runs sharded
over an ``obs`` mesh axis by injecting ``reduce_fn = psum`` after every
segment sum (see parallel/dist_schur.py).  Per-observation data travels as
an explicit ObsData pytree so shard_map can shard it.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fish_eye_bundle_adjustment_tpu.io.problem import BAProblem
from fish_eye_bundle_adjustment_tpu.models.projection import (
    MODEL_IDS,
    obs_jacobian_blocks,
)
from fish_eye_bundle_adjustment_tpu.solver.constraints import (
    build_G,
    validate_inner_constraints,
)
from fish_eye_bundle_adjustment_tpu.solver.dense import DenseResult
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout


def _segsum(vals, idx, num, sorted_idx: bool = False):
    return jnp.zeros((num,) + vals.shape[1:], vals.dtype).at[idx].add(
        vals, indices_are_sorted=sorted_idx
    )


def _inv3x3(M):
    """Batched closed-form (adjugate) 3x3 inverse.

    jnp.linalg.inv lowers to batched LU — ~20 ms for 20k matrices on a
    v5e chip; the cofactor form is pure VPU elementwise (<1 ms)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    rows = [
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, H, I], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObsData:
    """Per-observation arrays — the shardable axis of the problem."""

    img: jax.Array  # (n,) int32 image index
    cam: jax.Array  # (n,) int32 camera index
    pt: jax.Array  # (n,) int32 target index (into the full point table)
    tie: jax.Array  # (n,) int32 tie slot, == n_tie for control obs
    xy: jax.Array  # (n, 2) measured coordinates
    ydir: jax.Array  # (n,)
    iop_scale: jax.Array  # (n, 3+nk+2) distortion conditioning per obs
    W: jax.Array  # (n, 2) weights (0 on padding rows)

    @staticmethod
    def from_problem(problem: BAProblem, layout: ParamLayout, dtype=np.float64,
                     pad_to: Optional[int] = None,
                     order: Optional[np.ndarray] = None) -> "ObsData":
        """`order` optionally permutes the observation axis (e.g. sorted by
        tie slot so point-segment sums see sorted indices — see
        sort_order_by_tie)."""
        n = problem.n_obs
        pad = (pad_to or n) - n
        tie = problem.target_tie_slot[problem.obs_pt]
        tie = np.where(tie >= 0, tie, layout.n_tie).astype(np.int32)

        def _prep(a, fill=0):
            if order is not None:
                a = a[order]
            if pad:
                width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, width, constant_values=fill)
            return a

        W = problem.obs_weights().astype(dtype)
        return ObsData(
            img=jnp.asarray(_prep(problem.obs_img)),
            cam=jnp.asarray(_prep(problem.obs_cam)),
            pt=jnp.asarray(_prep(problem.obs_pt)),
            tie=jnp.asarray(_prep(tie, fill=layout.n_tie)),
            xy=jnp.asarray(_prep(problem.obs_xy.astype(dtype))),
            ydir=jnp.asarray(_prep(problem.y_dir[problem.obs_cam].astype(dtype), fill=1)),
            iop_scale=jnp.asarray(
                _prep(layout.iop_scale_full[problem.obs_cam].astype(dtype), fill=1)
            ),
            W=jnp.asarray(_prep(W)),  # zero weight rows: padding contributes nothing
        )

    @staticmethod
    def sort_order_by_tie(problem: BAProblem, layout: ParamLayout) -> np.ndarray:
        """Stable observation order sorted by tie slot (control obs last)."""
        tie = problem.target_tie_slot[problem.obs_pt]
        tie = np.where(tie >= 0, tie, layout.n_tie)
        return np.argsort(tie, kind="stable")

    @property
    def n(self):
        return self.img.shape[0]


@dataclasses.dataclass
class SchurOptions:
    cg_tol: float = 1e-10  # relative residual tolerance for the inner CG
    cg_maxiter: int = 500
    point_damping: float = 0.0  # optional LM damping on Hpp
    camera_damping: float = 0.0  # optional LM damping on the reduced system
    dtype: np.dtype = np.float64
    obs_order: Optional[str] = "tie"  # None | "img" | "tie" observation sort
    # Inexact-Newton forcing (Eisenstat-Walker style): the inner CG runs to
    # max(cg_tol, min(forcing_max, rel_progress^2)) — loose solves early in
    # the outer Gauss-Newton iteration, tight solves at the end, preserving
    # the converged solution while cutting most CG sweeps.
    adaptive_forcing: bool = True
    forcing_max: float = 1e-2


class SchurKernel:
    """Static problem structure + the block-sparse linear algebra.

    `reduce_fn` is applied after every observation-axis segment sum —
    identity on one device, ``lax.psum(_, 'obs')`` under shard_map.
    """

    def __init__(self, layout: ParamLayout, opts: SchurOptions,
                 reduce_fn: Callable = lambda x: x,
                 obs_order: Optional[str] = None):
        self.layout = layout
        self.opts = opts
        self.reduce = reduce_fn
        # which observation-axis segment reductions see sorted indices
        self.sorted_img = obs_order == "img"
        self.sorted_tie = obs_order == "tie"
        self.model_id = MODEL_IDS[layout.problem.settings.model]
        self.nk = layout.nk
        self.n_img = layout.n_img
        self.n_cam = layout.n_cam
        self.n_tie = layout.n_tie
        self.ne = layout.n_eop
        self.ni = layout.n_iop
        self.nc = layout.eop_size + layout.iop_size

    # -- linearization ---------------------------------------------------
    def blocks(self, q, obs: ObsData):
        """Residual + Jacobian blocks for (a shard of) the observations."""
        layout = self.layout
        eop, iop, pts = layout.unpack_scaled(q)
        eop_o = eop[obs.img]
        iop_o = iop[obs.cam]
        xyz_o = pts[obs.pt]

        fn = lambda e, i, x, oxy, yd: obs_jacobian_blocks(
            e, i, x, oxy, yd, self.model_id, self.nk
        )
        r, Je, Ji, Jp = jax.vmap(fn)(eop_o, iop_o, xyz_o, obs.xy, obs.ydir)
        Je = Je[:, :, jnp.asarray(layout.eop_cols)] if self.ne else Je[:, :, :0]
        Ji = (
            (Ji / obs.iop_scale[:, None, :])[:, :, jnp.asarray(layout.iop_cols)]
            if self.ni
            else Ji[:, :, :0]
        )
        Jp = Jp * (obs.tie < self.n_tie)[:, None, None]
        return r, Je, Ji, Jp

    def linearize(self, q, obs: ObsData) -> "SchurFactors":
        r, Je, Ji, Jp = self.blocks(q, obs)
        nt = self.n_tie
        Hpp = self.reduce(
            _segsum(
                jnp.einsum("nip,ni,niq->npq", Jp, obs.W, Jp),
                obs.tie, nt + 1, sorted_idx=self.sorted_tie,
            )
        )[:nt]
        lam = self.opts.point_damping
        Hpp = Hpp + (lam + 1e-300) * jnp.eye(3, dtype=Hpp.dtype)
        Hpp_inv = _inv3x3(Hpp) if nt else Hpp
        return SchurFactors(self, obs, r, Je, Ji, Jp, Hpp_inv)


@jax.tree_util.register_pytree_node_class
class SchurFactors:
    """One linearization point: residuals + blocks + eliminated points."""

    def __init__(self, kernel, obs, r, Je, Ji, Jp, Hpp_inv):
        self.k = kernel
        self.obs = obs
        self.r = r
        self.Je = Je
        self.Ji = Ji
        self.Jp = Jp
        self.Hpp_inv = Hpp_inv

    def tree_flatten(self):
        return (self.obs, self.r, self.Je, self.Ji, self.Jp, self.Hpp_inv), self.k

    @classmethod
    def tree_unflatten(cls, kernel, leaves):
        return cls(kernel, *leaves)

    # -- building blocks -------------------------------------------------
    def _split(self, vc):
        k = self.k
        vp_img = vc[: k.layout.eop_size].reshape(k.n_img, k.ne)
        vi_cam = vc[k.layout.eop_size :].reshape(k.n_cam, k.ni)
        return vp_img, vi_cam

    def _cam_apply(self, vc):
        """a = C vc per observation, C = [Je | Ji]. -> (n_obs_local, 2)"""
        k = self.k
        vp_img, vi_cam = self._split(vc)
        a = jnp.zeros_like(self.r)
        if k.ne:
            a = a + jnp.einsum("nij,nj->ni", self.Je, vp_img[self.obs.img])
        if k.ni:
            a = a + jnp.einsum("nij,nj->ni", self.Ji, vi_cam[self.obs.cam])
        return a

    def _cam_applyT(self, aw):
        """C^T aw fully reduced into the replicated camera vector."""
        k = self.k
        parts = []
        if k.ne:
            u = _segsum(
                jnp.einsum("nij,ni->nj", self.Je, aw), self.obs.img, k.n_img,
                sorted_idx=k.sorted_img,
            )
            parts.append(u.reshape(-1))
        if k.ni:
            u = _segsum(
                jnp.einsum("nij,ni->nj", self.Ji, aw), self.obs.cam, k.n_cam,
                sorted_idx=k.sorted_img and k.n_cam == 1,
            )
            parts.append(u.reshape(-1))
        out = jnp.concatenate(parts) if parts else jnp.zeros((0,), self.r.dtype)
        return k.reduce(out)

    def _point_applyT(self, aw):
        """P^T aw -> (n_tie, 3), fully reduced (dummy slot dropped)."""
        k = self.k
        t = _segsum(
            jnp.einsum("nip,ni->np", self.Jp, aw), self.obs.tie, k.n_tie + 1,
            sorted_idx=k.sorted_tie,
        )
        return k.reduce(t[: k.n_tie])

    def _point_apply(self, vp):
        """P vp per observation; control obs contribute zero."""
        vp_ext = jnp.concatenate([vp, jnp.zeros((1, 3), vp.dtype)], axis=0)
        return jnp.einsum("nip,np->ni", self.Jp, vp_ext[self.obs.tie])

    # -- Schur pieces ----------------------------------------------------
    def schur_matvec(self, vc):
        """S vc = C'WC vc - C'WP Hpp^-1 P'WC vc."""
        k = self.k
        W = self.obs.W
        aw = W * self._cam_apply(vc)
        if k.n_tie:
            t = self._point_applyT(aw)
            y = jnp.einsum("tpq,tq->tp", self.Hpp_inv, t)
            # fold the correction into one image-axis reduction:
            # C'(aw) - C'(W P y) = C'(aw - W P y)
            aw = aw - W * self._point_apply(y)
        out = self._cam_applyT(aw)
        if k.opts.camera_damping:
            out = out + k.opts.camera_damping * vc
        return out

    def reduced_rhs(self):
        """gc_tilde = -(C'W r - C'WP Hpp^-1 P'W r)."""
        k = self.k
        rw = self.obs.W * self.r
        if k.n_tie:
            t = self._point_applyT(rw)
            y = jnp.einsum("tpq,tq->tp", self.Hpp_inv, t)
            rw = rw - self.obs.W * self._point_apply(y)
        return -self._cam_applyT(rw)

    def back_substitute(self, dc):
        """dp = Hpp^-1 (-P'W r - P'W C dc)  -> (n_tie, 3)."""
        k = self.k
        if not k.n_tie:
            return jnp.zeros((0, 3), self.r.dtype)
        rhs = -self._point_applyT(self.obs.W * (self.r + self._cam_apply(dc)))
        return jnp.einsum("tpq,tq->tp", self.Hpp_inv, rhs)

    def pose_precond_blocks(self):
        """Exact Schur-Jacobi diagonal: per-image (ne,ne) blocks of S.

        Each (image, point) pair is observed once, so the diagonal Schur
        correction Sum_o Je_o' W Jp_o Hpp^-1 Jp_o' W Je_o is one segment
        sum over observations."""
        k = self.k
        W = self.obs.W
        blocks = jnp.einsum("nip,ni,niq->npq", self.Je, W, self.Je)
        if k.n_tie:
            Hpi = jnp.concatenate([self.Hpp_inv, jnp.zeros((1, 3, 3), self.r.dtype)])
            B = jnp.einsum("nie,ni,nip->nep", self.Je, W, self.Jp)
            blocks = blocks - jnp.einsum("nep,npq,nfq->nef", B, Hpi[self.obs.tie], B)
        out = k.reduce(
            _segsum(blocks, self.obs.img, k.n_img, sorted_idx=k.sorted_img)
        )
        if k.opts.camera_damping:
            out = out + k.opts.camera_damping * jnp.eye(k.ne, dtype=out.dtype)
        return out

    def iop_precond_blocks(self):
        k = self.k
        out = k.reduce(
            _segsum(
                jnp.einsum("nip,ni,niq->npq", self.Ji, self.obs.W, self.Ji),
                self.obs.cam,
                k.n_cam,
            )
        )
        if k.opts.camera_damping:
            out = out + k.opts.camera_damping * jnp.eye(k.ni, dtype=out.dtype)
        return out

    def make_preconditioner(self):
        k = self.k
        eye_reg = 1e-300
        Ms = []
        if k.ne:
            Pb = self.pose_precond_blocks()
            Ms.append(("pose", jnp.linalg.inv(Pb + eye_reg * jnp.eye(k.ne, dtype=Pb.dtype))))
        if k.ni:
            Ib = self.iop_precond_blocks()
            Ms.append(("iop", jnp.linalg.inv(Ib + eye_reg * jnp.eye(k.ni, dtype=Ib.dtype))))

        def apply(vc):
            vp_img, vi_cam = self._split(vc)
            parts = []
            for kind, Minv in Ms:
                if kind == "pose":
                    parts.append(jnp.einsum("bij,bj->bi", Minv, vp_img).reshape(-1))
                else:
                    parts.append(jnp.einsum("bij,bj->bi", Minv, vi_cam).reshape(-1))
            return jnp.concatenate(parts)

        return apply


def _pcg(matvec, b, precond, project, tol, maxiter):
    """Projected preconditioned CG (lax.while_loop).

    `project` restricts iterates to null(G^T) for free-network solves
    (identity otherwise)."""
    b = project(b)
    bnorm = jnp.linalg.norm(b)

    def mv(v):
        return project(matvec(project(v)))

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = project(precond(r0))
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        i, x, r, z, p, rz = state
        return jnp.logical_and(i < maxiter, jnp.linalg.norm(r) > tol * bnorm)

    def body(state):
        i, x, r, z, p, rz = state
        Ap = mv(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = project(precond(r))
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return i + 1, x, r, z, p, rz_new

    i, x, r, *_ = jax.lax.while_loop(cond, body, (0, x0, r0, z0, p0, rz0))
    return x, i, jnp.linalg.norm(r) / bnorm


def make_projection_builder(layout, nc, use_ic: bool):
    """Null(G^T) projector factory for free-network CG."""

    def build(q):
        if not use_ic:
            return lambda v: v
        G = build_G(layout, q)[:nc]  # G is zero on tie rows
        GtG_inv = jnp.linalg.inv(G.T @ G)

        def project(v):
            return v - G @ (GtG_inv @ (G.T @ v))

        return project

    return build


def schur_step_fn(kernel: SchurKernel, layout: ParamLayout, use_ic: bool):
    """One Gauss-Newton step as a pure function of (x, obs) — the unit the
    single-device path jits directly and the distributed path wraps in
    shard_map."""
    opts = kernel.opts
    scale = jnp.asarray(layout.scale, dtype=opts.dtype)
    project_builder = make_projection_builder(layout, kernel.nc, use_ic)

    def step(x, obs: ObsData, cg_tol):
        q = x * scale
        fac = kernel.linearize(q, obs)
        project = project_builder(q)
        precond = fac.make_preconditioner()
        rhs = fac.reduced_rhs()
        dc, cg_iters, cg_rel = _pcg(
            fac.schur_matvec, rhs, precond, project, cg_tol, opts.cg_maxiter
        )
        dp = fac.back_substitute(dc)
        delta_q = jnp.concatenate([dc, dp.reshape(-1)])
        delta_x = delta_q / scale
        # per-shard linearized residual rows (padding rows carry W=0 but the
        # raw residual of padded obs is bogus — mask by weight sign)
        v_local = fac._cam_apply(dc) + fac._point_apply(dp) + fac.r
        v_local = jnp.where(obs.W > 0, v_local, 0.0)
        # weighted sums for sigma0^2 / RMS (global via reduce)
        vPv = kernel.reduce(jnp.sum(v_local**2 * obs.W))
        sum_vx2 = kernel.reduce(jnp.sum(v_local[:, 0] ** 2))
        sum_vy2 = kernel.reduce(jnp.sum(v_local[:, 1] ** 2))
        stats = jnp.stack([vPv, sum_vx2, sum_vy2])
        return x + delta_x, jnp.sum(jnp.abs(delta_x)), v_local, stats, cg_iters

    return step


def _finalize(problem, layout, x, history, delta_history, v_np, stats, count,
              converged, elapsed, keep_history):
    vPv, sx2, sy2 = (float(s) for s in stats)
    n = problem.n
    sigma02 = vPv / (n - layout.u)
    rms_x = float(np.sqrt(sx2 / problem.n_obs))
    rms_y = float(np.sqrt(sy2 / problem.n_obs))
    return DenseResult(
        problem=problem,
        layout=layout,
        x=np.asarray(x),
        iterations=count,
        converged=converged,
        delta_history=delta_history,
        x_history=np.asarray(history) if keep_history else np.zeros((0, layout.u)),
        v=v_np,
        sigma02=sigma02,
        rms_x=rms_x,
        rms_y=rms_y,
        rms=float(np.sqrt(rms_x**2 + rms_y**2)),
        Cx=None,
        std=None,
        Cx_q=None,
        elapsed_s=elapsed,
    )


def solve_schur(
    problem: BAProblem,
    options: Optional[SchurOptions] = None,
    keep_history: bool = True,
    x0=None,
) -> DenseResult:
    """Outer Gauss-Newton loop with the Schur/PCG inner solve (one device).

    Matches the reference's convergence conventions (L1 of the de-scaled
    correction vs Threshold_Value, Iteration_Cap). Covariance is not
    materialized at scale — report-sized runs use solve_dense.
    """
    opts = options or SchurOptions()
    settings = problem.settings
    layout = ParamLayout(problem)
    use_ic = settings.inner_constraints
    if use_ic:
        validate_inner_constraints(layout)

    kernel = SchurKernel(layout, opts, obs_order=opts.obs_order)
    order = (
        ObsData.sort_order_by_tie(problem, layout)
        if opts.obs_order == "tie"
        else None  # problem order is image-major already ("img")
    )
    obs = ObsData.from_problem(problem, layout, dtype=opts.dtype, order=order)
    step = jax.jit(schur_step_fn(kernel, layout, use_ic))

    t0 = time.perf_counter()
    x = jnp.asarray((layout.initial() if x0 is None else np.asarray(x0)).astype(opts.dtype))
    history = [np.asarray(x)] if keep_history else []
    delta_history = []
    v_local = jnp.zeros((problem.n_obs, 2), opts.dtype)
    stats = jnp.zeros(3)
    converged = False
    count = 0
    delta0 = None
    cg_tol = opts.forcing_max if opts.adaptive_forcing else opts.cg_tol
    while True:
        count += 1
        x, deltasum, v_local, stats, _ = step(x, obs, jnp.asarray(cg_tol, opts.dtype))
        deltasum = float(deltasum)
        delta_history.append(deltasum)
        if opts.adaptive_forcing:
            delta0 = delta0 or max(deltasum, 1e-300)
            rel = deltasum / delta0
            cg_tol = max(opts.cg_tol, min(opts.forcing_max, rel * rel))
        if keep_history:
            history.append(np.asarray(x))
        if deltasum <= settings.threshold:
            converged = True
            break
        if count >= settings.iteration_cap:
            break
    elapsed = time.perf_counter() - t0

    v_sorted = np.asarray(v_local)
    if order is not None:  # un-permute back to original observation order
        v_unsorted = np.empty_like(v_sorted)
        v_unsorted[order] = v_sorted
        v_sorted = v_unsorted
    v_np = v_sorted.reshape(-1)
    return _finalize(
        problem, layout, x, history, delta_history, v_np, np.asarray(stats),
        count, converged, elapsed, keep_history,
    )
