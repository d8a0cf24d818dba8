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

Design targets (BASELINE.md): 1k-image / 100k-point synthetic blocks on one
chip; the same matvec distributes over a device mesh by sharding the
observation axis (see parallel/).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fish_eye_bundle_adjustment_tpu.io.problem import BAProblem
from fish_eye_bundle_adjustment_tpu.solver.constraints import (
    build_G,
    validate_inner_constraints,
)
from fish_eye_bundle_adjustment_tpu.solver.dense import DenseResult
from fish_eye_bundle_adjustment_tpu.solver.linearize import Linearizer
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout


def _segsum(vals, idx, num):
    return jnp.zeros((num,) + vals.shape[1:], vals.dtype).at[idx].add(vals)


@dataclasses.dataclass
class SchurOptions:
    cg_tol: float = 1e-10  # relative residual tolerance for the inner CG
    cg_maxiter: int = 500
    point_damping: float = 0.0  # optional LM damping on Hpp
    camera_damping: float = 0.0  # optional LM damping on the reduced system
    dtype: np.dtype = np.float64


class SchurOperator:
    """Per-iteration linearized system in block form (all jit-traceable)."""

    def __init__(self, lin: Linearizer, layout: ParamLayout, weights, opts: SchurOptions):
        self.lin = lin
        self.layout = layout
        self.opts = opts
        self.W = weights  # (n_obs, 2)
        self.n_img = layout.n_img
        self.n_cam = layout.n_cam
        self.n_tie = layout.n_tie
        self.ne = layout.n_eop
        self.ni = layout.n_iop
        self.nc = layout.eop_size + layout.iop_size  # reduced-system size

        p = lin.problem
        self.obs_img = jnp.asarray(p.obs_img)
        self.obs_cam = jnp.asarray(p.obs_cam)
        # tie slot per obs; control observations parked on a dummy slot n_tie
        tie = p.target_tie_slot[p.obs_pt]
        self.obs_tie = jnp.asarray(np.where(tie >= 0, tie, layout.n_tie))

    # -- per-iteration factorization ------------------------------------
    def linearize(self, q):
        r, Je, Ji, Jp = self.lin.blocks(q)
        Je = Je[:, :, jnp.asarray(self.layout.eop_cols)] if self.ne else Je[:, :, :0]
        Ji = Ji[:, :, jnp.asarray(self.layout.iop_cols)] if self.ni else Ji[:, :, :0]
        W = self.W
        nt = self.n_tie

        # Hpp (+1 dummy slot for control obs) and its inverse
        Hpp = _segsum(
            jnp.einsum("nip,ni,niq->npq", Jp, W, Jp), self.obs_tie, nt + 1
        )[:nt]
        lam = self.opts.point_damping
        Hpp = Hpp + (lam + 1e-300) * jnp.eye(3, dtype=Hpp.dtype)
        Hpp_inv = jnp.linalg.inv(Hpp) if nt else Hpp

        return SchurFactors(self, r, Je, Ji, Jp, Hpp_inv)


@jax.tree_util.register_pytree_node_class
class SchurFactors:
    """One linearization point: residuals + blocks + eliminated points."""

    def __init__(self, op, r, Je, Ji, Jp, Hpp_inv):
        self.op = op
        self.r = r
        self.Je = Je
        self.Ji = Ji
        self.Jp = Jp
        self.Hpp_inv = Hpp_inv

    def tree_flatten(self):
        return (self.r, self.Je, self.Ji, self.Jp, self.Hpp_inv), self.op

    @classmethod
    def tree_unflatten(cls, op, leaves):
        return cls(op, *leaves)

    # -- building blocks -------------------------------------------------
    def _split(self, vc):
        op = self.op
        vp_img = vc[: op.layout.eop_size].reshape(op.n_img, op.ne)
        vi_cam = vc[op.layout.eop_size :].reshape(op.n_cam, op.ni)
        return vp_img, vi_cam

    def _cam_apply(self, vc):
        """a = C vc per observation, C = [Je | Ji]. -> (n_obs, 2)"""
        op = self.op
        vp_img, vi_cam = self._split(vc)
        a = jnp.zeros_like(self.r)
        if op.ne:
            a = a + jnp.einsum("nij,nj->ni", self.Je, vp_img[op.obs_img])
        if op.ni:
            a = a + jnp.einsum("nij,nj->ni", self.Ji, vi_cam[op.obs_cam])
        return a

    def _cam_applyT(self, aw):
        """C^T aw aggregated into the reduced vector. aw: (n_obs, 2)."""
        op = self.op
        parts = []
        if op.ne:
            u = _segsum(jnp.einsum("nij,ni->nj", self.Je, aw), op.obs_img, op.n_img)
            parts.append(u.reshape(-1))
        if op.ni:
            u = _segsum(jnp.einsum("nij,ni->nj", self.Ji, aw), op.obs_cam, op.n_cam)
            parts.append(u.reshape(-1))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), self.r.dtype)

    def _point_applyT(self, aw):
        """P^T aw -> (n_tie, 3) (dummy slot dropped)."""
        op = self.op
        t = _segsum(jnp.einsum("nip,ni->np", self.Jp, aw), op.obs_tie, op.n_tie + 1)
        return t[: op.n_tie]

    def _point_apply(self, vp):
        """P vp per observation -> (n_obs, 2); control obs contribute zero."""
        op = self.op
        vp_ext = jnp.concatenate([vp, jnp.zeros((1, 3), vp.dtype)], axis=0)
        return jnp.einsum("nip,np->ni", self.Jp, vp_ext[op.obs_tie])

    # -- Schur pieces ----------------------------------------------------
    def schur_matvec(self, vc):
        """S vc = C'WC vc - C'WP Hpp^-1 P'WC vc."""
        op = self.op
        W = op.W
        a = self._cam_apply(vc)
        aw = W * a
        out = self._cam_applyT(aw)
        if op.n_tie:
            t = self._point_applyT(aw)
            y = jnp.einsum("tpq,tq->tp", self.Hpp_inv, t)
            b = W * self._point_apply(y)
            out = out - self._cam_applyT(b)
        if op.opts.camera_damping:
            out = out + op.opts.camera_damping * vc
        return out

    def reduced_rhs(self):
        """gc_tilde = -(C'W r - C'WP Hpp^-1 P'W r)."""
        op = self.op
        rw = op.W * self.r
        g = self._cam_applyT(rw)
        if op.n_tie:
            t = self._point_applyT(rw)
            y = jnp.einsum("tpq,tq->tp", self.Hpp_inv, t)
            g = g - self._cam_applyT(op.W * self._point_apply(y))
        return -g

    def back_substitute(self, dc):
        """dp = Hpp^-1 (-P'W r - P'W C dc)  -> (n_tie, 3)."""
        op = self.op
        if not op.n_tie:
            return jnp.zeros((0, 3), self.r.dtype)
        rhs = -self._point_applyT(op.W * (self.r + self._cam_apply(dc)))
        return jnp.einsum("tpq,tq->tp", self.Hpp_inv, rhs)

    def pose_precond_blocks(self):
        """Exact Schur-Jacobi diagonal: per-image (ne,ne) blocks of S.

        Each (image, point) pair is observed once, so the diagonal Schur
        correction Sum_o Je_o' W Jp_o Hpp^-1 Jp_o' W Je_o is one segment
        sum over observations."""
        op = self.op
        W = op.W
        blocks = _segsum(
            jnp.einsum("nip,ni,niq->npq", self.Je, W, self.Je), op.obs_img, op.n_img
        )
        if op.n_tie:
            Hpi = jnp.concatenate([self.Hpp_inv, jnp.zeros((1, 3, 3), self.r.dtype)])
            # B_o = Je_o' W Jp_o  (ne,3) ; correction = B Hpp^-1 B'
            B = jnp.einsum("nie,ni,nip->nep", self.Je, W, self.Jp)
            corr = jnp.einsum("nep,npq,nfq->nef", B, Hpi[op.obs_tie], B)
            blocks = blocks - _segsum(corr, op.obs_img, op.n_img)
        if op.opts.camera_damping:
            blocks = blocks + op.opts.camera_damping * jnp.eye(op.ne, dtype=blocks.dtype)
        return blocks

    def iop_precond_blocks(self):
        op = self.op
        W = op.W
        blocks = _segsum(
            jnp.einsum("nip,ni,niq->npq", self.Ji, W, self.Ji), op.obs_cam, op.n_cam
        )
        if op.opts.camera_damping:
            blocks = blocks + op.opts.camera_damping * jnp.eye(op.ni, dtype=blocks.dtype)
        return blocks

    def make_preconditioner(self):
        op = self.op
        eye_reg = 1e-300
        Ms = []
        if op.ne:
            Pb = self.pose_precond_blocks()
            Pb = Pb + eye_reg * jnp.eye(op.ne, dtype=Pb.dtype)
            Pb_inv = jnp.linalg.inv(Pb)
            Ms.append(("pose", Pb_inv))
        if op.ni:
            Ib = self.iop_precond_blocks()
            Ib = Ib + eye_reg * jnp.eye(op.ni, dtype=Ib.dtype)
            Ms.append(("iop", jnp.linalg.inv(Ib)))

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


def solve_schur(
    problem: BAProblem,
    options: Optional[SchurOptions] = None,
    keep_history: bool = True,
) -> DenseResult:
    """Outer Gauss-Newton loop with the Schur/PCG inner solve.

    Matches the reference's convergence conventions (L1 of the de-scaled
    correction vs Threshold_Value, Iteration_Cap). Covariance is not
    materialized at scale — report-sized runs use solve_dense.
    """
    opts = options or SchurOptions()
    settings = problem.settings
    layout = ParamLayout(problem)
    lin = Linearizer(problem, layout)
    use_ic = settings.inner_constraints
    if use_ic:
        validate_inner_constraints(layout)

    weights = jnp.asarray(problem.obs_weights().astype(opts.dtype))
    op = SchurOperator(lin, layout, weights, opts)
    scale = jnp.asarray(layout.scale)
    nc = op.nc

    def _project_builder(q):
        if not use_ic:
            return lambda v: v
        G = build_G(layout, q)[:nc]  # G is zero on tie rows
        GtG_inv = jnp.linalg.inv(G.T @ G)

        def project(v):
            return v - G @ (GtG_inv @ (G.T @ v))

        return project

    @jax.jit
    def step(x):
        q = x * scale
        fac = op.linearize(q)
        project = _project_builder(q)
        precond = fac.make_preconditioner()
        rhs = fac.reduced_rhs()
        dc, cg_iters, cg_rel = _pcg(
            fac.schur_matvec, rhs, precond, project, opts.cg_tol, opts.cg_maxiter
        )
        dp = fac.back_substitute(dc)
        delta_q = jnp.concatenate([dc, dp.reshape(-1)])
        delta_x = delta_q / scale
        v = (fac._cam_apply(dc) + fac._point_apply(dp) + fac.r).reshape(-1)
        return x + delta_x, jnp.sum(jnp.abs(delta_x)), v, cg_iters, cg_rel

    t0 = time.perf_counter()
    x = jnp.asarray(layout.initial().astype(opts.dtype))
    history = [np.asarray(x)] if keep_history else []
    delta_history = []
    v = jnp.zeros((problem.n,), opts.dtype)
    converged = False
    count = 0
    while True:
        count += 1
        x, deltasum, v, cg_iters, cg_rel = step(x)
        deltasum = float(deltasum)
        delta_history.append(deltasum)
        if keep_history:
            history.append(np.asarray(x))
        if deltasum <= settings.threshold:
            converged = True
            break
        if count >= settings.iteration_cap:
            break
    elapsed = time.perf_counter() - t0

    v_np = np.asarray(v)
    p_diag = problem.obs_weights().reshape(-1)
    sigma02 = float(v_np @ (p_diag * v_np) / (problem.n - layout.u))
    rms_x = float(np.sqrt(np.mean(v_np[0::2] ** 2)))
    rms_y = float(np.sqrt(np.mean(v_np[1::2] ** 2)))

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
