"""Dense Gauss-Newton solver — the parity path.

Reproduces the reference's solver-layer semantics (main.m:396-497,567-628)
on one device:

- weights P = diag(1/sigma^2) from Meas_std (+ optional distinct y sigma,
  interleaved x,y — main.m:396-405);
- normal equations N = A'PA, u = A'Pw over the conditioned (q-space) design
  matrix;
- free-network datum via the bordered KKT system [N G; G' 0]
  (main.m:428-440) when Inner_Constraints is set;
- convergence on the L1 norm of the DE-SCALED correction
  (main.m:458-487, functions/sumabs.m), iteration cap main.m:490-493;
- statistics from the LAST iteration's linearization: v = A*delta + w
  (main.m:569), sigma0^2 = v'Pv/(n-u) EXCLUDING the 7 constraint
  pseudo-observations (main.m:601), covariance de-scaling asymmetry (delta +
  Cx diagonal only, main.m:458-482), correlations from the pre-descale Cx
  (main.m:447-456).

The per-iteration work (linearize + assemble + solve) is one jitted device
call; only the scalar convergence metric crosses back to the host.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fish_eye_bundle_adjustment_tpu.io.problem import BAProblem
from fish_eye_bundle_adjustment_tpu.solver.constraints import (
    NUM_INNER_CONSTRAINTS,
    build_G,
    validate_inner_constraints,
)
from fish_eye_bundle_adjustment_tpu.solver.linearize import Linearizer
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout


@dataclasses.dataclass
class DenseResult:
    problem: BAProblem
    layout: ParamLayout
    x: np.ndarray  # (u,) converged unknowns (unscaled)
    iterations: int
    converged: bool
    delta_history: List[float]  # L1(delta) per iteration
    x_history: np.ndarray  # (iterations+1, u) including initial
    v: np.ndarray  # (n,) linearized residuals at convergence
    sigma02: float
    rms_x: float
    rms_y: float
    rms: float
    Cx: Optional[np.ndarray]  # (u,u) sigma02-scaled, diag de-scaled
    std: Optional[np.ndarray]  # (u,)
    Cx_q: Optional[np.ndarray]  # pre-descale, pre-sigma02 (for correlations)
    elapsed_s: float
    # camera-block covariance from the Schur path (solver/covariance.py):
    # (nc, nc) over [EOPs | IOPs], q-space, pre-sigma02.  The report's
    # correlation sections only touch camera-block entries, so this is
    # enough at scales where the full (u, u) Cx cannot exist.
    Cc_q: Optional[np.ndarray] = None
    # provenance of `std`: "exact" (dense covariance / dense-S block
    # back-substitution) or "hutchinson" (stochastic selected-diagonal
    # estimate past the dense-S gate).  The report annotates estimated
    # sigmas so a metrology reader can tell them from exact values.
    std_method: Optional[str] = None
    # why the iteration stopped: "threshold" (reference L1 contract),
    # "plateau" (precision floor — f32 at scale; still converged=True),
    # "cap" (iteration cap, converged=False), or None (dense path /
    # pre-r5 callers)
    stopped_on: Optional[str] = None

    @property
    def names(self):
        return self.layout.names()

    def correlation(self) -> np.ndarray:
        """Full correlation matrix (main.m:447-456) — computed on demand."""
        d = np.sqrt(np.diag(self.Cx_q))
        return self.Cx_q / np.outer(d, d)

    def camera_correlation(self) -> Optional[np.ndarray]:
        """Camera-block (EOP+IOP) correlation matrix; indexable exactly
        like correlation() for indices < nc."""
        C = self.Cx_q if self.Cx_q is not None else self.Cc_q
        if C is None:
            return None
        nc = self.layout.eop_size + self.layout.iop_size
        C = C[:nc, :nc]
        d = np.sqrt(np.diag(C))
        return C / np.outer(d, d)


def solve_dense(
    problem: BAProblem,
    compute_covariance: bool = True,
    keep_history: bool = True,
) -> DenseResult:
    settings = problem.settings
    layout = ParamLayout(problem)
    lin = Linearizer(problem, layout)
    u = layout.u
    n = problem.n
    use_ic = settings.inner_constraints
    if use_ic:
        validate_inner_constraints(layout)

    scale = jnp.asarray(layout.scale)
    p_diag = jnp.asarray(problem.obs_weights().reshape(-1))  # (n,)

    def _normal_eq(x):
        q = x * scale
        A, w = lin.dense_design(q)
        N = A.T @ (p_diag[:, None] * A)
        uvec = A.T @ (p_diag * w)
        return q, A, w, N, uvec

    def _delta(q, N, uvec):
        if use_ic:
            G = build_G(layout, q)
            d = NUM_INNER_CONSTRAINTS
            KKT = jnp.block([[N, G], [G.T, jnp.zeros((d, d), N.dtype)]])
            rhs = jnp.concatenate([uvec, jnp.zeros((d,), N.dtype)])
            delta_q = -jnp.linalg.solve(KKT, rhs)[:u]
        else:
            delta_q = -jnp.linalg.solve(N, uvec)
        return delta_q

    @jax.jit
    def step(x, lam):
        """One damped GN step; lam is the traced adaptive-LM parameter
        (0.0 -> the reference's pure GN step).  Marquardt scaling
        N + lam*diag(N) preserves the fixed point (the rhs u = A'Pw is
        untouched); the constraint border is never damped."""
        q, A, w, N, uvec = _normal_eq(x)
        dN = jnp.diagonal(N)
        # relative floor keeps lam*diag damping effective in directions
        # whose diagonal is ~0 (see schur.py _clamp_diag)
        dN = jnp.maximum(dN, jnp.maximum(1e-6 * jnp.max(dN), 1e-30))
        Nd = N + lam * dN * jnp.eye(u, dtype=N.dtype)
        delta_q = _delta(q, Nd, uvec)
        delta_x = delta_q / scale
        v = A @ delta_q + w  # linearized residual (main.m:569)
        cost_old = jnp.sum(p_diag * w * w)
        model_new = jnp.sum(p_diag * v * v)
        w_new = lin.residuals((x + delta_x) * scale).reshape(-1)
        cost_new = jnp.sum(p_diag * w_new * w_new)
        return (
            x + delta_x, jnp.sum(jnp.abs(delta_x)), v, delta_q,
            jnp.stack([cost_old, model_new, cost_new]),
        )

    @jax.jit
    def covariance(x):
        """Cx from the inverse of the (bordered) normal matrix at x —
        the reference computes this inside the loop (main.m:428-443); we
        evaluate it once, at the final iteration's linearization point."""
        q, _, _, N, _ = _normal_eq(x)
        if use_ic:
            G = build_G(layout, q)
            d = NUM_INNER_CONSTRAINTS
            KKT = jnp.block([[N, G], [G.T, jnp.zeros((d, d), N.dtype)]])
            return jnp.linalg.inv(KKT)[:u, :u]
        return jnp.linalg.inv(N)

    t0 = time.perf_counter()
    x = jnp.asarray(layout.initial())
    history = [np.asarray(x)] if keep_history else []
    delta_history: List[float] = []
    v = jnp.zeros((n,))
    converged = False
    count = 0
    x_prev = x
    # adaptive-LM trust-region control (same controller as
    # solver/schur.py run_gn_loop): lam stays 0 while every GN step is
    # accepted — the reference-parity trajectory — and kicks in only when
    # the true weighted SSR increases (main.m has no globalization and
    # can silently loop to its cap on a divergent block)
    lam, nu = 0.0, 2.0
    slack_rel = float(np.finfo(np.float64).eps) ** (2.0 / 3.0)
    while True:
        x_trial, deltasum, v_trial, _, costs = step(x, jnp.asarray(lam))
        deltasum = float(deltasum)
        cost_old, model_new, cost_new = np.asarray(costs, dtype=np.float64)
        actual, pred = cost_old - cost_new, cost_old - model_new
        slack = slack_rel * max(cost_old, 1.0)
        finite = np.isfinite(cost_new) and np.isfinite(deltasum)
        tiny = finite and deltasum <= settings.threshold
        if not (tiny or (finite and actual >= -slack)):
            lam = max(lam * nu, 1e-4)
            nu = min(nu * 2.0, 64.0)
            if lam > 1e10:
                from fish_eye_bundle_adjustment_tpu.utils.observe import (
                    SolverDivergence,
                )

                raise SolverDivergence(count + 1, deltasum, delta_history)
            continue
        rho = actual / pred if pred > slack else 1.0
        lam = lam * max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        if lam < 1e-14:
            lam = 0.0
        nu = 2.0
        count += 1
        x_prev = x
        x, v = x_trial, v_trial
        delta_history.append(deltasum)
        if keep_history:
            history.append(np.asarray(x))
        # converge only once damping has decayed (see run_gn_loop note)
        if deltasum <= settings.threshold and lam <= 1e-3:
            converged = True
            break
        if count >= settings.iteration_cap:
            break
    elapsed = time.perf_counter() - t0

    v_np = np.asarray(v)
    # sigma0^2 redundancy EXCLUDES the 7 constraints (main.m:601)
    sigma02 = float(v_np @ (np.asarray(p_diag) * v_np) / (n - u))
    rms_x = float(np.sqrt(np.mean(v_np[0::2] ** 2)))
    rms_y = float(np.sqrt(np.mean(v_np[1::2] ** 2)))

    Cx = std = Cx_q = std_method = None
    if compute_covariance:
        Cx_q = np.asarray(covariance(x_prev))
        # de-scale the diagonal only (main.m:458-482), then apply sigma02
        # to the whole matrix (main.m:602)
        Cx = Cx_q.copy()
        np.fill_diagonal(Cx, np.diag(Cx_q) / layout.scale**2)
        Cx = sigma02 * Cx
        std = np.sqrt(np.maximum(np.diag(Cx), 0.0))
        std_method = "exact"

    return DenseResult(
        problem=problem,
        layout=layout,
        x=np.asarray(x),
        iterations=count,
        converged=converged,
        delta_history=delta_history,
        x_history=np.asarray(history) if keep_history else np.zeros((0, u)),
        v=v_np,
        sigma02=sigma02,
        rms_x=rms_x,
        rms_y=rms_y,
        rms=float(np.sqrt(rms_x**2 + rms_y**2)),
        Cx=Cx,
        std=std,
        Cx_q=Cx_q,
        elapsed_s=elapsed,
        std_method=std_method,
    )
