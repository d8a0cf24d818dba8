"""Independent brute-force oracle (PARITY.md golden-provenance note).

MATLAB is unavailable here, so no golden file was produced by the
reference itself.  This test stands in for that oracle: it re-implements
the pinhole + distortion model in plain NumPy straight from the
documented formulas (BuildAwG.m:163-214 conventions: R3(k)R2(p)R1(w)
rotation, distortion at the MEASURED coordinates, y_dir sign on fy),
builds the dense design matrix by CENTRAL FINITE DIFFERENCES — no
autodiff, no solver code — forms delta = -(A'PA)^-1 A'Pw in q-space, and
requires the framework's first Gauss-Newton step on cam0 (inner
constraints off; datum held by the 3 control points) to match it.
"""

import dataclasses

import numpy as np
import pytest


def _rot(w, p, k):
    cw, sw = np.cos(w), np.sin(w)
    cp, sp = np.cos(p), np.sin(p)
    ck, sk = np.cos(k), np.sin(k)
    return np.array([
        [ck * cp, cw * sk + ck * sp * sw, sk * sw - ck * cw * sp],
        [-cp * sk, ck * cw - sk * sp * sw, ck * sw + cw * sk * sp],
        [sp, -cp * sw, cp * cw],
    ])


def _residual_np(problem, layout, x):
    """(2n,) misclosure f(x) - obs, pure NumPy, pinhole model."""
    s = problem.settings
    nk = s.num_radial_distortions
    ne = layout.n_eop
    ni = layout.n_iop
    eop = x[: layout.eop_size].reshape(problem.n_img, ne)
    iop = x[layout.iop_offset : layout.tie_offset].reshape(problem.n_cam, ni)
    pts_est = x[layout.tie_offset :].reshape(-1, 3)
    out = np.empty((problem.n_obs, 2))
    tie_slot = problem.target_tie_slot
    for i in range(problem.n_obs):
        im = problem.obs_img[i]
        cm = problem.obs_cam[i]
        pt = problem.obs_pt[i]
        Xc, Yc, Zc, om, ph, ka = eop[im]
        xp, yp, c = iop[cm, 0], iop[cm, 1], iop[cm, 2]
        K = iop[cm, 3 : 3 + nk]
        P1, P2 = iop[cm, 3 + nk], iop[cm, 4 + nk]
        slot = tie_slot[pt]
        XYZ = pts_est[slot] if slot >= 0 else problem.cnt_xyz[pt]
        U, V, W = _rot(om, ph, ka) @ (XYZ - np.array([Xc, Yc, Zc]))
        mx, my = problem.obs_xy[i]
        xb, yb = mx - xp, my - yp
        r2 = xb * xb + yb * yb
        dr = 0.0
        for j in range(nk, 0, -1):
            dr = dr * r2 + K[j - 1]
        dr *= r2
        dec_x = P1 * (yb * yb + 3 * xb * xb) + 2 * P2 * xb * yb
        dec_y = P2 * (xb * xb + 3 * yb * yb) + 2 * P1 * xb * yb
        yd = problem.y_dir[cm]
        fx = -c * U / W + xp + dr * xb + dec_x
        fy = -c * yd * V / W + yp + dr * yb + dec_y
        out[i] = (fx - mx, fy - my)
    return out.reshape(-1)


@pytest.mark.slow
def test_fd_normal_equations_first_step(cam0_problem):
    from fish_eye_bundle_adjustment_tpu.solver.dense import solve_dense
    from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

    problem = dataclasses.replace(
        cam0_problem,
        settings=dataclasses.replace(
            cam0_problem.settings, inner_constraints=False, iteration_cap=1
        ),
    )
    layout = ParamLayout(problem)
    x0 = layout.initial()
    scale = layout.scale  # q = scale * x conditioning (rmax^{2j} columns)

    # oracle: central-difference design matrix in q-space
    q0 = x0 * scale
    w0 = _residual_np(problem, layout, q0 / scale)
    u = layout.u
    A = np.empty((w0.size, u))
    for j in range(u):
        h = 1e-6 * max(1.0, abs(q0[j]))
        qp = q0.copy(); qp[j] += h
        qm = q0.copy(); qm[j] -= h
        A[:, j] = (
            _residual_np(problem, layout, qp / scale)
            - _residual_np(problem, layout, qm / scale)
        ) / (2 * h)
    # 1) the assembled design matrix must match the framework's autodiff
    #    A column-for-column (conditioning-free comparison)
    from fish_eye_bundle_adjustment_tpu.solver.linearize import Linearizer

    lin = Linearizer(problem, layout)
    A_jax, w_jax = (np.asarray(a) for a in lin.dense_design(q0))
    np.testing.assert_allclose(w_jax, w0, rtol=0, atol=1e-10)
    col_scale = np.maximum(np.abs(A_jax).max(axis=0), 1e-12)
    col_err = np.abs(A - A_jax).max(axis=0) / col_scale
    assert col_err.max() < 1e-5, col_err.max()

    # 2) gradient and first GN step agree (the step comparison is loose:
    #    FD truncation ~1e-8 in A is amplified by cond(N) ~ 1e8 in the
    #    solve, so only the norm-level agreement is meaningful)
    Pw = problem.obs_weights().reshape(-1)
    g_fd = A.T @ (Pw * w0)
    g_jax = A_jax.T @ (Pw * w_jax)
    np.testing.assert_allclose(
        g_fd, g_jax, rtol=1e-5, atol=1e-5 * np.abs(g_jax).max()
    )
    N = A.T @ (Pw[:, None] * A)
    delta_oracle = -np.linalg.solve(N, g_fd) / scale

    res = solve_dense(problem, compute_covariance=False, keep_history=True)
    delta_solver = res.x_history[1] - res.x_history[0]
    ratio = np.linalg.norm(delta_solver - delta_oracle) / np.linalg.norm(
        delta_oracle
    )
    assert ratio < 0.05, ratio
