"""Schur-complement solver tests: parity vs the dense path on cam0, ground
truth recovery on synthetic blocks, every projection model."""

import numpy as np
import pytest

from fish_eye_bundle_adjustment_tpu.solver.dense import solve_dense
from fish_eye_bundle_adjustment_tpu.solver.schur import SchurOptions, solve_schur
from fish_eye_bundle_adjustment_tpu.synth import make_block, write_block


class TestCam0Parity:
    """The matrix-free projected Schur-PCG must reproduce the dense bordered
    KKT solution (same math, different factorization order)."""

    @pytest.mark.slow
    def test_matches_dense_exact_cg(self, cam0_problem):
        """Tight CG every iteration reproduces the dense path step-for-step."""
        rd = solve_dense(cam0_problem, compute_covariance=False)
        rs = solve_schur(
            cam0_problem, SchurOptions(adaptive_forcing=False, cg_tol=1e-10)
        )
        assert rs.converged and rd.converged
        assert rs.iterations == rd.iterations
        np.testing.assert_allclose(rs.x, rd.x, atol=1e-8)
        assert abs(rs.sigma02 - rd.sigma02) < 1e-10
        assert abs(rs.rms - rd.rms) < 1e-12

    @pytest.mark.slow
    def test_matches_dense_adaptive(self, cam0_problem):
        """Inexact-Newton forcing (default) converges to the same solution,
        possibly with an extra cheap outer iteration."""
        rd = solve_dense(cam0_problem, compute_covariance=False)
        rs = solve_schur(cam0_problem)
        assert rs.converged
        assert rs.iterations <= rd.iterations + 2
        np.testing.assert_allclose(rs.x, rd.x, atol=1e-7)
        assert abs(rs.rms - rd.rms) < 1e-10


class TestSynthetic:
    @pytest.fixture(scope="class")
    def block(self):
        return make_block(n_img=25, n_pts=800, model="fisheye", seed=3)

    @pytest.mark.slow
    def test_convergence_and_noise_recovery(self, block):
        res = solve_schur(block.problem)
        assert res.converged
        # sigma02 ~ 1 when the noise model matches Meas_std
        assert 0.8 < res.sigma02 < 1.2

    @pytest.mark.slow
    def test_improves_on_initialization(self, block):
        p = block.problem
        res = solve_schur(p)
        lay = res.layout
        est = res.x[lay.tie_offset :].reshape(-1, 3)
        init = p.cnt_xyz[p.tie_target_idx]
        truth = block.true_points[p.tie_target_idx]
        err_est = np.linalg.norm(est - truth, axis=1)
        err_init = np.linalg.norm(init - truth, axis=1)
        assert np.median(err_est) < 0.5 * np.median(err_init)

    @pytest.mark.parametrize("model", ["pinhole", "equisolid", "orthographic", "stereographic"])
    @pytest.mark.slow
    def test_all_models(self, model):
        blk = make_block(n_img=16, n_pts=400, model=model, seed=7)
        res = solve_schur(blk.problem)
        assert res.converged, model
        assert 0.6 < res.sigma02 < 1.5, model

    @pytest.mark.slow
    def test_control_point_datum(self):
        """Fixed-control datum (no inner constraints) also solves."""
        blk = make_block(
            n_img=16, n_pts=400, control_frac=0.1, seed=9,
            settings_overrides={"inner_constraints": False},
        )
        assert not blk.problem.settings.inner_constraints
        res = solve_schur(blk.problem)
        assert res.converged

    @pytest.mark.slow
    def test_block_roundtrip_through_files(self, tmp_path):
        """write_block -> io parsers -> same problem (data contract check)."""
        from fish_eye_bundle_adjustment_tpu.io.problem import load_problem

        blk = make_block(n_img=9, n_pts=200, seed=11)
        write_block(blk, tmp_path)
        prob2 = load_problem(tmp_path)
        p1 = blk.problem
        assert prob2.n_obs == p1.n_obs
        assert prob2.n_img == p1.n_img
        assert prob2.n_tie == p1.n_tie
        np.testing.assert_allclose(prob2.obs_xy, p1.obs_xy, atol=1e-5)
        np.testing.assert_allclose(prob2.eop0, p1.eop0, atol=1e-9)
        res = solve_schur(prob2)
        assert res.converged


class TestMultiCamera:
    """n_cam > 1 exercises per-camera IOP blocks, gathers, and rmax scaling
    (the reference supports multiple 2-row .int entries, main.m:229-256)."""

    @pytest.mark.slow
    def test_three_cameras_self_calibration(self):
        blk = make_block(
            n_img=24, n_pts=600, n_cams=3, seed=41,
            settings_overrides={
                "estimate_c": True, "estimate_xp": True, "estimate_yp": True,
            },
        )
        p = blk.problem
        assert p.n_cam == 3
        rs = solve_schur(p, keep_history=False)
        rd = solve_dense(p, compute_covariance=False)
        assert rs.converged and rd.converged
        np.testing.assert_allclose(rs.x, rd.x, atol=1e-8)
        # each camera's focal length recovered (true: 1200 * (1 + 0.05 c))
        lay = rs.layout
        for ci in range(3):
            c_est = rs.x[lay.iop_slot(ci, 2)]
            assert abs(c_est - 1200.0 * (1 + 0.05 * ci)) < 0.5, ci

    @pytest.mark.slow
    def test_multicam_file_roundtrip(self, tmp_path):
        from fish_eye_bundle_adjustment_tpu.io.problem import load_problem

        blk = make_block(n_img=12, n_pts=300, n_cams=2, seed=43)
        write_block(blk, tmp_path)
        p2 = load_problem(tmp_path)
        assert p2.n_cam == 2
        np.testing.assert_array_equal(p2.obs_cam, blk.problem.obs_cam)
        assert solve_schur(p2, keep_history=False).converged


class TestPCGGuards:
    def test_negative_curvature_terminates(self):
        """The r4 5k-image 'deterministic divergence' mechanism: f32
        rounding on an ill-conditioned system measures pAp <= 0 near the
        CG noise floor, and the unguarded alpha = rz/pAp takes a huge
        wrong-signed step (model cost exploded 1e7 -> 1e11 on-chip).
        _pcg must TERMINATE on non-positive curvature and return the
        best-so-far iterate."""
        import jax.numpy as jnp

        from fish_eye_bundle_adjustment_tpu.solver.schur import _pcg

        # explicitly indefinite operator (stands in for a rounding-
        # indefinite near-singular f32 matvec): one -1e-3 eigenvalue
        rng = np.random.default_rng(0)
        n = 64
        Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        eigs = np.linspace(1.0, 2.0, n)
        eigs[0] = -1e-3
        A = (Q * eigs) @ Q.T
        b = rng.normal(size=n)
        A_j = jnp.asarray(A, jnp.float32)
        b_j = jnp.asarray(b, jnp.float32)
        x, iters, rel = _pcg(
            lambda v: A_j @ v, b_j, lambda v: v, lambda v: v,
            1e-10, 500,
        )
        x = np.asarray(x, np.float64)
        assert np.all(np.isfinite(x))
        # the returned iterate must not have an exploded quadratic model
        model = 0.5 * x @ (A @ x) - b @ x
        assert model <= 1.0, model  # unguarded CG drives this to -inf/NaN
        assert int(iters) < 500  # terminated early, not by budget
