"""Dense-solver tests: cam0 end-to-end in the three estimation modes
(README.md:4-10 stages), gauge behavior, and solver conventions."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from fish_eye_bundle_adjustment_tpu.config import Settings
from fish_eye_bundle_adjustment_tpu.solver.constraints import build_G
from fish_eye_bundle_adjustment_tpu.solver.dense import solve_dense
from fish_eye_bundle_adjustment_tpu.solver.linearize import Linearizer
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout


def _with(settings, **kw):
    return dataclasses.replace(settings, **kw)


def _reproblem(problem, settings):
    import dataclasses as dc

    p = dc.replace(problem, settings=settings)
    if not (settings.estimate_tie or settings.estimate_all_gcp):
        p = dc.replace(
            p,
            tie_ids=[],
            tie_target_idx=np.zeros(0, np.int32),
            target_tie_slot=np.full(problem.n_targets, -1, np.int32),
        )
    return p


STAGE1 = dict(
    inner_constraints=False,
    estimate_xp=False,
    estimate_yp=False,
    estimate_c=False,
    estimate_radial=False,
    estimate_decent=False,
    estimate_tie=False,
    estimate_all_gcp=False,
)


class TestStage1:
    """EOP-only, fixed control (README stage 1)."""

    def test_converges(self, cam0_problem):
        prob = _reproblem(cam0_problem, _with(cam0_problem.settings, **STAGE1))
        res = solve_dense(prob)
        assert res.converged
        assert res.layout.u == 42 * 6
        assert res.rms < 1.0  # px-level reprojection on calibrated data
        # delta L1 decreases monotonically after the first step
        assert res.delta_history[-1] < res.delta_history[0]

    def test_covariance_sane(self, cam0_problem):
        prob = _reproblem(cam0_problem, _with(cam0_problem.settings, **STAGE1))
        res = solve_dense(prob)
        assert np.all(np.isfinite(res.std))
        assert np.all(res.std > 0)


class TestStage2:
    """Inner-constraints free network (README stage 2)."""

    def _solve(self, cam0_problem):
        s = _with(
            cam0_problem.settings,
            inner_constraints=True,
            estimate_xp=False,
            estimate_yp=False,
            estimate_c=False,
            estimate_radial=False,
            estimate_decent=False,
            estimate_tie=True,
        )
        return solve_dense(_reproblem(cam0_problem, s))

    def test_converges(self, cam0_problem):
        res = self._solve(cam0_problem)
        assert res.converged
        assert res.layout.u == 42 * 6 + 106 * 3

    def test_gauge_nullspace(self, cam0_problem):
        """The datum constraint G'delta = 0 must hold at the solution
        (the KKT system enforces it, main.m:428-440)."""
        res = self._solve(cam0_problem)
        layout = res.layout
        # recompute final delta by one more step
        lin = Linearizer(res.problem, layout)
        q = jnp.asarray(res.x) * jnp.asarray(layout.scale)
        G = np.asarray(build_G(layout, q))
        # G rows live only in the EOP block (BuildAwG.m:514-527)
        assert np.all(G[layout.eop_size :] == 0.0)

    def test_free_network_smaller_pose_std(self, cam0_problem):
        """Free-network mean tie-point sigma should be finite and the solve
        must not blow up despite the datum defect."""
        res = self._solve(cam0_problem)
        tie_std = res.std[res.layout.tie_offset :]
        assert np.all(np.isfinite(tie_std))


class TestStage3:
    """Full self-calibration — the shipped cam0 config."""

    @pytest.fixture(scope="class")
    def result(self, cam0_problem):
        return solve_dense(cam0_problem)

    def test_unknown_count(self, result):
        # 42*6 + 1*10 + 106*3 = 580 (SURVEY problem size)
        assert result.layout.u == 580

    def test_converged_fast(self, result):
        assert result.converged
        assert result.iterations <= 10

    def test_statistics(self, result):
        # With Meas_std=0.3 the shipped calibration yields sigma02 < 1
        assert 0.1 < result.sigma02 < 2.0
        assert result.rms == pytest.approx(
            np.sqrt(result.rms_x**2 + result.rms_y**2)
        )
        assert result.rms < 0.5

    def test_recovers_shipped_calibration(self, result):
        """cam0.int holds a previously converged calibration; re-adjusting
        must land close to it."""
        layout = result.layout
        x = result.x
        off = layout.iop_offset
        xp, yp, c = x[off], x[off + 1], x[off + 2]
        assert abs(xp - 1207.903) < 1.0
        assert abs(yp - 1013.724) < 1.0
        assert abs(c - 1234.758) < 1.0

    def test_residual_consistency(self, result):
        """v = A*delta + w at convergence ~= true reprojection residual of
        the converged parameters (metamorphic check, main.m:569)."""
        lin = Linearizer(result.problem, result.layout)
        q = jnp.asarray(result.x) * jnp.asarray(result.layout.scale)
        w = np.asarray(lin.residuals(q)).reshape(-1)
        np.testing.assert_allclose(result.v, w, atol=1e-4)

    def test_distortion_descaling(self, result):
        """Converged radial coefficients must be in physical units (k5 for
        cam0 is ~1e-33; in scaled units it would be ~1e-2)."""
        layout = result.layout
        k5_idx = layout.iop_slot(0, 2 + 5)  # k5 column index 7 of iop row
        assert abs(result.x[k5_idx]) < 1e-30

    def test_dof_accounting(self, result):
        n = result.problem.n
        u = result.layout.u
        assert n == 2058 and u == 580
        # report DOF includes the 7 constraints (main.m:673)
        assert n + 7 - u == 1485
        # sigma02 redundancy excludes them (main.m:601)
        resid = result.v
        p = result.problem.obs_weights().reshape(-1)
        np.testing.assert_allclose(
            result.sigma02, resid @ (p * resid) / (n - u), rtol=1e-12
        )


class TestConventions:
    def test_meas_std_y_interleaved(self, cam0_problem):
        s = _with(cam0_problem.settings, meas_std_y=0.6)
        prob = _reproblem(cam0_problem, s)
        w = prob.obs_weights()
        np.testing.assert_allclose(w[:, 0], 1 / 0.09)
        np.testing.assert_allclose(w[:, 1], 1 / 0.36)

    def test_ic_requires_full_eops(self, cam0_problem):
        s = _with(cam0_problem.settings, estimate_xc=False)
        prob = _reproblem(cam0_problem, s)
        with pytest.raises(ValueError, match="Inner_Constraints"):
            solve_dense(prob)
