"""Auxiliary-subsystem tests: checkpoint/resume, divergence detection,
progress records (SURVEY.md §5 mandate — absent in the reference)."""

import numpy as np
import pytest

from fish_eye_bundle_adjustment_tpu.solver.schur import SchurOptions, solve_schur
from fish_eye_bundle_adjustment_tpu.synth import make_block
from fish_eye_bundle_adjustment_tpu.utils import checkpoint as ck
from fish_eye_bundle_adjustment_tpu.utils.observe import (
    IterationRecord,
    SolverDivergence,
    check_divergence,
)


@pytest.fixture(scope="module")
def block():
    return make_block(n_img=16, n_pts=400, seed=31)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, block):
        p = tmp_path / "state.npz"
        ck.save_checkpoint(
            p,
            ck.SolverCheckpoint(
                x=np.arange(5.0),
                iteration=3,
                delta_history=[1.0, 0.1],
                meta={"n_img": "16"},
            ),
        )
        out = ck.load_checkpoint(p)
        assert out.iteration == 3
        np.testing.assert_array_equal(out.x, np.arange(5.0))
        assert out.delta_history == [1.0, 0.1]
        assert out.meta == {"n_img": "16"}

    def test_missing_returns_none(self, tmp_path):
        assert ck.load_checkpoint(tmp_path / "nope.npz") is None

    def test_fingerprint_mismatch(self, tmp_path, block):
        p = tmp_path / "state.npz"
        ck.save_checkpoint(
            p,
            ck.SolverCheckpoint(
                x=np.zeros(3), iteration=1, delta_history=[],
                meta={"n_img": "999", "n_cam": "1", "n_tie": "0",
                      "n_obs": "0", "model": "fisheye"},
            ),
        )
        with pytest.raises(ValueError, match="different problem"):
            ck.load_checkpoint(p, block.problem)

    @pytest.mark.slow
    def test_resume_mid_solve(self, tmp_path, block):
        """Interrupt after 2 iterations, resume, converge to the same
        solution as an uninterrupted run."""
        import dataclasses

        p = tmp_path / "ba.npz"
        full = solve_schur(block.problem, keep_history=False)

        limited = dataclasses.replace(block.problem.settings, iteration_cap=2)
        prob2 = dataclasses.replace(block.problem, settings=limited)
        r2 = solve_schur(prob2, keep_history=False, checkpoint_path=p)
        assert not r2.converged and r2.iterations == 2
        assert ck.load_checkpoint(p) is not None

        resumed = solve_schur(
            block.problem, keep_history=False, checkpoint_path=p
        )
        assert resumed.converged
        # total work: 2 before interrupt + remainder after
        assert resumed.iterations >= 3
        np.testing.assert_allclose(resumed.x, full.x, atol=1e-8)


class TestDivergence:
    def test_nan_raises(self):
        with pytest.raises(SolverDivergence, match="diverged"):
            check_divergence(3, float("nan"), [1.0, float("nan")])

    def test_explosion_raises(self):
        with pytest.raises(SolverDivergence):
            check_divergence(4, 1e9, [1.0, 0.1, 1e9])

    def test_normal_progress_ok(self):
        check_divergence(3, 0.01, [1.0, 0.1, 0.01])
        check_divergence(2, 5.0, [1.0, 5.0])  # mild increase is fine


class TestDofGuard:
    def test_nonpositive_redundancy_warns_and_clamps(self):
        """A free-network sub-block with thin overlap (posegraph
        partitions, parallel/posegraph.py) can have u >= n; _finalize
        must warn and clamp rather than report inf/negative sigma0^2
        (reference contract: sigma0^2 = v'Pv/(n-u), main.m:601)."""
        from fish_eye_bundle_adjustment_tpu.solver.schur import _finalize
        from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

        # 2 images x ~10 pts, every target estimated, free network:
        # u = 12 + 3*n_pts grows past n = 2 * n_obs
        blk = make_block(
            n_img=2, n_pts=10, control_frac=0.0, seed=3,
            settings_overrides={"inner_constraints": True},
            target_track_len=2.0,
        )
        problem = blk.problem
        layout = ParamLayout(problem)
        assert problem.n - layout.u <= 0, "fixture no longer under-determined"
        stats = np.array([4.2, 1.0, 1.0])
        with pytest.warns(UserWarning, match="non-positive redundancy"):
            res = _finalize(
                problem, layout, np.zeros(layout.u), [], [1.0],
                np.zeros(problem.n), stats, 1, True, 0.1, False,
            )
        assert np.isfinite(res.sigma02) and res.sigma02 > 0


class TestProgress:
    @pytest.mark.slow
    def test_records_emitted(self, block):
        recs = []
        res = solve_schur(
            block.problem, keep_history=False, progress_fn=recs.append
        )
        assert len(recs) == res.iterations
        assert recs[0].iteration == 1
        assert recs[-1].delta_l1 == res.delta_history[-1]
        assert "sum|delta|" in str(recs[0])
