"""Explicit (materialized dense S) solver path vs the matrix-free path.

The explicit path (solver/explicit.py) must reproduce the matrix-free
Schur solve exactly: same S action, same converged solution, in every
estimation mode (EOP+tie, inner constraints, full self-calibration) —
reference conventions per main.m:412-493.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fish_eye_bundle_adjustment_tpu.solver.explicit import (  # noqa: E402
    PairPlan,
    build_dense_S,
    dense_precond,
)
from fish_eye_bundle_adjustment_tpu.solver.schur import (  # noqa: E402
    ObsData,
    SchurKernel,
    SchurOptions,
    make_pair_plan,
    solve_schur,
)
from fish_eye_bundle_adjustment_tpu.synth import make_block  # noqa: E402
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout  # noqa: E402

SELFCAL = {
    "estimate_c": True,
    "estimate_xp": True,
    "estimate_yp": True,
    "estimate_radial": True,
    "estimate_decent": True,
}


def _setup(overrides, n_img=24, n_pts=400, seed=3):
    blk = make_block(
        n_img=n_img, n_pts=n_pts, model="fisheye", seed=seed,
        settings_overrides=overrides, control_frac=0.05,
    )
    problem = blk.problem
    layout = ParamLayout(problem)
    opts = SchurOptions(dtype=np.float64, obs_order="tie")
    kernel = SchurKernel(layout, opts, obs_order="tie")
    order = ObsData.sort_order_by_tie(problem, layout)
    obs = ObsData.from_problem(
        problem, layout, dtype=np.float64, order=order, with_plan=True
    )
    pairs = make_pair_plan(problem, layout, opts, order)
    return problem, layout, kernel, obs, pairs


@pytest.mark.parametrize(
    "overrides",
    [{"inner_constraints": False}, {"inner_constraints": False, **SELFCAL}],
    ids=["eop_tie", "selfcal"],
)
def test_dense_s_matches_matrix_free_matvec(overrides):
    problem, layout, kernel, obs, pairs = _setup(overrides)
    q = jnp.asarray(layout.initial() * layout.scale) * (1 + 1e-4) + 1e-6
    fac = kernel.linearize(q, obs)
    S = np.asarray(build_dense_S(fac, pairs))
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = jnp.asarray(rng.standard_normal(kernel.nc))
        want = np.asarray(fac.schur_matvec(v))
        got = S @ np.asarray(v)
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11 * np.abs(want).max())
    # S is symmetric
    np.testing.assert_allclose(S, S.T, atol=1e-6 * np.abs(S).max())


def test_dense_precond_pose_matches_matrix_free():
    problem, layout, kernel, obs, pairs = _setup({"inner_constraints": False})
    q = jnp.asarray(layout.initial() * layout.scale) * (1 + 1e-4)
    fac = kernel.linearize(q, obs)
    S = build_dense_S(fac, pairs)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(kernel.nc))
    # EOP-only mode: both preconditioners are the exact pose Schur-Jacobi
    got = np.asarray(dense_precond(S, kernel)(v))
    want = np.asarray(fac.make_preconditioner()[0](v))
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize(
    "overrides",
    [
        {"inner_constraints": False},
        {"inner_constraints": True},
        {"inner_constraints": False, **SELFCAL},
    ],
    ids=["eop_tie", "inner_constraints", "selfcal"],
)
def test_explicit_solve_matches_matrix_free(overrides):
    blk = make_block(
        n_img=24, n_pts=400, model="fisheye", seed=3,
        settings_overrides=overrides, control_frac=0.05,
    )
    r_exp = solve_schur(
        blk.problem, SchurOptions(dtype=np.float64, explicit_s=True),
        compute_covariance=False,
    )
    r_free = solve_schur(
        blk.problem, SchurOptions(dtype=np.float64, explicit_s=False),
        compute_covariance=False,
    )
    assert r_exp.converged and r_free.converged
    np.testing.assert_allclose(r_exp.x, r_free.x, atol=2e-10)
    assert abs(r_exp.rms - r_free.rms) < 1e-12


def test_pair_plan_counts():
    problem, layout, kernel, obs, pairs = _setup({"inner_constraints": False})
    tie = problem.target_tie_slot[problem.obs_pt]
    tie = np.where(tie >= 0, tie, layout.n_tie)
    counts = np.bincount(tie[tie < layout.n_tie], minlength=layout.n_tie)
    want = int((counts.astype(np.int64) * (counts - 1) // 2).sum())
    assert pairs.n_pairs == want
    # img[pa] <= img[pb] after normalization
    img = problem.obs_img[ObsData.sort_order_by_tie(problem, layout)]
    ia = img[np.asarray(pairs.pa)]
    ib = img[np.asarray(pairs.pb)]
    assert (ia <= ib).all()


def test_auto_selection_uses_explicit_for_small_problems():
    # make_pair_plan returns a plan when n_img is under the gate...
    blk = make_block(
        n_img=12, n_pts=200, model="fisheye", seed=1,
        settings_overrides={"inner_constraints": False}, control_frac=0.05,
    )
    layout = ParamLayout(blk.problem)
    opts = SchurOptions(dtype=np.float64)
    order = ObsData.sort_order_by_tie(blk.problem, layout)
    assert make_pair_plan(blk.problem, layout, opts, order) is not None
    # ... and None past it or when disabled
    opts_off = SchurOptions(dtype=np.float64, explicit_s=False)
    assert make_pair_plan(blk.problem, layout, opts_off, order) is None
    opts_gate = SchurOptions(dtype=np.float64, explicit_s_max_images=4)
    assert make_pair_plan(blk.problem, layout, opts_gate, order) is None
