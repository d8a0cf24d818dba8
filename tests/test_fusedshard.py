"""Fused banded kernel under shard_map (parallel/fusedshard.py) vs the
single-device fused solver: same steps, same solution (VERDICT r4
missing #2 — the kernel was pinned single-device through r4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fish_eye_bundle_adjustment_tpu.ops.bandplan import (  # noqa: E402
    build_band_plan,
    split_band_plan,
)
from fish_eye_bundle_adjustment_tpu.parallel.fusedshard import (  # noqa: E402
    make_fused_sharded_step,
    solve_schur_fused_sharded,
)
from fish_eye_bundle_adjustment_tpu.parallel.mesh import make_mesh  # noqa: E402
from fish_eye_bundle_adjustment_tpu.solver.schur import (  # noqa: E402
    ObsData,
    SchurKernel,
    SchurOptions,
    make_band_plan,
    schur_step_fn,
    solve_schur,
)
from fish_eye_bundle_adjustment_tpu.synth import make_block  # noqa: E402
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout  # noqa: E402


def _opts(**kw):
    kw.setdefault("dtype", np.float32)
    kw.setdefault("fused", True)
    kw.setdefault("cg_maxiter", 120)
    kw.setdefault("cg_tol", 1e-6)
    kw.setdefault("fused_precision_mv", "bf16x2")
    kw.setdefault("adaptive_forcing", False)
    return SchurOptions(**kw)


def test_split_plan_partitions_every_row():
    blk = make_block(n_img=12, n_pts=260, model="fisheye", seed=31,
                     settings_overrides={"inner_constraints": False},
                     control_frac=0.05)
    p = blk.problem
    layout = ParamLayout(p)
    tie = p.target_tie_slot[p.obs_pt]
    tie = np.where(tie >= 0, tie, layout.n_tie)
    plan = build_band_plan(tie, p.obs_img, layout.n_tie, p.n_img)
    for n in (2, 4, 8):
        sp = split_band_plan(plan, n)
        # every original row owned exactly once, owned copies live
        assert sp.owned_pos.shape == (p.n_obs,)
        assert np.unique(sp.owned_pos).size == p.n_obs
        rows = sp.shard_rows.reshape(-1)[sp.owned_pos]
        np.testing.assert_array_equal(np.sort(rows), np.arange(p.n_obs))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_step_matches_single_device_fused(n_dev):
    blk = make_block(n_img=10, n_pts=220, model="fisheye", seed=33,
                     settings_overrides={"inner_constraints": False},
                     control_frac=0.05)
    p = blk.problem
    layout = ParamLayout(p)
    opts = _opts()

    kernel = SchurKernel(layout, opts, obs_order="tie")
    bp = make_band_plan(p, layout, opts)
    assert bp is not None
    obs1 = ObsData.from_problem(p, layout, dtype=np.float32, band_plan=bp)
    step1 = jax.jit(schur_step_fn(kernel, layout, False))
    x0 = jnp.asarray(layout.initial().astype(np.float32))
    tol = jnp.asarray(1e-6, np.float32)
    for lam in (0.0, 0.3):
        lam_j = jnp.asarray(lam, np.float32)
        x1, d1, v1, s1, _ = step1(x0, obs1, tol, lam_j)

        mesh = make_mesh(n_dev)
        stepN, data, _, sp = make_fused_sharded_step(p, mesh, opts)
        xN, dN, vN, sN, _ = stepN(x0, data, tol, lam_j)
        np.testing.assert_allclose(
            np.asarray(xN), np.asarray(x1), rtol=2e-4, atol=2e-4,
            err_msg=f"lam={lam}",
        )
        np.testing.assert_allclose(
            float(dN), float(d1), rtol=2e-3, err_msg=f"lam={lam}")
        # stats: model cost / true costs agree
        np.testing.assert_allclose(
            np.asarray(sN), np.asarray(s1), rtol=2e-3)


@pytest.mark.slow
def test_solve_matches_single_device():
    blk = make_block(n_img=14, n_pts=300, model="fisheye", seed=35,
                     settings_overrides={"inner_constraints": False},
                     control_frac=0.05)
    p = blk.problem
    opts = _opts()
    r1 = solve_schur(p, options=opts, keep_history=False,
                     compute_covariance=False)
    rN = solve_schur_fused_sharded(
        p, make_mesh(4), options=_opts(), keep_history=False)
    assert rN.converged == r1.converged
    np.testing.assert_allclose(rN.x, r1.x, rtol=1e-3, atol=2e-3)
    assert abs(rN.sigma02 - r1.sigma02) < 1e-2
    # report-order residual rows line up
    np.testing.assert_allclose(rN.v, r1.v, rtol=5e-2, atol=5e-2)
