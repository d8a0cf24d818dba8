"""Tie-axis (point-state) sharding (parallel/tieshard.py + sharded_state
point_mode='sharded') vs the single-device solver: same solution, with
per-device point arrays ~ n_tie/N and O(N)-word boundary exchanges
(SURVEY §2.5 row 2; VERDICT r2/r3 item 5)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from fish_eye_bundle_adjustment_tpu.parallel.mesh import make_mesh  # noqa: E402
from fish_eye_bundle_adjustment_tpu.parallel.sharded_state import (  # noqa: E402
    solve_schur_sharded_state,
)
from fish_eye_bundle_adjustment_tpu.parallel.tieshard import (  # noqa: E402
    build_tie_shard,
)
from fish_eye_bundle_adjustment_tpu.solver.schur import (  # noqa: E402
    SchurOptions,
    solve_schur,
)
from fish_eye_bundle_adjustment_tpu.synth import make_block  # noqa: E402


def test_plan_geometry():
    """Owned ranges tile [0, n_tie); boundary list is O(N); local spans
    are ~ n_tie/N."""
    rng = np.random.default_rng(0)
    n_tie, N = 997, 8
    counts = rng.integers(1, 12, n_tie)
    ids = np.repeat(np.arange(n_tie), counts)
    pad = (-ids.size) % N
    ids = np.concatenate([ids, np.full(pad, n_tie)])
    ts = build_tie_shard(ids, n_tie, N)
    own = np.asarray(ts.own_n).reshape(-1)
    assert own.sum() == n_tie
    assert ts.Bp <= N  # <= N-1 boundary ties (Bp >= 1 padding)
    assert ts.L <= 2 * n_tie // N + 2  # local span ~ n_tie/N

    # every tie is mapped to exactly one (owner, position)
    owner = np.asarray(ts.owner_of_tie)
    pos = np.asarray(ts.pos_in_owner)
    seen = set(zip(owner.tolist(), pos.tolist()))
    assert len(seen) == n_tie
    assert pos.max() < ts.max_own


@pytest.mark.parametrize("ic", [False, True])
def test_tie_sharded_matches_single_device(ic):
    blk = make_block(
        n_img=16, n_pts=300, model="fisheye", seed=21,
        settings_overrides={"inner_constraints": ic},
        control_frac=0.0 if ic else 0.05,
    )
    p = blk.problem
    opts = SchurOptions(dtype=np.float64)
    r1 = solve_schur(p, opts, keep_history=False, compute_covariance=False)
    rt = solve_schur_sharded_state(
        p, make_mesh(8), opts, keep_history=False, point_mode="sharded"
    )
    assert rt.converged == r1.converged
    np.testing.assert_allclose(rt.x, r1.x, rtol=1e-8, atol=1e-8)
    assert abs(rt.sigma02 - r1.sigma02) < 1e-8


@pytest.mark.slow
def test_tie_sharded_selfcal():
    blk = make_block(
        n_img=24, n_pts=500, model="fisheye", seed=23,
        settings_overrides={
            "inner_constraints": False, "estimate_c": True,
            "estimate_xp": True, "estimate_yp": True,
            "estimate_radial": True, "estimate_decent": True,
        },
        control_frac=0.05,
    )
    p = blk.problem
    opts = SchurOptions(dtype=np.float64)
    r1 = solve_schur(p, opts, keep_history=False, compute_covariance=False)
    rt = solve_schur_sharded_state(
        p, make_mesh(4), opts, keep_history=False, point_mode="sharded"
    )
    np.testing.assert_allclose(rt.x, r1.x, rtol=1e-7, atol=1e-7)
