"""Fused banded Pallas matvec (ops/fusedmv.py + ops/bandplan.py) vs the
XLA gather/segsum path: same operator, same rhs, same back-substitution
(interpret mode on CPU; the real kernel runs on the chip)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fish_eye_bundle_adjustment_tpu.solver.schur import (  # noqa: E402
    ObsData,
    SchurKernel,
    SchurOptions,
    make_band_plan,
)
from fish_eye_bundle_adjustment_tpu.synth import make_block  # noqa: E402
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout  # noqa: E402


def _setup(selfcal=False, n_img=16, n_pts=250):
    overrides = {"inner_constraints": False}
    if selfcal:
        overrides.update(
            estimate_c=True, estimate_xp=True, estimate_yp=True,
            estimate_radial=True, estimate_decent=True,
        )
    blk = make_block(
        n_img=n_img, n_pts=n_pts, model="fisheye", seed=11,
        settings_overrides=overrides, control_frac=0.05,
    )
    problem = blk.problem
    layout = ParamLayout(problem)

    # pin the matvec to hi/lo precision for the strict comparisons (the
    # production default runs the CG matvec at single-pass bf16)
    opts_f = SchurOptions(
        dtype=np.float32, fused=True, fused_precision_mv="bf16x2"
    )
    kern_f = SchurKernel(layout, opts_f, obs_order="tie")
    band_plan = make_band_plan(problem, layout, opts_f)
    assert band_plan is not None, "band plan rejected on the test block"
    obs_f = ObsData.from_problem(
        problem, layout, dtype=np.float32, band_plan=band_plan
    )

    opts_x = SchurOptions(dtype=np.float32, fused=False)
    kern_x = SchurKernel(layout, opts_x, obs_order="tie")
    order = ObsData.sort_order_by_tie(problem, layout)
    obs_x = ObsData.from_problem(
        problem, layout, dtype=np.float32, order=order, with_plan=True
    )

    q = jnp.asarray((layout.initial() * layout.scale).astype(np.float32))
    fac_f = jax.jit(kern_f.linearize)(q, obs_f)
    fac_x = jax.jit(kern_x.linearize)(q, obs_x)
    assert fac_f.fused and not fac_x.fused
    return layout, kern_f, fac_f, fac_x


@pytest.mark.parametrize("selfcal", [False, True])
def test_fused_matvec_matches_xla(selfcal):
    layout, kern, fac_f, fac_x = _setup(selfcal=selfcal)
    rng = np.random.default_rng(0)
    vc = jnp.asarray(rng.standard_normal(kern.nc).astype(np.float32))
    out_f = np.asarray(jax.jit(fac_f.schur_matvec)(vc))
    out_x = np.asarray(jax.jit(fac_x.schur_matvec)(vc))
    err = np.linalg.norm(out_f - out_x) / np.linalg.norm(out_x)
    assert err < 5e-4, err


def test_bf16_matvec_within_operator_tolerance():
    """The production CG matvec runs single-pass bf16: its error is a
    bounded RELATIVE perturbation of the operator (CG still converges
    to the rhs-defined solution; SchurOptions.fused_precision_mv)."""
    layout, kern, fac_f, fac_x = _setup()
    rng = np.random.default_rng(7)
    vc = jnp.asarray(rng.standard_normal(kern.nc).astype(np.float32))
    out_x = np.asarray(jax.jit(fac_x.schur_matvec)(vc))
    out_b = np.asarray(
        jax.jit(
            lambda v: fac_f._fused_cam_out(
                *fac_f._fused_apply(
                    vpose=fac_f._fused_v(v)[0], vi=fac_f._fused_v(v)[1],
                    precision="bf16",
                )[:2]
            )
        )(vc)
    )
    err = np.linalg.norm(out_b - out_x) / np.linalg.norm(out_x)
    assert err < 3e-2, err


def test_fused_rhs_and_backsub_match_xla():
    layout, kern, fac_f, fac_x = _setup()
    rhs_f = np.asarray(jax.jit(fac_f.reduced_rhs)())
    rhs_x = np.asarray(jax.jit(fac_x.reduced_rhs)())
    err = np.linalg.norm(rhs_f - rhs_x) / np.linalg.norm(rhs_x)
    assert err < 5e-4, err

    rng = np.random.default_rng(1)
    dc = jnp.asarray(0.01 * rng.standard_normal(kern.nc).astype(np.float32))
    dp_f = np.asarray(
        jax.jit(lambda d: fac_f.tie_to_layout_order(fac_f.back_substitute(d)))(dc)
    )
    dp_x = np.asarray(
        jax.jit(lambda d: fac_x.tie_to_layout_order(fac_x.back_substitute(d)))(dc)
    )
    err = np.linalg.norm(dp_f - dp_x) / np.linalg.norm(dp_x)
    assert err < 5e-4, err


@pytest.mark.parametrize("selfcal", [False, True])
def test_fused_precond_matches_xla(selfcal):
    """rhs_and_precond: the fused kernel's Schur-Jacobi blocks act like
    the XLA-path preconditioner."""
    layout, kern, fac_f, fac_x = _setup(selfcal=selfcal)
    rng = np.random.default_rng(3)
    vc = jnp.asarray(rng.standard_normal(kern.nc).astype(np.float32))

    def run(fac):
        def f(v):
            rhs, pre, _ = fac.rhs_and_precond()
            return rhs, pre(v)

        return jax.jit(f)(vc)

    rhs_f, pv_f = (np.asarray(a) for a in run(fac_f))
    rhs_x, pv_x = (np.asarray(a) for a in run(fac_x))
    err_r = np.linalg.norm(rhs_f - rhs_x) / np.linalg.norm(rhs_x)
    err_p = np.linalg.norm(pv_f - pv_x) / np.linalg.norm(pv_x)
    assert err_r < 5e-4, err_r
    assert err_p < 5e-4, err_p


def test_fused_solve_matches_unfused():
    """End-to-end f32 GN solve, fused vs XLA path: same solution."""
    from fish_eye_bundle_adjustment_tpu.solver.schur import solve_schur

    blk = make_block(
        n_img=12, n_pts=150, model="fisheye", seed=13,
        settings_overrides={"inner_constraints": False}, control_frac=0.08,
    )
    r_f = solve_schur(
        blk.problem, SchurOptions(dtype=np.float32, fused=True),
        compute_covariance=False,
    )
    r_x = solve_schur(
        blk.problem, SchurOptions(dtype=np.float32, fused=False),
        compute_covariance=False,
    )
    assert r_f.converged == r_x.converged
    # both paths are f32; agreement is to f32 round-off on O(1e3) values
    np.testing.assert_allclose(r_f.x, r_x.x, rtol=3e-5, atol=3e-4)
    assert abs(r_f.sigma02 - r_x.sigma02) < 1e-4 * max(r_x.sigma02, 1.0)
