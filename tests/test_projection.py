"""Geometry-layer tests: the 5 projection models and autodiff Jacobians
validated against finite differences (replacing the reference's symbolic
partials, BuildAwG.m:220-503)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fish_eye_bundle_adjustment_tpu.models.projection import (
    MODEL_IDS,
    distortion,
    obs_jacobian_blocks,
    project_obs,
    projection_factor,
    residual_obs,
    rotation_matrix,
)

NK = 3

RNG = np.random.default_rng(42)


def _random_setup():
    eop = jnp.array([100.0, -50.0, 30.0, 0.1, -0.2, 0.3])
    iop = jnp.array([2.0, -1.5, 50.0, 1e-5, -1e-9, 1e-13, 2e-6, -3e-6])
    xyz = jnp.array([80.0, -20.0, -400.0])
    obs = jnp.array([5.0, 7.0])
    return eop, iop, xyz, obs


class TestRotation:
    def test_orthonormal(self):
        R = rotation_matrix(0.3, -0.5, 1.2)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)

    def test_identity(self):
        np.testing.assert_allclose(rotation_matrix(0.0, 0.0, 0.0), np.eye(3), atol=1e-15)

    def test_matches_reference_expansion(self):
        """Spot-check elements against the expanded U,V,W expressions of
        BuildAwG.m:163-166."""
        w, p, k = 0.7, -0.4, 0.25
        cw, sw, cp, sp, ck, sk = (
            np.cos(w), np.sin(w), np.cos(p), np.sin(p), np.cos(k), np.sin(k),
        )
        R = np.asarray(rotation_matrix(w, p, k))
        assert np.isclose(R[0, 1], cw * sk + ck * sp * sw)
        assert np.isclose(R[1, 2], ck * sw + cw * sk * sp)
        assert np.isclose(R[2, 0], sp)


class TestProjectionModels:
    @pytest.mark.parametrize("model", list(MODEL_IDS))
    def test_on_axis_limit_matches_pinhole_scale(self, model):
        """All models agree with pinhole to first order on the optical axis
        (g -> 1/W as R -> 0)."""
        mid = MODEL_IDS[model]
        g = projection_factor(mid, jnp.asarray(1e-9), jnp.asarray(-100.0))
        np.testing.assert_allclose(float(g), -0.01, rtol=1e-8)

    @pytest.mark.parametrize("model", list(MODEL_IDS))
    def test_finite_gradients_on_axis(self, model):
        """The removable singularity at R=0 must not poison autodiff."""
        mid = MODEL_IDS[model]
        eop = jnp.zeros(6)
        iop = jnp.array([0.0, 0.0, 50.0] + [0.0] * (NK + 2))
        xyz = jnp.array([0.0, 0.0, -10.0])  # exactly on axis
        obs = jnp.array([0.0, 0.0])
        _, Je, Ji, Jp = obs_jacobian_blocks(eop, iop, xyz, obs, 1.0, mid, NK)
        for J in (Je, Ji, Jp):
            assert np.all(np.isfinite(np.asarray(J))), model

    def test_fisheye_equidistant_formula(self):
        """fx = -c*U/R*atan(R/W) + xp + dist (BuildAwG.m:186-187)."""
        eop, iop, xyz, obs = _random_setup()
        U, V, W = np.asarray(
            rotation_matrix(eop[3], eop[4], eop[5]) @ (xyz - eop[:3])
        )
        R = np.hypot(U, V)
        c, xp_, yp_ = 50.0, 2.0, -1.5
        dx, dy = distortion(iop, obs, NK)
        f = project_obs(eop, iop, xyz, obs, -1.0, MODEL_IDS["fisheye"], NK)
        assert np.isclose(float(f[0]), -c * U / R * np.arctan(R / W) + xp_ + float(dx))
        assert np.isclose(
            float(f[1]), -c * (-1.0) * V / R * np.arctan(R / W) + yp_ + float(dy)
        )

    def test_pinhole_collinearity_formula(self):
        eop, iop, xyz, obs = _random_setup()
        U, V, W = np.asarray(
            rotation_matrix(eop[3], eop[4], eop[5]) @ (xyz - eop[:3])
        )
        dx, dy = distortion(iop, obs, NK)
        f = project_obs(eop, iop, xyz, obs, 1.0, MODEL_IDS["pinhole"], NK)
        assert np.isclose(float(f[0]), -50.0 * U / W + 2.0 + float(dx))
        assert np.isclose(float(f[1]), -50.0 * V / W + (-1.5) + float(dy))

    def test_y_dir_flips_y_only(self):
        eop, iop, xyz, obs = _random_setup()
        for model in MODEL_IDS.values():
            f_pos = project_obs(eop, iop, xyz, obs, 1.0, model, NK)
            f_neg = project_obs(eop, iop, xyz, obs, -1.0, model, NK)
            assert np.isclose(float(f_pos[0]), float(f_neg[0]))
            # the projected y term flips; the additive xp/yp/distortion does not
            dx, dy = distortion(iop, obs, NK)
            proj_pos = float(f_pos[1]) - (-1.5) - float(dy)
            proj_neg = float(f_neg[1]) - (-1.5) - float(dy)
            assert np.isclose(proj_pos, -proj_neg)

    def test_distortion_at_measured_coords(self):
        """Distortion is anchored at the MEASURED point (BuildAwG.m:168-181):
        changing the world point must not change the distortion term."""
        eop, iop, xyz, obs = _random_setup()
        mid = MODEL_IDS["fisheye"]
        f1 = project_obs(eop, iop, xyz, obs, 1.0, mid, NK)
        f2 = project_obs(eop, iop, xyz + 5.0, obs, 1.0, mid, NK)
        # distortion identical => difference comes only from the -c*U*g term
        dx, dy = distortion(iop, obs, NK)
        base1 = np.asarray(f1) - np.array([2.0 + float(dx), -1.5 + float(dy)])
        base2 = np.asarray(f2) - np.array([2.0 + float(dx), -1.5 + float(dy)])
        assert not np.allclose(base1, base2)  # projection moved
        # re-derive: distortion from measured coords only
        d1 = distortion(iop, obs, NK)
        d2 = distortion(iop, obs, NK)
        assert np.isclose(float(d1[0]), float(d2[0]))

    def test_radial_polynomial(self):
        """delta_r = sum K_j r^(2j) (BuildAwG.m:168-175)."""
        iop = jnp.array([1.0, -2.0, 10.0, 1e-4, 1e-8, -1e-12, 0.0, 0.0])
        obs = jnp.array([4.0, 1.0])
        xb, yb = 3.0, 3.0
        r2 = xb * xb + yb * yb
        dr = 1e-4 * r2 + 1e-8 * r2**2 - 1e-12 * r2**3
        dx, dy = distortion(iop, obs, NK)
        np.testing.assert_allclose(float(dx), dr * xb, rtol=1e-12)
        np.testing.assert_allclose(float(dy), dr * yb, rtol=1e-12)

    def test_decentering(self):
        """Conrady-Brown decentering (BuildAwG.m:180-181)."""
        p1, p2 = 2e-6, -3e-6
        iop = jnp.array([0.0, 0.0, 10.0, 0.0, 0.0, 0.0, p1, p2])
        obs = jnp.array([2.0, 5.0])
        dx, dy = distortion(iop, obs, NK)
        np.testing.assert_allclose(float(dx), p1 * (25 + 3 * 4) + 2 * p2 * 10, rtol=1e-12)
        np.testing.assert_allclose(float(dy), p2 * (4 + 3 * 25) + 2 * p1 * 10, rtol=1e-12)


class TestJacobians:
    @pytest.mark.parametrize("model", list(MODEL_IDS))
    def test_autodiff_matches_finite_difference(self, model):
        mid = MODEL_IDS[model]
        eop, iop, xyz, obs = _random_setup()
        r, Je, Ji, Jp = obs_jacobian_blocks(eop, iop, xyz, obs, -1.0, mid, NK)

        def f(e, i, x):
            return np.asarray(residual_obs(e, i, x, obs, -1.0, mid, NK))

        eps = 1e-6

        def fd(fun, arg, idx, h):
            a1 = np.asarray(arg).copy()
            a2 = a1.copy()
            a1[idx] += h
            a2[idx] -= h
            return (fun(jnp.asarray(a1)) - fun(jnp.asarray(a2))) / (2 * h)

        for idx in range(6):
            h = eps * max(1.0, abs(float(eop[idx])))
            col = fd(lambda a: f(a, iop, xyz), eop, idx, h)
            np.testing.assert_allclose(np.asarray(Je)[:, idx], col, rtol=2e-5, atol=1e-9)
        for idx in range(3):
            h = eps * max(1.0, abs(float(xyz[idx])))
            col = fd(lambda a: f(eop, iop, a), xyz, idx, h)
            np.testing.assert_allclose(np.asarray(Jp)[:, idx], col, rtol=2e-5, atol=1e-9)
        # IOP columns have wildly different magnitudes; scale steps per entry
        for idx in range(3 + NK + 2):
            h = eps * max(1e-4, abs(float(iop[idx])))
            col = fd(lambda a: f(eop, a, xyz), iop, idx, h)
            np.testing.assert_allclose(
                np.asarray(Ji)[:, idx], col, rtol=5e-4, atol=1e-10
            )
