"""Projection models, distortion, and the per-observation residual.

The mathematical core, replacing BuildAwG.m:163-214 (forward model) and its
~3,000 lines of machine-generated symbolic partials (BuildAwG.m:220-503) —
Jacobians here come from JAX autodiff on this single residual definition.

Conventions reproduced from the reference:

1. Rotation: camera frame vector (U,V,W) = R3(kappa) R2(phi) R1(omega) @
   (X - Xc) with the expanded element forms of BuildAwG.m:163-166.
2. Distortion (radial Sum_j K_j r^(2j) and Conrady-Brown decentering) is
   evaluated at the MEASURED image coordinates (x - xp, y - yp), not the
   projected ones — the additive-correction convention of BuildAwG.m:168-181.
3. ``y_dir`` (+-1) flips the sign of the projected y term only
   (BuildAwG.m:187 et al.).
4. Five projection models (BuildAwG.m:184-214), all of the form
   fx = -c * U * g(R, W) + xp + dr*x_bar + dec_x with R = sqrt(U^2+V^2):

   | model         | g(R, W)                  |
   |---------------|--------------------------|
   | fisheye       | atan(R/W) / R            | (equidistant)
   | pinhole       | 1 / W                    | (collinearity)
   | equisolid     | 2 sin(atan(R/W)/2) / R   |
   | orthographic  | sin(atan(R/W)) / R       |
   | stereographic | 2 tan(atan(R/W)/2) / R   |

   All non-pinhole g have the removable singularity g -> 1/W as R -> 0,
   handled with a double-where so autodiff stays finite on-axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MODEL_IDS = {
    "fisheye": 0,
    "pinhole": 1,
    "equisolid": 2,
    "orthographic": 3,
    "stereographic": 4,
}

_R_EPS = 1e-12


def rotation_matrix(w, p, k):
    """R = R3(kappa) @ R2(phi) @ R1(omega), rows expanded exactly as the
    U/V/W expressions at BuildAwG.m:163-166."""
    cw, sw = jnp.cos(w), jnp.sin(w)
    cp, sp = jnp.cos(p), jnp.sin(p)
    ck, sk = jnp.cos(k), jnp.sin(k)
    return jnp.array(
        [
            [ck * cp, cw * sk + ck * sp * sw, sk * sw - ck * cw * sp],
            [-cp * sk, ck * cw - sk * sp * sw, ck * sw + cw * sk * sp],
            [sp, -cp * sw, cp * cw],
        ]
    )


def world_to_camera(eop, xyz):
    """(U, V, W) camera-frame coordinates of world point `xyz` for a camera
    with EOPs ``eop = (Xc, Yc, Zc, omega, phi, kappa)``."""
    R = rotation_matrix(eop[3], eop[4], eop[5])
    return R @ (xyz - eop[:3])


def _safe_axis_factor(R, W, fn):
    """fn(R, W)/R with the R->0 limit 1/W, autodiff-safe (double-where)."""
    near = R < _R_EPS
    R_safe = jnp.where(near, 1.0, R)
    return jnp.where(near, 1.0 / W, fn(R_safe, W) / R_safe)


def projection_factor(model_id: int, R, W):
    """g(R, W) table above. `model_id` must be static (Python int)."""
    if model_id == MODEL_IDS["fisheye"]:
        return _safe_axis_factor(R, W, lambda R, W: jnp.arctan(R / W))
    if model_id == MODEL_IDS["pinhole"]:
        return 1.0 / W
    if model_id == MODEL_IDS["equisolid"]:
        return _safe_axis_factor(R, W, lambda R, W: 2.0 * jnp.sin(0.5 * jnp.arctan(R / W)))
    if model_id == MODEL_IDS["orthographic"]:
        return _safe_axis_factor(R, W, lambda R, W: jnp.sin(jnp.arctan(R / W)))
    if model_id == MODEL_IDS["stereographic"]:
        return _safe_axis_factor(R, W, lambda R, W: 2.0 * jnp.tan(0.5 * jnp.arctan(R / W)))
    raise ValueError(f"unknown model id {model_id}")


def distortion(iop, obs_xy, nk: int):
    """Additive distortion corrections at the MEASURED point.

    Returns (dx, dy) where dx = dr*x_bar + dec_x etc.
    (BuildAwG.m:168-181.)
    """
    xp, yp = iop[0], iop[1]
    K = iop[3 : 3 + nk]
    P = iop[3 + nk : 5 + nk]
    xb = obs_xy[0] - xp
    yb = obs_xy[1] - yp
    r2 = xb * xb + yb * yb
    # delta_r = sum_j K_j r^(2j); Horner in r^2
    dr = jnp.zeros((), dtype=r2.dtype)
    for j in range(nk - 1, -1, -1):
        dr = dr * r2 + K[j]
    dr = dr * r2
    dec_x = P[0] * (yb * yb + 3.0 * xb * xb) + 2.0 * P[1] * xb * yb
    dec_y = P[1] * (xb * xb + 3.0 * yb * yb) + 2.0 * P[0] * xb * yb
    return dr * xb + dec_x, dr * yb + dec_y


def project_obs(eop, iop, xyz, obs_xy, y_dir, model_id: int, nk: int):
    """Predicted image coordinates (fx, fy) for one observation.

    `model_id` and `nk` are static; everything else traced.  `obs_xy`
    participates because the distortion correction is anchored at the
    measured point (convention 2 above).
    """
    U, V, W = world_to_camera(eop, xyz)
    R = jnp.sqrt(U * U + V * V)
    g = projection_factor(model_id, R, W)
    c = iop[2]
    dx, dy = distortion(iop, obs_xy, nk)
    fx = -c * U * g + iop[0] + dx
    fy = -c * y_dir * V * g + iop[1] + dy
    return jnp.stack([fx, fy])


def residual_obs(eop, iop, xyz, obs_xy, y_dir, model_id: int, nk: int):
    """Misclosure w = f(x_hat) - observed (BuildAwG.m:506-512)."""
    return project_obs(eop, iop, xyz, obs_xy, y_dir, model_id, nk) - obs_xy


def obs_jacobian_blocks(eop, iop, xyz, obs_xy, y_dir, model_id: int, nk: int):
    """Per-observation residual Jacobian blocks via forward-mode autodiff.

    Returns (r (2,), J_eop (2,6), J_iop (2,3+nk+2), J_pt (2,3)) — the
    building blocks for dense-A scatter, block-sparse normal equations, and
    Schur elimination.  Replaces every closed-form partial in
    BuildAwG.m:220-503.
    """
    fn = lambda e, i, x: residual_obs(e, i, x, obs_xy, y_dir, model_id, nk)
    r = fn(eop, iop, xyz)
    J_eop, J_iop, J_pt = jax.jacfwd(fn, argnums=(0, 1, 2))(eop, iop, xyz)
    return r, J_eop, J_iop, J_pt
