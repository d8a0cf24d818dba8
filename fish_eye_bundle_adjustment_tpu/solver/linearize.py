"""Batched residual + Jacobian evaluation over all observations.

Replaces the reference's per-observation interpreted loop (BuildAwG.m:46-527)
with one vmapped evaluation: gather per-observation parameters by integer
index, evaluate the residual and its autodiff Jacobian blocks, and (for the
dense parity path) scatter the blocks into the full design matrix A.

Everything operates in q-space (the conditioned parameter vector
q = scale * x — see utils/layout.py), so the assembled design matrix columns
match the reference's rmax^(2j)-scaled distortion columns
(BuildAwG.m:421-446) and the normal equations stay well-conditioned.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fish_eye_bundle_adjustment_tpu.io.problem import BAProblem
from fish_eye_bundle_adjustment_tpu.models.projection import (
    MODEL_IDS,
    obs_jacobian_blocks,
    residual_obs,
)
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout


class Linearizer:
    """Precomputes static index arrays; exposes jit-friendly closures."""

    def __init__(self, problem: BAProblem, layout: ParamLayout):
        self.problem = problem
        self.layout = layout
        self.model_id = MODEL_IDS[problem.settings.model]
        self.nk = layout.nk

        self.obs_img = jnp.asarray(problem.obs_img)
        self.obs_cam = jnp.asarray(problem.obs_cam)
        self.obs_pt = jnp.asarray(problem.obs_pt)
        self.obs_xy = jnp.asarray(problem.obs_xy)
        self.obs_ydir = jnp.asarray(problem.y_dir)[self.obs_cam]
        # tie slot per observation, -1 for control-point observations
        self.obs_tie = jnp.asarray(problem.target_tie_slot)[self.obs_pt]

        # per-observation active-column scale for iop jacobian (chain rule
        # d r/d q = (d r/d x) / s)
        self.iop_scale = jnp.asarray(layout.iop_scale_full)[self.obs_cam]  # (n_obs, 3+nk+2)

        # dense scatter indices -------------------------------------------------
        ne, ni = layout.n_eop, layout.n_iop
        n_obs = problem.n_obs
        self.row_idx = 2 * np.arange(n_obs, dtype=np.int32)
        self.eop_col0 = problem.obs_img.astype(np.int64) * ne
        self.iop_col0 = layout.iop_offset + problem.obs_cam.astype(np.int64) * ni
        tie_slot = problem.target_tie_slot[problem.obs_pt].astype(np.int64)
        self.obs_is_tie = tie_slot >= 0
        self.tie_col0 = np.where(
            self.obs_is_tie, layout.tie_offset + 3 * tie_slot, 0
        )

    # -- parameter gather ---------------------------------------------------
    def gather(self, q):
        """Per-observation (eop, iop, xyz) parameter rows from a q-vector."""
        eop, iop, pts = self.layout.unpack_scaled(q)
        return eop[self.obs_img], iop[self.obs_cam], pts[self.obs_pt]

    # -- residuals ----------------------------------------------------------
    def residuals(self, q):
        """(n_obs, 2) misclosure w rows."""
        eop_o, iop_o, xyz_o = self.gather(q)
        fn = lambda e, i, x, oxy, yd: residual_obs(
            e, i, x, oxy, yd, self.model_id, self.nk
        )
        return jax.vmap(fn)(eop_o, iop_o, xyz_o, self.obs_xy, self.obs_ydir)

    # -- jacobian blocks ----------------------------------------------------
    def blocks(self, q):
        """Residuals + per-observation Jacobian blocks in q-space.

        Returns r (n_obs,2), J_eop (n_obs,2,6), J_iop (n_obs,2,3+nk+2),
        J_pt (n_obs,2,3). J_iop columns are already divided by the
        conditioning scale; J_pt is zeroed for control-point observations.
        """
        eop_o, iop_o, xyz_o = self.gather(q)
        fn = lambda e, i, x, oxy, yd: obs_jacobian_blocks(
            e, i, x, oxy, yd, self.model_id, self.nk
        )
        r, J_eop, J_iop, J_pt = jax.vmap(fn)(
            eop_o, iop_o, xyz_o, self.obs_xy, self.obs_ydir
        )
        J_iop = J_iop / self.iop_scale[:, None, :]
        J_pt = J_pt * (self.obs_tie >= 0)[:, None, None]
        return r, J_eop, J_iop, J_pt

    # -- dense design matrix (parity path) ---------------------------------
    def dense_design(self, q):
        """Assemble the full dense A (n, u) and misclosure w (n,) in q-space.

        Row pairs (2i, 2i+1) are the x/y rows of observation i
        (BuildAwG.m:355-366 placement, zero-based)."""
        layout = self.layout
        r, J_eop, J_iop, J_pt = self.blocks(q)
        n_obs = self.problem.n_obs
        A = jnp.zeros((2 * n_obs, layout.u), dtype=r.dtype)

        rows = jnp.asarray(self.row_idx)[:, None] + jnp.arange(2)[None, :]  # (n_obs,2)
        if layout.n_eop:
            cols = jnp.asarray(self.eop_col0)[:, None] + jnp.arange(layout.n_eop)[None, :]
            blk = J_eop[:, :, jnp.asarray(layout.eop_cols)]
            A = A.at[rows[:, :, None], cols[:, None, :]].add(blk)
        if layout.n_iop:
            cols = jnp.asarray(self.iop_col0)[:, None] + jnp.arange(layout.n_iop)[None, :]
            blk = J_iop[:, :, jnp.asarray(layout.iop_cols)]
            A = A.at[rows[:, :, None], cols[:, None, :]].add(blk)
        if layout.n_tie:
            cols = jnp.asarray(self.tie_col0)[:, None] + jnp.arange(3)[None, :]
            A = A.at[rows[:, :, None], cols[:, None, :]].add(J_pt)
        return A, r.reshape(-1)
