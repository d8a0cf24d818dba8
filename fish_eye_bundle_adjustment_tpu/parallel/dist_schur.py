"""Distributed Schur solver: observation-sharded over a device mesh.

SPMD scheme (SURVEY.md §2.5 mandate — the reference has zero parallelism):

- the ``obs`` axis of ObsData is sharded across the mesh (data parallel
  over observations: per-shard residual/Jacobian block evaluation);
- camera/point state (the unknown vector, Hpp, preconditioner blocks, CG
  vectors) is replicated; every observation-axis segment sum is followed
  by a ``psum`` over the mesh — the only collectives in the solver, riding
  ICI within a slice and DCN across hosts;
- the inner CG while_loop runs in lockstep on every device (identical
  replicated iterates), so one jitted shard_map step performs the whole
  Gauss-Newton iteration with no host round-trips.

On N hosts, initialize with parallel.mesh.init_distributed and pass the
global mesh: jax.make_array_from_process_local_data shards each host's
observation slice.  Single-process multi-device (the testable path here)
uses device_put with a NamedSharding.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from fish_eye_bundle_adjustment_tpu.io.problem import BAProblem
from fish_eye_bundle_adjustment_tpu.parallel.mesh import OBS_AXIS, make_mesh, pad_to_multiple
from fish_eye_bundle_adjustment_tpu.solver.constraints import validate_inner_constraints
from fish_eye_bundle_adjustment_tpu.solver.dense import DenseResult
from fish_eye_bundle_adjustment_tpu.solver.schur import (
    ObsData,
    SchurKernel,
    SchurOptions,
    _finalize,
    run_gn_loop,
    schur_step_fn,
    unpermute_v,
)
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout


def shard_obs(obs: ObsData, mesh) -> ObsData:
    """Place ObsData leaves: observation axis sharded, per-camera tables
    replicated (obs.pspec).

    Multi-process (DCN tier): when jax.distributed is initialized with
    more than one process, every process passes the same globally-built
    ObsData and only this host's row slice is materialized into the
    global array via jax.make_array_from_process_local_data — the mesh's
    device order is jax.devices() (process-major), so host p owns rows
    [p*n/P, (p+1)*n/P)."""
    nproc = jax.process_count()
    specs = obs.pspec(OBS_AXIS)
    if nproc == 1:
        return jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            obs, specs,
        )
    pid = jax.process_index()

    def put(a, spec):
        sharding = NamedSharding(mesh, spec)
        a = np.asarray(a)
        if len(spec) and spec[0] == OBS_AXIS:
            per = a.shape[0] // nproc
            local = a[pid * per : (pid + 1) * per]
        else:
            local = a
        return jax.make_array_from_process_local_data(sharding, local)

    return jax.tree.map(put, obs, specs)


def make_distributed_step(problem: BAProblem, mesh, options: Optional[SchurOptions] = None):
    """Build (step_fn, sharded_obs, layout).  step_fn(x, obs) performs one
    GN iteration SPMD over the mesh and returns replicated outputs
    (new_x, L1(delta), v_shard, stats, cg_iters)."""
    opts = options or SchurOptions()
    layout = ParamLayout(problem)
    use_ic = problem.settings.inner_constraints
    if use_ic:
        validate_inner_constraints(layout)

    n_dev = int(np.prod(mesh.devices.shape))
    padded = pad_to_multiple(problem.n_obs, n_dev)
    order = (
        ObsData.sort_order_by_tie(problem, layout)
        if opts.obs_order == "tie"
        else None
    )
    obs = ObsData.from_problem(
        problem, layout, dtype=opts.dtype, pad_to=padded, order=order,
        with_plan=order is not None, shard_plans=n_dev,
    )
    obs = shard_obs(obs, mesh)

    kernel = SchurKernel(
        layout, opts, reduce_fn=partial(jax.lax.psum, axis_name=OBS_AXIS),
        obs_order=opts.obs_order,
    )
    local_step = schur_step_fn(kernel, layout, use_ic)

    step = jax.jit(
        shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), obs.pspec(OBS_AXIS), P(), P()),
            out_specs=(P(), P(), P(OBS_AXIS), P(), P()),
            check_vma=False,  # replicated outputs are produced via explicit psum
        )
    )
    return step, obs, layout, order


def solve_schur_distributed(
    problem: BAProblem,
    mesh=None,
    options: Optional[SchurOptions] = None,
    keep_history: bool = False,
    x0=None,
    progress_fn=None,
    checkpoint_path=None,
    checkpoint_every: int = 1,
    compute_covariance: bool = False,
) -> DenseResult:
    """Drop-in distributed variant of solve_schur (same conventions and,
    by construction, the same arithmetic up to reduction order).

    `compute_covariance` defaults OFF here (unlike solve_schur): past the
    dense-S gate the report-time Hutchinson path runs n_probe PCG solves
    of single-device matvecs over a rebuilt unsharded ObsData — at the
    scales this solver exists for that can dominate the solve; opt in
    explicitly (the CLI does when writing a report)."""
    opts = options or SchurOptions()
    mesh = mesh if mesh is not None else make_mesh()
    step, obs, layout, order = make_distributed_step(problem, mesh, opts)

    use_device_loop = opts.device_loop
    if use_device_loop is None:
        use_device_loop = not keep_history
    if use_device_loop and not keep_history:
        # same SPMD step, driven on-device: the shard_map'd iteration
        # runs in lockstep inside lax.while_loop on every device, one
        # host sync per chunk (solver/device_loop.py)
        from fish_eye_bundle_adjustment_tpu.solver.device_loop import (
            run_gn_loop_device,
        )

        (x, history, delta_history, v_shard, stats, count, converged,
         elapsed, stopped_on) = run_gn_loop_device(
            step, obs, layout, problem, opts, x0=x0,
            progress_fn=progress_fn, checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, chunk=opts.device_chunk,
        )
    else:
        (x, history, delta_history, v_shard, stats, count, converged,
         elapsed, stopped_on) = run_gn_loop(
            step, obs, layout, problem, opts,
            keep_history=keep_history, x0=x0, progress_fn=progress_fn,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every,
            x_sharding=NamedSharding(mesh, P()),
        )
    v_np = unpermute_v(v_shard, order, problem.n_obs)
    result = _finalize(
        problem, layout, x, history, delta_history, v_np, np.asarray(stats),
        count, converged, elapsed, keep_history, stopped_on,
    )
    if compute_covariance:
        # stds at distributed scale (main.m:712-897 reports +-sigma
        # always): exact block covariance when dense S fits, Hutchinson
        # probe estimate past the gate — single-device, report-time.
        from fish_eye_bundle_adjustment_tpu.solver.covariance import (
            compute_stds,
        )

        std, Cc_q, method = compute_stds(
            problem, layout, result.x, result.sigma02, mesh=mesh
        )
        if std is not None:
            result.std = std
            result.Cc_q = Cc_q
            result.std_method = method
    return result
