"""Worker for the 2-process DCN-tier test (tests/test_multiprocess.py).

Each process: CPU backend with 2 virtual devices, jax.distributed over
localhost (parallel.mesh.init_distributed — the SURVEY §5.8 comm-backend
path), global 4-device mesh, host-local observation sharding via
jax.make_array_from_process_local_data (parallel.dist_schur.shard_obs),
then 3 distributed GN steps.  Process 0 prints the per-step L1(delta) so
the parent can compare against the single-process reference.
"""

import sys

coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from fish_eye_bundle_adjustment_tpu.parallel.mesh import (  # noqa: E402
    init_distributed, make_mesh,
)

init_distributed(coordinator=coordinator, num_processes=n_proc, process_id=pid)
assert jax.process_count() == n_proc, jax.process_count()
assert len(jax.devices()) == 2 * n_proc, jax.devices()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fish_eye_bundle_adjustment_tpu.parallel.dist_schur import (  # noqa: E402
    make_distributed_step,
)
from fish_eye_bundle_adjustment_tpu.solver.schur import SchurOptions  # noqa: E402
from fish_eye_bundle_adjustment_tpu.synth import make_block  # noqa: E402

blk = make_block(
    n_img=8, n_pts=200, model="fisheye", seed=11,
    settings_overrides={"inner_constraints": False}, control_frac=0.05,
)
mesh = make_mesh(devices=jax.devices())  # global mesh across processes
opts = SchurOptions(cg_maxiter=50, obs_order="tie")
step, obs, layout, _ = make_distributed_step(blk.problem, mesh, opts)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

x = jax.device_put(jnp.asarray(layout.initial()), NamedSharding(mesh, P()))
tol = jnp.asarray(1e-8)
for _ in range(3):
    x, deltasum, _, stats, _ = step(x, obs, tol, jnp.asarray(0.0, x.dtype))
    if pid == 0:
        print(f"DELTA {float(deltasum):.17e}", flush=True)
if pid == 0:
    print("MP_OK", flush=True)
