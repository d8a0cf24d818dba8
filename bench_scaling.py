"""Distributed scaling-efficiency harness (BASELINE configs[5]).

Runs the SPMD Gauss-Newton step over an N-device observation-sharded mesh
for N in {1, 2, 4, 8} and reports throughput + efficiency.  On real
multi-chip hardware this measures ICI scaling; this machine has one chip,
so the harness runs the standard fake-mesh CPU proxy
(xla_force_host_platform_device_count): all N virtual devices share the
same host cores, so PERFECT scaling is wall-time parity with the
single-device step and every slowdown is SPMD partitioning + collective
overhead.  Efficiency is therefore defined as

    eff(N) = t_step(single device) / t_step(shard_map over N devices)

which is exactly the obs/s-per-chip retention the BASELINE's >=80% target
asks for, measurable without N chips.

Standalone:  python bench_scaling.py [--quick] [--tenk]
(bench.py runs it as a subprocess and merges the JSON.)

--tenk wires the BASELINE 10k-image / 1M-tie-point block (multi-host
scale config); default is a CPU-sized block so the harness stays fast.
"""

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tenk", action="store_true",
                    help="BASELINE 10k-image block (slow; needs RAM)")
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args(argv)

    max_dev = max(args.devices)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from fish_eye_bundle_adjustment_tpu.parallel.dist_schur import (
        make_distributed_step,
    )
    from fish_eye_bundle_adjustment_tpu.parallel.mesh import make_mesh
    from fish_eye_bundle_adjustment_tpu.solver.schur import (
        ObsData, SchurKernel, SchurOptions, schur_step_fn,
    )
    from fish_eye_bundle_adjustment_tpu.synth import make_block
    from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

    if args.tenk:
        shape = (10_000, 1_000_000)
    elif args.quick:
        shape = (16, 500)
    else:
        shape = (128, 10_000)
    blk = make_block(
        n_img=shape[0], n_pts=shape[1], model="fisheye", seed=5,
        settings_overrides={"inner_constraints": False}, control_frac=0.01,
    )
    problem = blk.problem
    opts = SchurOptions(dtype=np.float64, cg_maxiter=10, cg_tol=1e-6,
                        obs_order="tie")

    def time_steps(step, x, obs, steps):
        tol = jnp.asarray(1e-4, opts.dtype)
        out = step(x, obs, tol)
        float(out[1])  # compile + sync
        t0 = time.perf_counter()
        xs = x
        for _ in range(steps):
            out = step(xs, obs, tol)
            xs = out[0]
            float(out[1])
        return (time.perf_counter() - t0) / steps

    # single-device baseline (no shard_map)
    layout = ParamLayout(problem)
    kernel = SchurKernel(layout, opts, obs_order="tie")
    order = ObsData.sort_order_by_tie(problem, layout)
    obs1 = ObsData.from_problem(problem, layout, dtype=opts.dtype,
                                order=order, with_plan=True)
    step1 = jax.jit(schur_step_fn(kernel, layout, False))
    x0 = jnp.asarray(layout.initial().astype(opts.dtype))
    t_single = time_steps(step1, x0, obs1, args.steps)
    print(f"# single device: {t_single*1e3:.1f} ms/step "
          f"({problem.n_obs/t_single:,.0f} obs/s)", file=sys.stderr)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = []
    t_n1 = None
    for n in args.devices:
        mesh = make_mesh(n)
        step, obs, layout_n, _ = make_distributed_step(problem, mesh, opts)
        # commit x to the step's replicated sharding (as run_gn_loop does)
        x0n = jax.device_put(
            jnp.asarray(layout_n.initial().astype(opts.dtype)),
            NamedSharding(mesh, P()),
        )
        t_n = time_steps(step, x0n, obs, args.steps)
        if t_n1 is None:
            t_n1 = t_n
        # two efficiencies, both "wall-time retention at fixed total work"
        # (perfect scaling on the shared-core fake mesh = flat wall time):
        # vs the plain single-device jit (includes shard_map overhead) and
        # vs the N=1 shard_map step (pure collective/partition growth —
        # robust to background load on the shared host)
        eff_single = t_single / t_n
        eff_n1 = t_n1 / t_n
        rows.append({"n_devices": n, "ms_per_step": round(t_n * 1e3, 2),
                     "obs_per_s": round(problem.n_obs / t_n, 1),
                     "efficiency_vs_single": round(eff_single, 3),
                     "efficiency_vs_n1": round(eff_n1, 3)})
        print(f"# N={n}: {t_n*1e3:.1f} ms/step, eff_vs_single={eff_single:.3f} "
              f"eff_vs_n1={eff_n1:.3f}", file=sys.stderr)

    result = {
        "metric": "scaling_efficiency_fake_mesh",
        "block": {"n_img": problem.n_img, "n_tie": problem.n_tie,
                  "n_obs": problem.n_obs},
        "value": rows[-1]["efficiency_vs_n1"],
        "unit": "t_N1/t_N (fixed total work on the fake mesh)",
        "table": rows,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
