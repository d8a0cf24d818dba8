"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.md per-chip throughput target): observations/s of
the Schur-complement Gauss-Newton step on the BASELINE single-chip scale
config — a 1k-image / 100k-tie-point synthetic equidistant-fisheye block
(~1M image observations) — run on the TPU in float32 with the production
inexact-Newton settings (10 CG iterations/step).

vs_baseline = TPU obs/s divided by the same step on the host CPU (float64,
the reference-equivalent precision), measured on a smaller block and
normalized per-observation.  The MATLAB reference cannot run this problem
at all (dense u^3 ~ (1k*6 + 300k)^3); CPU-JAX is the honest stand-in.

Usage:
  python bench.py              # full benchmark (TPU + CPU baseline)
  python bench.py --quick     # small shapes (smoke test)
"""

import argparse
import json
import sys
import time


def _build(n_img, n_pts, seed=2):
    from fish_eye_bundle_adjustment_tpu.synth import make_block

    blk = make_block(
        n_img=n_img,
        n_pts=n_pts,
        model="fisheye",
        seed=seed,
        settings_overrides={"inner_constraints": False},
        control_frac=0.01,
    )
    return blk.problem


def _time_steps(problem, dtype, device=None, steps=5, cg_maxiter=10):
    """Compile + time `steps` sequential GN steps (each host-synced)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fish_eye_bundle_adjustment_tpu.solver.schur import (
        ObsData,
        SchurKernel,
        SchurOptions,
        schur_step_fn,
    )
    from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

    opts = SchurOptions(
        dtype=dtype, cg_maxiter=cg_maxiter, cg_tol=1e-6, obs_order="tie"
    )
    layout = ParamLayout(problem)
    kernel = SchurKernel(layout, opts, obs_order="tie")
    order = ObsData.sort_order_by_tie(problem, layout)

    ctx = jax.default_device(device) if device is not None else _nullctx()
    with ctx:
        # with_plan=True: the exact production configuration solve_schur uses
        # (scatter-free DualAxisPlan reductions), not the scatter fallback
        obs = ObsData.from_problem(
            problem, layout, dtype=dtype, order=order, with_plan=True
        )
        step = jax.jit(schur_step_fn(kernel, layout, False))
        x = jnp.asarray(layout.initial().astype(dtype))
        tol = jnp.asarray(1e-4, dtype)
        # warmup/compile
        out = step(x, obs, tol)
        float(out[1])
        t0 = time.perf_counter()
        xs = x
        for _ in range(steps):
            out = step(xs, obs, tol)
            xs = out[0]
            float(out[1])  # host sync every step (real workloads read this)
        elapsed = time.perf_counter() - t0
    return elapsed / steps


class _nullctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small smoke-test shapes")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    if args.quick:
        tpu_shape, cpu_shape = (64, 2000), (32, 1000)
    else:
        tpu_shape, cpu_shape = (1000, 100_000), (128, 10_000)

    # TPU (default backend) ------------------------------------------------
    prob_tpu = _build(*tpu_shape)
    t_step = _time_steps(prob_tpu, np.float32, steps=args.steps)
    tpu_obs_s = prob_tpu.n_obs / t_step
    print(
        f"# TPU: {prob_tpu.n_img} img / {prob_tpu.n_tie} tie / "
        f"{prob_tpu.n_obs} obs, f32 step = {t_step*1e3:.1f} ms "
        f"-> {tpu_obs_s:,.0f} obs/s",
        file=sys.stderr,
    )

    # CPU baseline ---------------------------------------------------------
    vs = None
    if not args.skip_cpu:
        try:
            cpu_dev = jax.devices("cpu")[0]
            prob_cpu = _build(*cpu_shape)
            t_cpu = _time_steps(prob_cpu, np.float64, device=cpu_dev, steps=3)
            cpu_obs_s = prob_cpu.n_obs / t_cpu
            print(
                f"# CPU: {prob_cpu.n_obs} obs, f64 step = {t_cpu*1e3:.1f} ms "
                f"-> {cpu_obs_s:,.0f} obs/s",
                file=sys.stderr,
            )
            vs = tpu_obs_s / cpu_obs_s
        except Exception as e:  # CPU backend unavailable: report TPU-only
            print(f"# CPU baseline unavailable: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "schur_gn_step_observations_per_second",
                "value": round(tpu_obs_s, 1),
                "unit": "obs/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
