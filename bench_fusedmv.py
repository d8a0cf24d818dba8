"""A/B the fused banded Pallas matvec (ops/fusedmv.py) against the XLA
gather/segsum path on the real chip: single matvec, rhs, backsub, and the
full GN step at bench scale.

Usage: python bench_fusedmv.py [--n-img 1000] [--n-pts 100000] [--selfcal]
       [--precision bf16x2] [--band-m 128]
"""

import argparse
import time

import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-img", type=int, default=1000)
    ap.add_argument("--n-pts", type=int, default=100_000)
    ap.add_argument("--selfcal", action="store_true")
    ap.add_argument("--precision", default="bf16x2")
    ap.add_argument("--band-m", type=int, default=128)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fish_eye_bundle_adjustment_tpu.solver.schur import (
        ObsData, SchurKernel, SchurOptions, make_band_plan, schur_step_fn,
    )
    from fish_eye_bundle_adjustment_tpu.synth import make_block
    from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

    overrides = {"inner_constraints": False}
    if args.selfcal:
        overrides.update(
            estimate_c=True, estimate_xp=True, estimate_yp=True,
            estimate_radial=True, estimate_decent=True,
        )
    blk = make_block(
        n_img=args.n_img, n_pts=args.n_pts, model="fisheye", seed=2,
        settings_overrides=overrides, control_frac=0.01,
    )
    problem = blk.problem
    layout = ParamLayout(problem)

    results = {}
    for name, fused in (("xla", False), ("fused", True)):
        opts = SchurOptions(
            dtype=np.float32, cg_maxiter=10, cg_tol=1e-6, obs_order="tie",
            fused=fused, fused_precision=args.precision, band_M=args.band_m,
            explicit_s=False,
        )
        kernel = SchurKernel(layout, opts, obs_order="tie")
        if fused:
            plan = make_band_plan(problem, layout, opts)
            if plan is None:
                print("# band plan rejected; nothing to bench")
                return
            print(f"# plan: G={plan.G} T={plan.T} W={plan.W} "
                  f"read_amp={plan.read_amplification:.2f}")
            obs = ObsData.from_problem(
                problem, layout, dtype=np.float32, band_plan=plan
            )
        else:
            order = ObsData.sort_order_by_tie(problem, layout)
            obs = ObsData.from_problem(
                problem, layout, dtype=np.float32, order=order, with_plan=True
            )
        x0 = jnp.asarray(layout.initial().astype(np.float32))
        q = x0 * jnp.asarray(layout.scale, dtype=np.float32)

        lin = jax.jit(kernel.linearize)
        fac = lin(q, obs)
        t_lin = timeit(lambda: lin(q, obs), reps=5)

        rhs_fn = jax.jit(lambda f: f.reduced_rhs())
        rhs = rhs_fn(fac)
        t_rhs = timeit(lambda: rhs_fn(fac), reps=10)

        mv = jax.jit(lambda f, v: f.schur_matvec(v))
        t_mv = timeit(lambda: mv(fac, rhs), reps=20)

        bs = jax.jit(lambda f, v: f.back_substitute(v))
        t_bs = timeit(lambda: bs(fac, rhs), reps=10)

        step = jax.jit(schur_step_fn(kernel, layout, False))
        t_step = timeit(
            lambda: step(x0, obs, jnp.asarray(1e-6, np.float32)), reps=5
        )
        print(f"{name:6s} linearize {t_lin*1e3:7.2f}  rhs {t_rhs*1e3:7.2f}  "
              f"matvec {t_mv*1e3:7.2f}  backsub {t_bs*1e3:7.2f}  "
              f"step(10cg) {t_step*1e3:8.2f} ms")
        results[name] = (t_mv, t_step)
        if fused:
            out_f = np.asarray(mv(fac, rhs))
            results["mv_out_fused"] = out_f
            results["rhs_fused"] = np.asarray(rhs)
        else:
            results["mv_out_xla"] = np.asarray(mv(fac, rhs))
            results["rhs_xla"] = np.asarray(rhs)

    # numeric agreement (different rhs orderings are fine: camera vector)
    r_rel = np.linalg.norm(
        results["rhs_fused"] - results["rhs_xla"]
    ) / np.linalg.norm(results["rhs_xla"])
    print(f"# rhs rel diff: {r_rel:.2e}")
    sp = results["xla"][1] / results["fused"][1]
    sm = results["xla"][0] / results["fused"][0]
    print(f"# speedup: matvec {sm:.2f}x, step {sp:.2f}x")


if __name__ == "__main__":
    main()
