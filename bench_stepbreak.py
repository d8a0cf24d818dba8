"""Whole-step breakdown of the production fused GN step, robust to the
tunneled backend (block_until_ready does not synchronize there; every
measurement below ends in a scalar device->host read, and stage costs
are measured by chaining K copies INSIDE one jit via lax.scan so the
per-dispatch tunnel latency amortizes away).

Two independent decompositions at headline scale (configs[4], selfcal):
  1. cg-sweep: median step wall at cg_maxiter in {0, 5, 10, 20};
     the slope is the per-CG-iteration (matvec+axpy) cost, the
     intercept is linearize + rhs/precond + backsub + dispatch.
  2. chained stages: linearize x K, blocks x K, hpp_pass x K inside
     one jit -> per-iteration device cost.

Usage: python bench_stepbreak.py
"""

import argparse
import time

import numpy as np


def _sync(out):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    float(jnp.sum(jnp.ravel(leaves[0])[:1]).astype(jnp.float32))


def timeit(fn, *args, reps=7, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-img", type=int, default=1000)
    ap.add_argument("--n-pts", type=int, default=100_000)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from fish_eye_bundle_adjustment_tpu.solver.schur import (
        ObsData, SchurKernel, SchurOptions, make_band_plan, schur_step_fn,
    )
    from fish_eye_bundle_adjustment_tpu.synth import make_block
    from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout

    overrides = {
        "inner_constraints": False,
        "estimate_c": True, "estimate_xp": True, "estimate_yp": True,
        "estimate_radial": True, "estimate_decent": True,
    }
    blk = make_block(
        n_img=args.n_img, n_pts=args.n_pts, model="fisheye", seed=2,
        settings_overrides=overrides, control_frac=0.01,
    )
    problem = blk.problem
    layout = ParamLayout(problem)

    def build(cg):
        opts = SchurOptions(
            dtype=np.float32, cg_maxiter=cg, cg_tol=1e-6, obs_order="tie"
        )
        kernel = SchurKernel(layout, opts, obs_order="tie")
        plan = make_band_plan(problem, layout, opts)
        obs = ObsData.from_problem(
            problem, layout, dtype=np.float32, band_plan=plan
        )
        return kernel, obs, plan

    kernel, obs, plan = build(10)
    q = jnp.asarray((layout.initial() * layout.scale).astype(np.float32))
    x0 = jnp.asarray(layout.initial().astype(np.float32))
    tol = jnp.asarray(1e-4, np.float32)
    print(f"n_obs={obs.n}  n_pad={plan.n_pad}  W={plan.W} T={plan.T} "
          f"G={plan.G}")

    # --- 1. cg sweep ---------------------------------------------------
    sweep = {}
    for cg in (0, 5, 10, 20):
        k2, obs2, _ = build(cg)
        step = jax.jit(schur_step_fn(k2, layout, False))
        t = timeit(step, x0, obs2, tol)
        sweep[cg] = t * 1e3
        print(f"step cg={cg:2d}:        {t*1e3:7.2f} ms")
    slope = (sweep[20] - sweep[0]) / 20.0
    print(f"  -> per-CG-iter:    {slope:7.2f} ms;  non-CG intercept: "
          f"{sweep[0]:7.2f} ms (lin + rhs/precond + backsub + dispatch)")

    # --- 2. chained stages --------------------------------------------
    K = args.chain
    eps = jnp.asarray(1e-30, jnp.float32)

    def chain(fn, seed_like):
        """Run fn K times inside one jit; each iteration's input is
        perturbed by eps * (a scalar of the previous output) so XLA
        cannot CSE the copies."""

        def body(c, _):
            out = fn(c)
            leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
            # consume ONE scalar from EVERY leaf so XLA cannot DCE any
            # part of the stage (summing whole leaves would add real work)
            s = sum(
                jnp.ravel(l)[0].astype(jnp.float32)
                for l in leaves if l.size
            )
            return c + eps * s, s

        def run(c0):
            _, ss = lax.scan(body, c0, None, length=K)
            return ss

        return jax.jit(run)

    lin = chain(lambda qq: kernel.linearize(qq, obs, 0.0), q)
    base = chain(lambda qq: qq * 1.0000001, q)  # dispatch floor
    t_base = timeit(base, q)
    t_lin = timeit(lin, q)
    print(f"linearize (chained):   {(t_lin - t_base)/K*1e3:7.2f} ms/iter")

    blk_c = chain(lambda qq: kernel.blocks(qq, obs), q)
    t_blk = timeit(blk_c, q)
    print(f"blocks    (chained):   {(t_blk - t_base)/K*1e3:7.2f} ms/iter")

    lrp = chain(
        lambda qq: kernel.linearize(qq, obs, 0.0).rhs_and_precond(0.0), q
    )
    t_lrp = timeit(lrp, q)
    print(f"lin+rhs+pc (chained):  {(t_lrp - t_base)/K*1e3:7.2f} ms/iter")

    # full production step chained (carry x through the scan)
    raw = schur_step_fn(kernel, layout, False)

    def step_body(c, _):
        out = raw(c, obs, tol, 0.0)
        return out[0], out[1]

    step_chain = jax.jit(
        lambda c0: lax.scan(step_body, c0, None, length=K)[1]
    )
    t_step = timeit(step_chain, x0)
    print(f"FULL step (chained):   {(t_step - t_base)/K*1e3:7.2f} ms/iter"
          f"   [true device step time, cg=10]")

    # single trivial synced call = one tunnel round trip
    triv = jax.jit(lambda s: s + 1.0)
    t_triv = timeit(triv, jnp.float32(0.0))
    print(f"single-call sync floor: {t_triv*1e3:6.2f} ms   "
          f"(tunnel round trip per synced dispatch)")
    print(f"dispatch floor ({K} chained trivial iters): {t_base*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
