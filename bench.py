"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.md per-chip throughput target): observations/s of
the Schur-complement Gauss-Newton step on the BASELINE single-chip scale
config — a 1k-image / 100k-tie-point synthetic equidistant-fisheye block
(~1M image observations) — run on the TPU in float32 with the production
inexact-Newton settings (10 CG iterations/step) and the exact production
reduction path (scatter-free DualAxisPlan, with_plan=True, as solve_schur
ships).

vs_baseline = TPU obs/s divided by the same step on the host CPU (float64,
the reference-equivalent precision), measured on a smaller block and
normalized per-observation.  The MATLAB reference cannot run this problem
at all (dense u^3 ~ (1k*6 + 300k)^3); CPU-JAX is the honest stand-in.

Secondary metrics in the same JSON object:
- gn_iterations_per_second + convergence evidence: the same f32 block is
  stepped to its convergence plateau (L1(delta) under 3e-4/unknown; the
  f32 rounding floor sits near 1.8e-4/unknown) and sigma0 must come out
  ~1, i.e. the f32 iteration genuinely solves the adjustment
  (BASELINE "BA iterations/s/chip"; VERDICT r1 item 4).
- scaling: bench_scaling.py run as a CPU fake-mesh subprocess
  (BASELINE configs[5] proxy; VERDICT r1 item 5).

Usage:
  python bench.py              # full benchmark
  python bench.py --quick      # small shapes (smoke test)
  python bench.py --skip-cpu --skip-scaling --skip-convergence
"""

import argparse
import json
import subprocess
import sys
import time


SELFCAL = {
    "estimate_c": True,
    "estimate_xp": True,
    "estimate_yp": True,
    "estimate_radial": True,
    "estimate_decent": True,
}


def _build(n_img, n_pts, seed=2, selfcal=False):
    from fish_eye_bundle_adjustment_tpu.synth import make_block

    overrides = {"inner_constraints": False}
    if selfcal:
        overrides.update(SELFCAL)
    blk = make_block(
        n_img=n_img,
        n_pts=n_pts,
        model="fisheye",
        seed=seed,
        settings_overrides=overrides,
        control_frac=0.01,
    )
    return blk.problem


def _make_step(problem, dtype, cg_maxiter=10, use_explicit=False):
    """The exact production configuration solve_schur uses: tie-sorted
    observations with the scatter-free DualAxisPlan reductions."""
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

    from dataclasses import replace as dataclasses_replace

    from fish_eye_bundle_adjustment_tpu.solver.schur import make_pair_plan

    opts = SchurOptions(
        dtype=dtype, cg_maxiter=cg_maxiter, cg_tol=1e-6, obs_order="tie"
    )
    layout = ParamLayout(problem)
    kernel = SchurKernel(layout, opts, obs_order="tie")
    # production path: banded plan + fused Pallas matvec when it applies
    # (f32, single camera — solve_schur's own gate), XLA plan otherwise
    from fish_eye_bundle_adjustment_tpu.solver.schur import make_band_plan

    band_plan = make_band_plan(problem, layout, opts) if not use_explicit else None
    if band_plan is not None:
        order = band_plan.order
        obs = ObsData.from_problem(
            problem, layout, dtype=dtype, band_plan=band_plan
        )
    else:
        order = ObsData.sort_order_by_tie(problem, layout)
        obs = ObsData.from_problem(
            problem, layout, dtype=dtype, order=order, with_plan=True
        )
    # Headline uses the matrix-free stream matvec (measured faster than the
    # explicit dense-S build at 1k img with 10 CG iters/step — BASELINE.md
    # r3); the explicit path is timed separately below.
    pairs = (
        make_pair_plan(
            problem, layout,
            dataclasses_replace(opts, explicit_s=True), order,
        )
        if use_explicit
        else None
    )
    raw = schur_step_fn(kernel, layout, False, pairs=pairs)
    if pairs is not None:
        jit_raw = jax.jit(raw)
        step = lambda x, obs_, tol: jit_raw(x, obs_, tol, 0.0, pairs)
    else:
        step = jax.jit(raw)
    x0 = jnp.asarray(layout.initial().astype(dtype))
    return step, x0, obs, layout


def _time_steps(step, x0, obs, dtype, steps=5):
    """Compile + time `steps` sequential GN steps (each host-synced)."""
    import jax.numpy as jnp

    tol = jnp.asarray(1e-4, dtype)
    out = step(x0, obs, tol)  # warmup/compile
    float(out[1])
    t0 = time.perf_counter()
    xs = x0
    for _ in range(steps):
        out = step(xs, obs, tol)
        xs = out[0]
        float(out[1])  # host sync every step (real workloads read this)
    return (time.perf_counter() - t0) / steps


def _time_steps_median(step, x0, obs, dtype, reps=5):
    """Median of `reps` individually-synced step times — the CPU baseline
    uses this (r3's mean-of-3 was contaminated: the recorded eop+tie step
    came out slower than selfcal on the same shape, which is impossible;
    VERDICT r3 weak #4)."""
    import jax.numpy as jnp

    tol = jnp.asarray(1e-4, dtype)
    out = step(x0, obs, tol)  # warmup/compile
    float(out[1])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(x0, obs, tol)
        float(out[1])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _converge(step, x0, obs, layout, dtype, cap=60):
    """Step the (already compiled) f32 GN iteration to its convergence
    plateau; returns (iterations, seconds excluding compile, sigma0,
    final L1)."""
    import jax.numpy as jnp

    threshold = 3e-4 * layout.u  # f32 floor is ~1.8e-4 per unknown
    # Eisenstat-Walker forcing, as run_gn_loop does
    tol_max, tol_min = 1e-2, 1e-6
    out = step(x0, obs, jnp.asarray(tol_max, dtype))  # compiled already
    float(out[1])
    x = x0
    cg_tol = tol_max
    delta0 = None
    t0 = time.perf_counter()
    for it in range(1, cap + 1):
        x, deltasum, _, stats, _ = step(x, obs, jnp.asarray(cg_tol, dtype))
        deltasum = float(deltasum)
        delta0 = delta0 or max(deltasum, 1e-30)
        rel = deltasum / delta0
        cg_tol = max(tol_min, min(tol_max, rel * rel))
        if deltasum <= threshold:
            break
    elapsed = time.perf_counter() - t0
    vPv = float(stats[0])
    sigma02 = vPv / (layout.problem.n - layout.u)
    return it, elapsed, sigma02, deltasum


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small smoke-test shapes")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--skip-convergence", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    if args.quick:
        tpu_shape, cpu_shape = (64, 2000), (32, 1000)
    else:
        tpu_shape, cpu_shape = (1000, 100_000), (128, 10_000)

    # TPU (default backend) ------------------------------------------------
    # Headline: the full self-calibrating adjustment (the reference's
    # flagship stage-3 mode, README.md:4-10) — per-camera IOP/distortion
    # unknowns are in the measured hot loop.  The EOP+tie-only step is
    # reported alongside (r2's headline config).
    prob_tpu = _build(*tpu_shape, selfcal=True)
    step, x0, obs, layout = _make_step(prob_tpu, np.float32)
    t_step = _time_steps(step, x0, obs, np.float32, steps=args.steps)
    tpu_obs_s = prob_tpu.n_obs / t_step
    print(
        f"# TPU selfcal: {prob_tpu.n_img} img / {prob_tpu.n_tie} tie / "
        f"{prob_tpu.n_obs} obs / u={layout.u}, f32 step = {t_step*1e3:.1f} ms "
        f"-> {tpu_obs_s:,.0f} obs/s",
        file=sys.stderr,
    )

    # Production loop: the device-resident GN driver (solver/
    # device_loop.py) — the full deferred-LM accept/reject + forcing +
    # stopping logic runs under lax.while_loop, one host sync per chunk.
    # This is what solve_schur executes by default; its per-iteration
    # wall time is the honest production step cost (the per-step-synced
    # number above additionally pays one tunnel round trip per
    # iteration, measured ~31 ms on this backend — bench_stepbreak.py).
    t_dev = None
    try:
        import dataclasses as _dc

        from fish_eye_bundle_adjustment_tpu.solver.device_loop import (
            _make_chunk_fn, run_gn_loop_device,
        )
        from fish_eye_bundle_adjustment_tpu.solver.schur import (
            SchurKernel, SchurOptions, schur_step_fn,
        )

        cap = 20
        prob_dl = _dc.replace(
            prob_tpu, settings=_dc.replace(
                prob_tpu.settings, threshold=1e-12, iteration_cap=cap),
        )
        opts_dl = SchurOptions(
            dtype=np.float32, cg_maxiter=10, cg_tol=1e-6, obs_order="tie"
        )
        kern_dl = SchurKernel(layout, opts_dl, obs_order="tie")
        raw_dl = schur_step_fn(kern_dl, layout, False)
        cfn = _make_chunk_fn(
            raw_dl, opts_dl, prob_dl.settings, np.float32, opts_dl.device_chunk
        )
        run_gn_loop_device(  # compile
            raw_dl, obs, layout, prob_dl, opts_dl, chunk_fn=cfn,
            chunk=opts_dl.device_chunk,
        )
        out = run_gn_loop_device(  # warm
            raw_dl, obs, layout, prob_dl, opts_dl, chunk_fn=cfn,
            chunk=opts_dl.device_chunk,
        )
        n_it, t_loop = out[5], out[7]
        t_dev = t_loop / max(n_it, 1)
        print(
            f"# TPU selfcal device-resident loop: {n_it} iters in "
            f"{t_loop:.3f}s = {t_dev*1e3:.1f} ms/iter "
            f"-> {prob_tpu.n_obs/t_dev:,.0f} obs/s",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# device-resident loop unavailable: {e}", file=sys.stderr)

    prob_eop = _build(*tpu_shape, selfcal=False)
    estep, ex0, eobs, _elay = _make_step(prob_eop, np.float32)
    t_eop = _time_steps(estep, ex0, eobs, np.float32, steps=args.steps)
    eop_obs_s = prob_eop.n_obs / t_eop
    print(
        f"# TPU eop+tie: f32 step = {t_eop*1e3:.1f} ms "
        f"-> {eop_obs_s:,.0f} obs/s",
        file=sys.stderr,
    )

    # explicit dense-S path (S materialized once/step, GEMV matvecs) —
    # reported for the record; loses to the stream matvec at this scale
    t_exp = None
    try:
        xstep, xx0, xobs, _xlay = _make_step(
            prob_tpu, np.float32, use_explicit=True
        )
        t_exp = _time_steps(xstep, xx0, xobs, np.float32, steps=3)
        print(
            f"# TPU selfcal explicit-S: f32 step = {t_exp*1e3:.1f} ms",
            file=sys.stderr,
        )
        result_explicit_ms = round(t_exp * 1e3, 2)
    except Exception as e:
        print(f"# explicit-S path unavailable: {e}", file=sys.stderr)
        result_explicit_ms = None

    # Headline = the production device-resident loop when it ran (what
    # solve_schur actually executes); the per-step-synced measurement is
    # kept alongside as step_ms_synced for cross-round continuity.
    if t_dev is not None:
        head_obs_s = prob_tpu.n_obs / t_dev
        result = {
            "metric": "selfcal_schur_gn_step_observations_per_second",
            "value": round(head_obs_s, 1),
            "unit": "obs/s",
            "vs_baseline": None,
            "step_ms": round(t_dev * 1e3, 2),
            "loop_mode": "device_resident",
            "step_ms_synced": round(t_step * 1e3, 2),
        }
        tpu_obs_s = head_obs_s
    else:
        result = {
            "metric": "selfcal_schur_gn_step_observations_per_second",
            "value": round(tpu_obs_s, 1),
            "unit": "obs/s",
            "vs_baseline": None,
            "step_ms": round(t_step * 1e3, 2),
            "loop_mode": "host_synced",
        }
    result.update({
        "eop_tie_observations_per_second": round(eop_obs_s, 1),
        "eop_tie_step_ms": round(t_eop * 1e3, 2),
        "explicit_s_step_ms": result_explicit_ms,
    })

    # f32 convergence at benchmark scale ----------------------------------
    # The throughput step caps CG at 10 iterations; converging the outer
    # GN iteration needs the inner solves to actually reach the forcing
    # tolerance (diagnosed in r4: with cg_maxiter=10 the adjustment
    # stalls at L1 ~ 1e3 — bench_f32_convergence.py; with 40 it converges
    # in ~14 GN iterations).  Build a dedicated 40-CG step for this.
    if not args.skip_convergence:
        converged = None
        try:
            # production path: the device-resident loop drives the
            # 40-CG step to the f32 delta floor, one host sync per chunk
            import dataclasses as _dc

            from fish_eye_bundle_adjustment_tpu.solver.device_loop import (
                _make_chunk_fn, run_gn_loop_device,
            )
            from fish_eye_bundle_adjustment_tpu.solver.schur import (
                SchurKernel, SchurOptions, schur_step_fn,
            )

            prob_cv = _dc.replace(
                prob_tpu, settings=_dc.replace(
                    prob_tpu.settings,
                    threshold=3e-4 * layout.u,  # f32 delta floor
                    iteration_cap=60),
            )
            opts_cv = SchurOptions(
                dtype=np.float32, cg_maxiter=40, cg_tol=1e-6,
                obs_order="tie",
            )
            kern_cv = SchurKernel(layout, opts_cv, obs_order="tie")
            raw_cv = schur_step_fn(kern_cv, layout, False)
            cfn_cv = _make_chunk_fn(
                raw_cv, opts_cv, prob_cv.settings, np.float32,
                opts_cv.device_chunk,
            )
            run_gn_loop_device(  # compile
                raw_cv, obs, layout, prob_cv, opts_cv, chunk_fn=cfn_cv,
                chunk=opts_cv.device_chunk,
            )
            out = run_gn_loop_device(  # warm
                raw_cv, obs, layout, prob_cv, opts_cv, chunk_fn=cfn_cv,
                chunk=opts_cv.device_chunk,
            )
            _, _, dh, _, stats_cv, iters, conv_flag, secs, stop_cv = out
            l1 = dh[-1] if dh else float("inf")
            sigma02 = float(stats_cv[0]) / (prob_tpu.n - layout.u)
            it_s = iters / secs if secs > 0 else None
            converged = bool(conv_flag) and 0.8 < sigma02 < 1.2
        except Exception as e:
            print(f"# device-loop convergence failed ({e}); falling back "
                  "to the host-stepped measurement", file=sys.stderr)
            vstep, _, _, _ = _make_step(prob_tpu, np.float32, cg_maxiter=40)
            iters, secs, sigma02, l1 = _converge(
                vstep, x0, obs, layout, np.float32
            )
            it_s = iters / secs if secs > 0 else None
            converged = l1 <= 3e-4 * layout.u and 0.8 < sigma02 < 1.2
        print(
            f"# convergence: {iters} GN iters in {secs:.1f}s "
            f"({it_s:.2f} it/s), sigma0^2={sigma02:.4f}, L1={l1:.3g} "
            f"({'OK' if converged else 'NOT CONVERGED'})",
            file=sys.stderr,
        )
        result["gn_iterations_per_second"] = round(it_s, 3)
        result["f32_converged"] = bool(converged)
        result["f32_sigma02"] = round(sigma02, 5)

    # 5k-image convergence (VERDICT r4 item 1: this block NaN'd
    # deterministically under undamped GN through r4; the r5 CG
    # negative-curvature guard + adaptive LM + plateau detection converge
    # it — record the evidence).  Production path end-to-end: solve_schur
    # with the fused kernel, 40-CG steps, f32.
    if not args.skip_convergence and not args.quick:
        import dataclasses as _dc

        from fish_eye_bundle_adjustment_tpu.solver.schur import (
            SchurOptions as _SO, solve_schur as _solve,
        )
        from fish_eye_bundle_adjustment_tpu.utils.layout import (
            ParamLayout as _PL,
        )

        p5 = _build(5000, 500_000, seed=11, selfcal=False)
        lay5 = _PL(p5)
        p5 = _dc.replace(
            p5, settings=_dc.replace(
                p5.settings, threshold=3e-4 * lay5.u, iteration_cap=60),
        )
        t0 = time.perf_counter()
        try:
            r5 = _solve(
                p5,
                options=_SO(dtype=np.float32, cg_maxiter=40, cg_tol=1e-6),
                keep_history=False, compute_covariance=False,
            )
            result["scale_convergence_5k"] = {
                "n_obs": int(p5.n_obs), "u": int(lay5.u),
                "converged": bool(r5.converged),
                "stopped_on": r5.stopped_on,
                "iterations": int(r5.iterations),
                "sigma02": round(float(r5.sigma02), 5),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            print(
                f"# 5k convergence: {r5.iterations} iters "
                f"({r5.stopped_on}), sigma0^2={r5.sigma02:.5f}",
                file=sys.stderr,
            )
        except Exception as e:
            result["scale_convergence_5k"] = {"error": str(e)}
            print(f"# 5k convergence FAILED: {e}", file=sys.stderr)

    # CPU baseline — PINNED SUBPROCESS (bench_cpu_baseline.py): r2-r4
    # measured it in-process next to the live TPU client and the numbers
    # failed their own per-observation sanity check three rounds running
    # (VERDICT r4 weak #2).  The subprocess pins jax_platforms=cpu before
    # any compile, takes median-of-9 with reject-and-rerun, and reports
    # `suspect` only if consistency never materializes.
    if not args.skip_cpu:
        try:
            cmd = [
                sys.executable, "bench_cpu_baseline.py",
                "--n-img", str(cpu_shape[0]), "--n-pts", str(cpu_shape[1]),
            ]
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800,
            )
            sys.stderr.write(proc.stderr)
            cpu = json.loads(proc.stdout.strip().splitlines()[-1])
            cpu_obs_s = cpu["obs_selfcal"] / (cpu["t_selfcal_ms"] / 1e3)
            ce_obs_s = cpu["obs_eop_tie"] / (cpu["t_eop_tie_ms"] / 1e3)
            print(
                f"# CPU baseline (subprocess): selfcal {cpu_obs_s:,.0f} "
                f"obs/s, eop+tie {ce_obs_s:,.0f} obs/s",
                file=sys.stderr,
            )
            result["vs_baseline"] = round(tpu_obs_s / cpu_obs_s, 2)
            result["eop_tie_vs_baseline"] = round(eop_obs_s / ce_obs_s, 2)
            if cpu.get("suspect"):
                result["cpu_baseline_suspect"] = True
        except Exception as e:  # CPU backend unavailable: report TPU-only
            print(f"# CPU baseline unavailable: {e}", file=sys.stderr)

    # multi-device scaling proxy (subprocess: CPU fake mesh) ---------------
    if not args.skip_scaling:
        try:
            cmd = [sys.executable, "bench_scaling.py"]
            if args.quick:
                cmd.append("--quick")
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=900,
            )
            sys.stderr.write(proc.stderr)
            line = proc.stdout.strip().splitlines()[-1]
            result["scaling"] = json.loads(line)
        except Exception as e:
            print(f"# scaling harness unavailable: {e}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
