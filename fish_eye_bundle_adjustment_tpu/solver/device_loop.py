"""Device-resident Gauss-Newton driver.

`run_gn_loop` (solver/schur.py) reads two scalars back from the device
every iteration (the correction L1 and the LM merit values), which costs
one host round trip per GN step.  On a locally-attached chip that is
~50 us; through this environment's tunneled backend it measures ~31 ms
— comparable to the whole 38 ms device step (bench_stepbreak.py).  Real
control planes (multi-host launchers, RPC-attached accelerators) sit
somewhere in between, and either way the host has nothing to decide
per-iteration that the device cannot decide itself.

This module runs the SAME algorithm — deferred trust-region LM
validation (gain-ratio accept/reject with Nielsen's lambda schedule),
Eisenstat-Walker adaptive CG forcing, convergence on the reference's
L1-of-correction contract (/root/reference/main.m:412,487-493) plus the
plateau stop, the iteration cap, and both divergence detectors —
entirely inside one `lax.while_loop`, syncing to the host once per
`chunk` iterations instead of once per iteration.  Per-iteration events
(accepted / rejected trials with their delta, lambda, forcing tol) are
written into a fixed record buffer on device and replayed to the host
after each chunk, so progress callbacks, delta_history, and
checkpointing behave as before (checkpoints land on chunk boundaries).

The host loop remains the reference implementation; `tests/
test_device_loop.py` pins step-for-step parity (same iterates, same
accept/reject sequence, same stopping reason) against it.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fish_eye_bundle_adjustment_tpu.utils import checkpoint as ckpt_mod
from fish_eye_bundle_adjustment_tpu.utils.observe import (
    IterationRecord,
    SolverDivergence,
    Stopwatch,
)

# status codes carried on device
RUNNING = 0
CONV_THRESHOLD = 1
CONV_PLATEAU = 2
STOP_CAP = 3
DIVERGED = 4

# record kinds
REC_UNUSED = 0
REC_ACCEPT = 1
REC_REJECT = 2

_STOPPED_ON = {CONV_THRESHOLD: "threshold", CONV_PLATEAU: "plateau",
               STOP_CAP: "cap"}


def _make_chunk_fn(raw_step, opts, settings, dtype, chunk: int):
    """Build the jittable chunk function: up to `chunk` GN steps under
    one lax.while_loop.  Scalar state lives in the solver dtype — the
    same values the host loop reads back and rounds through `float()`."""
    sdt = jnp.dtype(dtype)
    thr = float(settings.threshold)
    cap = int(settings.iteration_cap)
    adaptive = bool(opts.adaptive_damping)
    forcing = bool(opts.adaptive_forcing)
    fmax = float(opts.forcing_max)
    tolmin = float(opts.cg_tol)
    kick = float(opts.damping_kick)
    max_damping = float(opts.max_damping)
    plateau = bool(opts.plateau_detection)
    slack_rel = float(np.finfo(np.dtype(dtype)).eps) ** (2.0 / 3.0)
    nrec = 2 * chunk + 2

    def write_rec(recs, ri, kind, count, delta, lam, cg_tol):
        row = jnp.stack([
            jnp.asarray(kind, sdt),
            jnp.asarray(count, jnp.int32).astype(sdt),
            jnp.asarray(delta, sdt),
            jnp.asarray(lam, sdt),
            jnp.asarray(cg_tol, sdt),
        ])
        zero = jnp.asarray(0, ri.dtype)
        return (
            lax.dynamic_update_slice(recs, row[None, :], (ri, zero)),
            ri + 1,
        )

    def accept(args):
        """accept_pending(): the pending trial becomes the iterate.
        Mirrors run_gn_loop — convergence/cap/divergence checks run at
        acceptance time only."""
        st, recs, ri = args
        delta = st["pend_delta"]
        count = st["count"] + 1
        # non-adaptive divergence detector (check_divergence): NaN/Inf
        # or a 1e6x blow-up over the best previous correction
        finite = jnp.isfinite(delta)
        blew_up = finite & (delta > 1e6 * st["run_min"])
        diverged = jnp.logical_and(
            not adaptive, jnp.logical_or(~finite, blew_up)
        )
        run_min = jnp.where(
            finite, jnp.minimum(st["run_min"], delta), st["run_min"]
        )
        # Eisenstat-Walker forcing from relative progress
        delta0 = jnp.where(
            st["delta0"] > 0, st["delta0"], jnp.maximum(delta, 1e-30)
        )
        rel = delta / delta0
        cg_tol = (
            jnp.clip(rel * rel, tolmin, fmax).astype(sdt)
            if forcing else st["cg_tol"]
        )
        dbuf = jnp.concatenate([st["dbuf"][1:], delta[None].astype(sdt)])
        recs, ri = write_rec(
            recs, ri, REC_ACCEPT, count, delta, st["lam"], cg_tol
        )
        # stopping decisions (at acceptance, as in accept_pending)
        lam_low = st["lam"] <= 1e-3
        conv_thr = (delta <= thr) & jnp.logical_or(not adaptive, lam_low)
        last5, prev5 = dbuf[5:], dbuf[:5]
        m_last = jnp.mean(last5)
        m_prev = jnp.mean(prev5)
        flat = (jnp.max(last5) - jnp.min(last5)) <= 0.02 * jnp.abs(m_last)
        improving = m_last < 0.98 * m_prev
        conv_plat = jnp.logical_and(
            plateau,
            (count >= 10) & lam_low & flat & ~improving
            & jnp.all(jnp.isfinite(dbuf)),
        )
        status = jnp.where(
            diverged, DIVERGED,
            jnp.where(
                conv_thr, CONV_THRESHOLD,
                jnp.where(
                    conv_plat, CONV_PLATEAU,
                    jnp.where(count >= cap, STOP_CAP, RUNNING),
                ),
            ),
        ).astype(jnp.int32)
        st = dict(
            st, x=st["pend_x"], v=st["pend_v"], stats=st["pend_stats"],
            count=count, run_min=run_min, delta0=delta0, cg_tol=cg_tol,
            dbuf=dbuf, status=status, have_pend=jnp.asarray(False),
        )
        return st, recs, ri

    @jax.jit
    def chunk_fn(st, obs):
        def body(carry):
            st, recs, ri = carry
            x_in = jnp.where(st["have_pend"], st["pend_x"], st["x"])
            x_trial, dsum, v_trial, stats_t, _ = raw_step(
                x_in, obs, st["cg_tol"], st["lam"]
            )
            cost_here = stats_t[3]
            rejected = jnp.asarray(False)
            if adaptive:
                # validate the pending trial against the true cost its
                # point shows (this step's cost_old)
                validating = st["have_pend"]
                actual = st["pend_cost"] - cost_here
                pred = st["pend_cost"] - st["pend_model"]
                slack = slack_rel * jnp.maximum(st["pend_cost"], 1.0)
                finite = (
                    jnp.isfinite(cost_here) & jnp.isfinite(st["pend_delta"])
                )
                tiny = finite & (st["pend_delta"] <= thr)
                ok = tiny | (finite & (actual >= -slack))
                rejected = validating & ~ok
                # Nielsen schedule on acceptance; raise-and-double on
                # rejection
                rho = jnp.where(pred > slack, actual / pred, 1.0)
                lam_acc = st["lam"] * jnp.maximum(
                    1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
                )
                lam_acc = jnp.where(lam_acc < 1e-14, 0.0, lam_acc)
                lam_rej = jnp.maximum(st["lam"] * st["nu"], kick)
                nu_rej = jnp.minimum(st["nu"] * 2.0, 64.0)
                lam = jnp.where(
                    rejected, lam_rej,
                    jnp.where(validating, lam_acc, st["lam"]),
                ).astype(sdt)
                nu = jnp.where(
                    rejected, nu_rej,
                    jnp.where(validating, jnp.asarray(2.0, sdt), st["nu"]),
                ).astype(sdt)
                diverged = rejected & (lam > max_damping)
                recs, ri = lax.cond(
                    rejected,
                    lambda ops: write_rec(
                        ops[0], ops[1], REC_REJECT, st["count"],
                        st["pend_delta"], lam, st["cg_tol"],
                    ),
                    lambda ops: ops,
                    (recs, ri),
                )
                st = dict(
                    st, lam=lam, nu=nu,
                    status=jnp.where(
                        diverged, DIVERGED, st["status"]
                    ).astype(jnp.int32),
                    # a rejection discards the pending trial AND this
                    # step's outputs (computed from the bad trial point)
                    have_pend=st["have_pend"] & ~rejected,
                )

            # the surviving pending trial becomes the iterate
            st, recs, ri = lax.cond(
                st["have_pend"] & (st["status"] == RUNNING),
                accept, lambda a: a, (st, recs, ri),
            )

            # stage this step's trial as the new pending iterate
            def do_stage(args):
                st, recs, ri = args
                st = dict(
                    st, pend_x=x_trial, pend_cost=cost_here,
                    pend_model=stats_t[0], pend_delta=dsum,
                    pend_v=v_trial, pend_stats=stats_t,
                    have_pend=jnp.asarray(True),
                )
                # immediate acceptance: pure-GN mode always, or a tiny
                # trial (at the fixed point damped and undamped
                # corrections coincide)
                if adaptive:
                    immediate = jnp.isfinite(dsum) & (dsum <= thr)
                else:
                    immediate = jnp.asarray(True)
                return lax.cond(immediate, accept, lambda a: a,
                                (st, recs, ri))

            stage = (st["status"] == RUNNING) & ~rejected
            return lax.cond(stage, do_stage, lambda a: a, (st, recs, ri))

        def cond(carry):
            st, _, ri = carry
            # each body iteration writes at most 2 records
            return (st["status"] == RUNNING) & (ri < nrec - 1)

        recs = jnp.zeros((nrec, 5), sdt)
        ri = jnp.asarray(0, jnp.int32)
        st, recs, _ = lax.while_loop(cond, body, (st, recs, ri))
        return st, recs

    return chunk_fn


def run_gn_loop_device(
    raw_step, obs, layout, problem, opts, x0=None, progress_fn=None,
    checkpoint_path=None, checkpoint_every: int = 1, chunk: int = 16,
    chunk_fn=None, n_pad: Optional[int] = None,
):
    """Drop-in replacement for run_gn_loop running `chunk` GN iterations
    per host round trip.  Same return tuple:
    (x, history, delta_history, v_local, stats, count, converged,
    elapsed, stopped_on).  keep_history is not supported (solve_schur
    falls back to the host loop for trajectory plots).

    `chunk_fn` injects a prebuilt (already traced/compiled) chunk
    function from _make_chunk_fn — each call here otherwise builds a
    fresh jit closure, so repeated solves of the same shapes (benchmarks,
    posegraph partitions) would recompile.  `n_pad` overrides the
    residual-row count for the v buffers (global padded rows for the
    distributed steps whose data pytree is not row-major ObsData)."""
    settings = problem.settings
    dtype = opts.dtype
    sdt = jnp.dtype(dtype)
    t0 = time.perf_counter()
    x = jnp.asarray(
        (layout.initial() if x0 is None else np.asarray(x0)).astype(dtype)
    )
    delta_history: list = []
    count = 0
    cg_tol0 = opts.forcing_max if opts.adaptive_forcing else opts.cg_tol
    delta0 = 0.0
    if checkpoint_path is not None:
        resumed = ckpt_mod.load_checkpoint(checkpoint_path, problem)
        if resumed is not None:
            x = jnp.asarray(resumed.x.astype(dtype))
            count = resumed.iteration
            delta_history = list(resumed.delta_history)
            if delta_history:
                delta0 = max(delta_history[0], 1e-300)
                rel = delta_history[-1] / delta0
                cg_tol0 = max(
                    opts.cg_tol, min(opts.forcing_max, rel * rel)
                )
    watch = Stopwatch()

    if n_pad is None:
        n_pad = obs.W.shape[0]
    dbuf0 = np.full(10, np.inf, np.dtype(dtype))
    if delta_history:
        tail = delta_history[-10:]
        dbuf0[10 - len(tail):] = tail
    finite_hist = [d for d in delta_history if np.isfinite(d)]
    st = dict(
        x=x,
        v=jnp.zeros((n_pad, 2), sdt),
        stats=jnp.zeros(4, sdt),
        count=jnp.asarray(count, jnp.int32),
        status=jnp.asarray(RUNNING, jnp.int32),
        have_pend=jnp.asarray(False),
        pend_x=x,
        pend_cost=jnp.asarray(0.0, sdt),
        pend_model=jnp.asarray(0.0, sdt),
        pend_delta=jnp.asarray(0.0, sdt),
        pend_v=jnp.zeros((n_pad, 2), sdt),
        pend_stats=jnp.zeros(4, sdt),
        lam=jnp.asarray(opts.init_damping, sdt),
        nu=jnp.asarray(2.0, sdt),
        cg_tol=jnp.asarray(cg_tol0, sdt),
        delta0=jnp.asarray(delta0, sdt),
        run_min=jnp.asarray(
            min(finite_hist) if finite_hist else np.inf, sdt
        ),
        dbuf=jnp.asarray(dbuf0),
    )
    if chunk_fn is None:
        chunk_fn = _make_chunk_fn(raw_step, opts, settings, dtype, chunk)

    status = RUNNING
    while status == RUNNING:
        st, recs = chunk_fn(st, obs)
        recs = np.asarray(recs, np.float64)
        status = int(st["status"])
        lap = watch.lap()
        n_events = int(np.sum(recs[:, 0] != REC_UNUSED))
        n_accepts = int(np.sum(recs[:, 0] == REC_ACCEPT))
        per = lap / max(n_events, 1)
        for kind, cnt, delta, lam, ctol in recs:
            if kind == REC_UNUSED:
                break
            if kind == REC_ACCEPT:
                delta_history.append(float(delta))
                if progress_fn is not None:
                    progress_fn(IterationRecord(
                        int(cnt), float(delta), per, float(ctol),
                        damping=float(lam),
                    ))
            elif progress_fn is not None:
                progress_fn(IterationRecord(
                    int(cnt), float(delta), per, float(ctol),
                    accepted=False, damping=float(lam),
                ))
        count = int(st["count"])
        if status == DIVERGED:
            bad = (
                float(recs[n_events - 1][2]) if n_events
                else float(st["pend_delta"])
            )
            raise SolverDivergence(count + 1, bad, delta_history)
        if checkpoint_path is not None and n_accepts and (
            count // checkpoint_every
            > (count - n_accepts) // checkpoint_every
        ):
            ckpt_mod.save_checkpoint(
                checkpoint_path,
                ckpt_mod.SolverCheckpoint(
                    x=np.asarray(st["x"]), iteration=count,
                    delta_history=delta_history,
                    meta={k: str(v) for k, v in
                          ckpt_mod.problem_fingerprint(problem).items()},
                ),
            )

    elapsed = time.perf_counter() - t0
    converged = status in (CONV_THRESHOLD, CONV_PLATEAU)
    stopped_on = _STOPPED_ON.get(status, "cap")
    return (
        st["x"], [], delta_history, st["v"], st["stats"], count,
        converged, elapsed, stopped_on,
    )
