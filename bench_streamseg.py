"""A/B: Pallas streaming segmented reduce (ops/attic/streamseg.py) vs the XLA
prefix-sum segsum (ops/segment.py) at the matvec's real shapes, measured
in-jit (sequential fori_loop with forced data dependencies) to exclude
the ~28 ms tunnel dispatch overhead.

Usage: python bench_streamseg.py [--n 1048576] [--n-seg 100000] [--d 8]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from fish_eye_bundle_adjustment_tpu.ops.segment import (
    SegmentLayout,
    sorted_segment_sum,
)
from fish_eye_bundle_adjustment_tpu.ops.attic.streamseg import (
    GroupedSegPlan,
    sorted_segment_sum_streaming,
    streaming_segment_sum_t,
)


def inloop_time(make_body, reps_a=8, reps_b=16):
    """Device time per op via (T(reps_b) - T(reps_a)) / (reps_b - reps_a)."""

    def run(reps):
        f = jax.jit(lambda x: jax.lax.fori_loop(0, reps, make_body, x))
        out = f(jnp.float32(1.000001))
        float(out)  # compile+sync
        t0 = time.perf_counter()
        float(f(jnp.float32(1.000001)))
        return time.perf_counter() - t0

    ta, tb = run(reps_a), run(reps_b)
    return (tb - ta) / (reps_b - reps_a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--n-seg", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--m", type=int, default=128)
    args = ap.parse_args()

    N, n_seg, D = args.n, args.n_seg, args.d
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, n_seg, N)).astype(np.int32)
    starts = np.searchsorted(ids, np.arange(n_seg + 1)).astype(np.int32)
    lay = SegmentLayout.from_sorted_ids(ids, n_seg)
    plan = GroupedSegPlan.build(starts[:-1], starts[1:], M=args.m)
    print(
        f"N={N} n_seg={n_seg} D={D}: G={plan.G} T={plan.T} "
        f"read_amplification={plan.read_amplification:.2f}"
    )

    X = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    Xt = jnp.asarray(np.asarray(X).T.copy())

    # correctness
    ref = np.zeros((n_seg, D), np.float32)
    np.add.at(ref, ids, np.asarray(X))
    got = np.asarray(sorted_segment_sum_streaming(X, plan))
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(f"streaming kernel rel err vs numpy: {err:.2e}")
    got_x = np.asarray(sorted_segment_sum(X, lay))
    err_x = np.abs(got_x - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(f"xla prefix segsum rel err vs numpy: {err_x:.2e}")

    # in-jit timing: forced dependency via scalar multiply of the input
    def body_xla(i, s):
        out = sorted_segment_sum(X * s, lay)
        return s + out[0, 0] * 1e-30

    def body_pl(i, s):
        out = streaming_segment_sum_t(Xt * s, plan)
        return s + out[0, 0] * 1e-30

    t_xla = inloop_time(body_xla)
    print(f"xla prefix segsum   (N,{D})  {t_xla*1e3:8.3f} ms")
    t_pl = inloop_time(body_pl)
    print(f"pallas streaming    ({D},N)  {t_pl*1e3:8.3f} ms "
          f"({t_xla/t_pl:.2f}x)")


if __name__ == "__main__":
    main()
