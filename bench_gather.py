"""Micro-benchmarks of the data-movement primitives that bound the S
matvec, measured with IN-JIT repetition.

Methodology note (round 3): this machine reaches the TPU through a
tunneled backend; a single dispatched no-op costs ~1.4 ms wall, so timing
ops one dispatch at a time (as round 2 did) measures the tunnel, not the
chip.  Every probe here runs `reps` iterations inside one jitted
fori_loop with a forced data dependency, and reports
(T(2K) - T(K)) / K — pure device time per iteration, dispatch excluded.

Usage: python bench_gather.py [--n 1048576] [--n-img 1000] [--n-tie 100000]
"""

import argparse
import time

import numpy as np


def device_time(op, carry, reps=32, label=""):
    """Time `op` (carry -> carry) per iteration via in-jit fori_loop,
    differencing two repetition counts to cancel dispatch + loop setup."""
    import jax

    def loop(n):
        @jax.jit
        def f(c):
            return jax.lax.fori_loop(0, n, lambda i, c: op(c), c)
        return f

    fK, f2K = loop(reps), loop(2 * reps)
    for f in (fK, f2K):  # compile + warm
        jax.block_until_ready(f(carry))

    def run(f):
        t0 = time.perf_counter()
        jax.block_until_ready(f(carry))
        return time.perf_counter() - t0

    tK = min(run(fK) for _ in range(3))
    t2K = min(run(f2K) for _ in range(3))
    return (t2K - tK) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--n-img", type=int, default=1000)
    ap.add_argument("--n-tie", type=int, default=100_000)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    N, n_img, n_tie = args.n, args.n_img, args.n_tie
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    img = jnp.asarray(rng.integers(0, n_img, N).astype(np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    print(f"# N={N}, n_img={n_img}, n_tie={n_tie} (in-jit repetition)")

    # dispatch floor for reference: one dispatched tiny op, timed raw
    x0 = jnp.zeros(())
    f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(f(x0))
    t0 = time.perf_counter()
    out = x0
    for _ in range(50):
        out = f(out)
    jax.block_until_ready(out)
    print(f"dispatch floor (scalar add, 50 seq calls): "
          f"{(time.perf_counter()-t0)/50*1e3:7.3f} ms/call")

    def probe(name, op, carry, reps=32, nbytes=None):
        t = device_time(op, carry, reps)
        bw = f" ({nbytes/t/1e9:6.1f} GB/s)" if nbytes else ""
        print(f"{name:<36s}{t*1e3:8.3f} ms{bw}")
        return t

    # gather (N,8) from a small table; dependency: fold output back
    V8 = jax.random.normal(key, (n_img, 8), jnp.float32)

    def g_op(c):
        V, acc = c
        out = V[img]
        return V + acc[:n_img] * 1e-30, out

    probe("gather (N,8) small table", g_op,
          (V8, jnp.zeros((N, 8), jnp.float32)),
          nbytes=N * 8 * 4)

    # permute (N,8) and (N,4) of a large array
    for d in (8, 4):
        A = jax.random.normal(key, (N, d), jnp.float32)

        def p_op(c, d=d):
            out = c[perm]
            return out

        probe(f"permute (N,{d})", p_op, A, nbytes=N * d * 4 * 2)

    # elementwise pass (N, d)
    for d in (8, 18, 32):
        X = jax.random.normal(key, (N, d), jnp.float32)

        def e_op(c, d=d):
            return c * 1.0000001

        probe(f"ew scale (N,{d})", e_op, X, nbytes=N * d * 4 * 2)

    # per-row contraction (N,6,3)x(N,3)->(N,6) with dependency chain
    M = jax.random.normal(key, (N, 6, 3), jnp.float32)
    u3 = jax.random.normal(key, (N, 3), jnp.float32)

    def c_op(c):
        out = jnp.einsum("nep,np->ne", M, c)
        return out[:, :3] * 0.5 + u3 * 0.5

    probe("einsum (N,6,3)@(N,3)", c_op, u3, nbytes=N * (18 + 3 + 6) * 4)

    # capacity-layout reduce + broadcast
    K = 8
    T = N // K
    C = jax.random.normal(key, (T, K, 8), jnp.float32)

    def cap_op(c):
        s = jnp.sum(c, axis=1)  # (T, 8)
        return c * 0.999 + s[:, None, :] * 1e-6

    probe(f"capacity sum+bcast (T,{K},8)", cap_op, C, nbytes=N * 8 * 4 * 3)

    # sorted segsum via hierarchical prefix (the production reduction)
    from fish_eye_bundle_adjustment_tpu.ops.segment import (
        SegmentLayout, sorted_segment_sum,
    )
    tie_sorted = np.sort(rng.integers(0, n_tie, N).astype(np.int32))
    lay = SegmentLayout.from_sorted_ids(tie_sorted, n_tie)
    for d in (3, 6, 8):
        Xs = jax.random.normal(key, (N, d), jnp.float32)

        def s_op(c, d=d):
            s = sorted_segment_sum(c, lay)  # (n_tie, d)
            return c * 0.999 + jnp.tile(s, (N // n_tie + 1, 1))[:N] * 1e-9

        probe(f"sorted segsum prefix (N,{d})", s_op, Xs, reps=16,
              nbytes=N * d * 4)

    # two-level bucket reduce: (nb,K,d) sum K, then segsum over buckets
    nb = N // K
    seg = np.sort(rng.integers(0, n_tie, nb)).astype(np.int32)
    lay2 = SegmentLayout.from_sorted_ids(seg, n_tie)
    for d in (4, 8):
        Xb = jax.random.normal(key, (nb, K, d), jnp.float32)

        def t_op(c, d=d):
            s = sorted_segment_sum(jnp.sum(c, axis=1), lay2)  # (n_tie, d)
            return c * 0.999

        probe(f"two-level reduce (nb,{K},{d})", t_op, Xb, reps=16,
              nbytes=N * d * 4)

    # scatter-add for reference
    tie_j = jnp.asarray(tie_sorted)
    A8 = jax.random.normal(key, (N, 8), jnp.float32)

    def sc_op(c):
        out = jnp.zeros((n_tie, 8), jnp.float32).at[tie_j].add(
            c, indices_are_sorted=True)
        return c * 0.999 + jnp.tile(out, (N // n_tie + 1, 1))[:N] * 1e-9

    probe("scatter-add sorted (N,8)", sc_op, A8, reps=8, nbytes=N * 8 * 4)

    # gather with sorted indices (segment broadcast)
    tie_tab = jax.random.normal(key, (n_tie + 1, 8), jnp.float32)

    def gs_op(c):
        out = c[tie_j]  # (N, 8)
        return c * 0.999 + out[:n_tie + 1] * 1e-9

    probe("gather (N,8) sorted idx", gs_op, tie_tab, nbytes=N * 8 * 4)


if __name__ == "__main__":
    main()
