"""Honest (host-synced) per-op costs of the matrix-free S matvec at bench
shapes — corrects r2's async-biased per-op roofline and sizes the win
available to a fused Pallas streaming kernel."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fish_eye_bundle_adjustment_tpu.ops.segment import (
    SegmentLayout,
    sorted_segment_sum,
)


def _sync(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    float(jnp.sum(leaves[0]).astype(jnp.float32))


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    N = 1_048_576
    n_img = 1000
    n_tie = 100_000
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    tie_ids = np.sort(rng.integers(0, n_tie, N)).astype(np.int32)
    lay_tie = SegmentLayout.from_sorted_ids(tie_ids, n_tie)
    img_ids = jnp.asarray(rng.integers(0, n_img, N).astype(np.int32))
    tie = jnp.asarray(tie_ids)

    Vimg = jax.random.normal(key, (n_img, 6), jnp.float32)
    Vtie = jax.random.normal(key, (n_tie, 3), jnp.float32)
    X6 = jax.random.normal(key, (N, 6), jnp.float32)
    X3 = jax.random.normal(key, (N, 3), jnp.float32)

    print(f"N={N}, n_img={n_img}, n_tie={n_tie}")
    for name, fn, args in [
        ("gather img (1000,6)->(N,6)", jax.jit(lambda t, i: t[i]),
         (Vimg, img_ids)),
        ("gather tie (100k,3)->(N,3) sorted", jax.jit(lambda t, i: t[i]),
         (Vtie, tie)),
        ("segsum tie (N,3)->(100k,3)",
         jax.jit(lambda x: sorted_segment_sum(x, lay_tie)), (X3,)),
        ("segsum tie (N,6)->(100k,6)",
         jax.jit(lambda x: sorted_segment_sum(x, lay_tie)), (X6,)),
        ("permute (N,6)[perm]", jax.jit(lambda x, p: x[p]),
         (X6, jnp.asarray(rng.permutation(N).astype(np.int32)))),
        ("elementwise 3 streams (N,6)",
         jax.jit(lambda a, b: a * b + a), (X6, X6)),
        ("read-only sum (N,6)", jax.jit(lambda x: jnp.sum(x)), (X6,)),
        ("read-only sum (N,128)", jax.jit(lambda x: jnp.sum(x)),
         (jax.random.normal(key, (N, 128), jnp.float32),)),
        ("scatter-add img (N,6)->(1000,6)",
         jax.jit(lambda x, i: jnp.zeros((n_img, 6), x.dtype).at[i].add(x)),
         (X6, img_ids)),
        ("onehot-matmul img-reduce bf16",
         jax.jit(lambda x, i: jax.lax.dot_general(
             (jax.nn.one_hot(i, n_img, dtype=jnp.bfloat16)).T,
             x.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
             preferred_element_type=jnp.float32)),
         (X6, img_ids)),
    ]:
        try:
            t = timeit(fn, *args)
            print(f"{name:38s} {t*1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:38s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
