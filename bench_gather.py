"""Micro-benchmarks of the candidate img-gather / permute / reduce
strategies on the real chip — the data-movement primitives that bound the
S matvec (see BASELINE.md roofline).  Drives the round-3 kernel design:
every variant is measured before anything is built on it.

Usage: python bench_gather.py [--n 1048576] [--n-img 1000] [--n-tie 100000]
"""

import argparse
import time

import numpy as np


def timeit(fn, reps=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--n-img", type=int, default=1000)
    ap.add_argument("--n-tie", type=int, default=100_000)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, n_img, n_tie = args.n, args.n_img, args.n_tie
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    img = jnp.asarray(rng.integers(0, n_img, N).astype(np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    V8 = jax.random.normal(key, (n_img, 8), jnp.float32)
    A4 = jax.random.normal(key, (N, 4), jnp.float32)
    A8 = jax.random.normal(key, (N, 8), jnp.float32)

    print(f"# N={N}, n_img={n_img}, n_tie={n_tie}")

    # 1. XLA random row gather from a small table
    f = jax.jit(lambda: V8[img])
    print(f"xla gather (N,8) by img:        {timeit(f)*1e3:7.3f} ms")

    # 2. XLA permute (N,4) and (N,8)
    f = jax.jit(lambda: A4[perm])
    print(f"xla permute (N,4):              {timeit(f)*1e3:7.3f} ms")
    f = jax.jit(lambda: A8[perm])
    print(f"xla permute (N,8):              {timeit(f)*1e3:7.3f} ms")

    # 3. XLA one-hot matmul gather, f32 and bf16
    def onehot_gather(dtype):
        def go():
            def body(c, idx):
                oh = (idx[:, None] == jnp.arange(n_img)[None, :]).astype(dtype)
                return c, jnp.dot(oh, V8.astype(dtype),
                                  preferred_element_type=jnp.float32)
            _, out = jax.lax.scan(body, 0, img.reshape(-1, 8192))
            return out
        return jax.jit(go)

    f = onehot_gather(jnp.float32)
    print(f"xla one-hot gather f32:         {timeit(f, reps=5)*1e3:7.3f} ms")
    f = onehot_gather(jnp.bfloat16)
    print(f"xla one-hot gather bf16:        {timeit(f, reps=5)*1e3:7.3f} ms")

    # 4. Pallas: gather rows from a VMEM-resident table with jnp.take
    CHUNK = 2048

    def take_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    try:
        f = jax.jit(lambda: pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
            grid=(N // CHUNK,),
            in_specs=[
                pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_img, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(img, V8))
        t = timeit(f, reps=10)
        # correctness
        np.testing.assert_allclose(np.asarray(f()), np.asarray(V8[img]))
        print(f"pallas vmem take (N,8):         {t*1e3:7.3f} ms")
    except Exception as e:
        print(f"pallas vmem take (N,8):         FAILED {type(e).__name__}: {str(e)[:120]}")

    # 5. Pallas: permute (N,8) where the SOURCE fits in VMEM (16MB gate)
    if N * 8 * 4 <= 12 * 2**20:
        def perm_kernel(idx_ref, src_ref, out_ref):
            out_ref[:] = jnp.take(src_ref[:], idx_ref[:], axis=0)

        try:
            f = jax.jit(lambda: pl.pallas_call(
                perm_kernel,
                out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
                grid=(N // CHUNK,),
                in_specs=[
                    pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((CHUNK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(perm, A8))
            t = timeit(f, reps=10)
            np.testing.assert_allclose(np.asarray(f()), np.asarray(A8[perm]))
            print(f"pallas vmem permute (N,8):      {t*1e3:7.3f} ms")
        except Exception as e:
            print(f"pallas vmem permute (N,8):      FAILED {type(e).__name__}: {str(e)[:120]}")
    else:
        print("pallas vmem permute: skipped (source exceeds VMEM)")

    # 6. capacity-layout tie reduce: (T, K, 8) -> (T, 8) sum over K
    K = 16
    T = N // K
    C = jax.random.normal(key, (T, K, 8), jnp.float32)
    f = jax.jit(lambda: jnp.sum(C, axis=1))
    print(f"capacity sum (T,{K},8)->(T,8):  {timeit(f)*1e3:7.3f} ms")

    # 7. capacity-layout tie broadcast: (T, 8) -> (T, K, 8) multiply
    u = jax.random.normal(key, (T, 8), jnp.float32)
    f = jax.jit(lambda: C * u[:, None, :])
    print(f"capacity bcast (T,8)*(T,{K},8): {timeit(f)*1e3:7.3f} ms")

    # 8. img-capacity reduce: (I, Ki, 8) -> (I, 8)
    Ki = N // n_img
    D = jax.random.normal(key, (n_img, Ki, 8), jnp.float32)
    f = jax.jit(lambda: jnp.sum(D, axis=1))
    print(f"img capacity sum (I,{Ki},8):   {timeit(f)*1e3:7.3f} ms")

    # 9. sorted-gather (segment broadcast): indices sorted ascending
    img_sorted = jnp.sort(img)
    f = jax.jit(lambda: V8[img_sorted])
    print(f"xla gather sorted idx (N,8):    {timeit(f)*1e3:7.3f} ms")

    # 10. scatter-add baseline (N,8) -> (n_tie,8) for reference
    tie = jnp.asarray(np.sort(rng.integers(0, n_tie, N)).astype(np.int32))
    f = jax.jit(lambda: jnp.zeros((n_tie, 8), jnp.float32).at[tie].add(
        A8, indices_are_sorted=True))
    print(f"xla scatter-add sorted (N,8):   {timeit(f, reps=5)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
