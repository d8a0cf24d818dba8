"""Layout experiments: quantify the (N, D<128) lane-padding tax on the
ops that dominate the explicit-S pair reduction, and test transposed
(D, N) alternatives.  Decides the round-3 kernel/layout strategy."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    float(jnp.sum(leaves[0]).astype(jnp.float32))


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    P = 5_000_000
    Nt = 1_000_000
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    idx = jnp.asarray(np.sort(rng.integers(0, Nt, P)).astype(np.int32))
    ridx = jnp.asarray(rng.integers(0, Nt, P).astype(np.int32))
    T18 = jax.random.normal(key, (Nt, 18), jnp.float32)
    T18t = T18.T.copy()
    X36 = jax.random.normal(key, (P, 36), jnp.float32)
    X36t = X36.T.copy()
    X128 = jax.random.normal(key, (P, 128), jnp.float32)

    for name, fn, args in [
        ("cumsum (P,36) ax0", jax.jit(lambda x: jnp.cumsum(x, 0)), (X36,)),
        ("cumsum (P,128) ax0", jax.jit(lambda x: jnp.cumsum(x, 0)), (X128,)),
        ("cumsum (36,P) ax1", jax.jit(lambda x: jnp.cumsum(x, 1)), (X36t,)),
        ("chunked cumsum (P//4096,4096,36) ax1",
         jax.jit(lambda x: jnp.cumsum(x.reshape(-1, 4096, 36), 1)), (X36,)),
        ("gather rows (1M,18)[ridx] P rand", jax.jit(lambda t, i: t[i]),
         (T18, ridx)),
        ("gather rows (1M,18)[idx] P sorted", jax.jit(lambda t, i: t[i]),
         (T18, idx)),
        ("gather cols (18,1M)[:,ridx]", jax.jit(lambda t, i: t[:, i]),
         (T18t, ridx)),
        ("copy (P,36)", jax.jit(lambda x: x * 1.0000001), (X36,)),
        ("copy (36,P)", jax.jit(lambda x: x * 1.0000001), (X36t,)),
        ("copy (P,128)", jax.jit(lambda x: x * 1.0000001), (X128,)),
    ]:
        try:
            t = timeit(fn, *args)
            print(f"{name:42s} {t*1e3:9.2f} ms")
        except Exception as e:
            print(f"{name:42s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
