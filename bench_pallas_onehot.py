"""Pallas one-hot MXU probes: gather / scatter / sorted-window segsum
without per-row dynamic indexing (unsupported on TPU) and without a
serialized scratch accumulator (probe F of bench_pallas_gather: 7.7 ms).

The idea: express every per-row redistribution as a small matmul with an
on-the-fly one-hot built from broadcasted_iota comparisons:

  gather   out = OH @ table         OH (CHUNK, n_tab) built per chunk
  scatter  partial_c = OH' @ vals   per-chunk partials, dense combine after
  segsum   (sorted ids) OH over a WINDOW of segments touching the chunk

Targets (1M rows, (·,8) values): beat XLA's ~2.5 ms gather / ~2.5 ms
sorted segsum / ~11 ms scatter.

Usage: python bench_pallas_onehot.py [probes]
"""

import sys
import time

import numpy as np


def timeit(fn, *args, reps=20, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(sel="GSWP"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1_048_576
    n_img = 1024
    CHUNK = 2048
    W = 256  # tie window per chunk (sorted stream; span/chunk ~207 at 2048)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.integers(0, n_img, N).astype(np.int32))
    V = jax.random.normal(key, (n_img, 8), jnp.float32)
    ref_gather = np.asarray(V)[np.asarray(img)]

    # ---- G: one-hot MXU gather, f32-HIGHEST --------------------------------
    if "G" in sel:
        def gather_kernel(idx_ref, tab_ref, out_ref):
            ids = idx_ref[:]  # (CHUNK,)
            cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, n_img), 1)
            oh = (cols == ids[:, None]).astype(jnp.float32)
            out_ref[:, :] = jax.lax.dot_general(
                oh, tab_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        try:
            f = jax.jit(lambda idx, tab: pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
                grid=(N // CHUNK,),
                in_specs=[
                    pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_img, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((CHUNK, 8), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(idx, tab))
            out = np.asarray(f(img, V))
            err = np.abs(out - ref_gather).max()
            print(f"G onehot-MXU gather (N,8):   {timeit(f, img, V)*1e3:7.3f} ms"
                  f"  (max err {err:.2e})")
        except Exception as e:
            print(f"G onehot-MXU gather:   FAILED {type(e).__name__}: {str(e)[:200]}")

    # ---- S: one-hot MXU scatter via per-chunk partials ---------------------
    # out[j] = sum_i [img[i]==j] vals[i]; kernel emits per-chunk (n_img, 8)
    # partials; dense sum over the chunk axis finishes it.
    if "S" in sel:
        vals = jax.random.normal(key, (N, 8), jnp.float32)
        want = np.zeros((n_img, 8), np.float32)
        np.add.at(want, np.asarray(img), np.asarray(vals))

        def scatter_kernel(idx_ref, val_ref, out_ref):
            ids = idx_ref[:]
            cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, n_img), 1)
            oh = (cols == ids[:, None]).astype(jnp.float32)
            out_ref[0, :, :] = jax.lax.dot_general(
                oh, val_ref[:, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        try:
            def scat(idx, v):
                partials = pl.pallas_call(
                    scatter_kernel,
                    out_shape=jax.ShapeDtypeStruct((N // CHUNK, n_img, 8),
                                                   jnp.float32),
                    grid=(N // CHUNK,),
                    in_specs=[
                        pl.BlockSpec((CHUNK,), lambda i: (i,),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((CHUNK, 8), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, n_img, 8), lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(idx, v)
                return jnp.sum(partials, axis=0)

            f = jax.jit(scat)
            out = np.asarray(f(img, vals))
            err = np.abs(out - want).max() / max(np.abs(want).max(), 1)
            print(f"S onehot-MXU scatter (N,8):  {timeit(f, img, vals)*1e3:7.3f} ms"
                  f"  (rel err {err:.2e})")
        except Exception as e:
            print(f"S onehot-MXU scatter:  FAILED {type(e).__name__}: {str(e)[:200]}")

    # ---- W: windowed one-hot segsum over a SORTED id stream ---------------
    # ids sorted; each chunk touches segments [base_c, base_c + W).
    # kernel: OH (CHUNK, W) with col j <-> segment base_c + j;
    # partial_c = OH' @ vals -> (W, 8); combine: scatter-add n_chunks*W rows
    # (tiny) into (n_seg, 8) on XLA.
    if "W" in sel:
        n_tie = 100_000
        tie_sorted_np = np.sort(rng.integers(0, n_tie, N).astype(np.int32))
        tie_sorted = jnp.asarray(tie_sorted_np)
        valsW = jax.random.normal(key, (N, 8), jnp.float32)
        wantW = np.zeros((n_tie, 8), np.float32)
        np.add.at(wantW, tie_sorted_np, np.asarray(valsW))
        n_chunks = N // CHUNK
        base_np = tie_sorted_np[::CHUNK].astype(np.int32)  # first id per chunk
        span = (tie_sorted_np[CHUNK - 1 :: CHUNK].astype(np.int64)
                - base_np.astype(np.int64))
        print(f"  (W probe: max ids/chunk span = {span.max()+1}, W = {W})")
        base = jnp.asarray(base_np)

        def wseg_kernel(base_ref, idx_ref, val_ref, out_ref):
            b = base_ref[pl.program_id(0)]
            ids = idx_ref[:] - b  # local segment ids, in [0, W) if W covers
            cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W), 1)
            oh = (cols == ids[:, None]).astype(jnp.float32)
            out_ref[0, :, :] = jax.lax.dot_general(
                oh, val_ref[:, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        try:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((CHUNK,), lambda i, b: (i,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((CHUNK, 8), lambda i, b: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, W, 8), lambda i, b: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )

            def wseg(base, ids, v):
                partials = pl.pallas_call(
                    wseg_kernel,
                    out_shape=jax.ShapeDtypeStruct((n_chunks, W, 8), jnp.float32),
                    grid_spec=grid_spec,
                )(base, ids, v)
                # combine: row r of chunk c belongs to segment base[c] + r
                seg = (base[:, None] + jnp.arange(W)[None, :]).reshape(-1)
                return jnp.zeros((n_tie + W, 8), jnp.float32).at[seg].add(
                    partials.reshape(-1, 8), indices_are_sorted=False
                )[:n_tie]

            f = jax.jit(wseg)
            out = np.asarray(f(base, tie_sorted, valsW))
            err = np.abs(out - wantW).max() / max(np.abs(wantW).max(), 1)
            print(f"W windowed segsum (N,8):     {timeit(f, base, tie_sorted, valsW)*1e3:7.3f} ms"
                  f"  (rel err {err:.2e})")
        except Exception as e:
            print(f"W windowed segsum:     FAILED {type(e).__name__}: {str(e)[:200]}")

    # ---- P: windowed one-hot BROADCAST (segment gather, sorted ids) -------
    # out[i] = table[ids[i]] for sorted ids: OH (CHUNK, W) @ table[base:base+W]
    # table rows sliced per chunk via a data-dependent index_map (scalar
    # prefetch). W must be a multiple of the block row granularity.
    if "P" in sel:
        n_tie = 100_000
        tie_sorted_np = np.sort(rng.integers(0, n_tie, N).astype(np.int32))
        tie_sorted = jnp.asarray(tie_sorted_np)
        # table padded so the last aligned 2-block window exists
        T = jax.random.normal(key, (n_tie + 2 * W, 8), jnp.float32)
        want = np.asarray(T)[tie_sorted_np]
        n_chunks = N // CHUNK
        # aligned W-block window start per chunk; ids span < W guarantees the
        # two stacked blocks [blk*W, blk*W + 2W) cover the chunk's segments
        base_np = tie_sorted_np[::CHUNK].astype(np.int32)
        blk_np = (base_np // W).astype(np.int32)
        blk = jnp.asarray(blk_np)

        def bcast_kernel(blk_ref, idx_ref, lo_ref, hi_ref, out_ref):
            b = blk_ref[pl.program_id(0)] * W
            ids = idx_ref[:] - b  # in [0, 2W)
            cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, W), 1)
            oh_lo = (cols == ids[:, None]).astype(jnp.float32)
            oh_hi = (cols == (ids - W)[:, None]).astype(jnp.float32)
            out_ref[:, :] = jax.lax.dot_general(
                oh_lo, lo_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                oh_hi, hi_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        try:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((CHUNK,), lambda i, blk: (i,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((W, 8), lambda i, blk: (blk[i], 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((W, 8), lambda i, blk: (blk[i] + 1, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((CHUNK, 8), lambda i, blk: (i, 0),
                                       memory_space=pltpu.VMEM),
            )

            def bcast(blk, ids, tab):
                return pl.pallas_call(
                    bcast_kernel,
                    out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
                    grid_spec=grid_spec,
                )(blk, ids, tab, tab)

            f = jax.jit(bcast)
            out = np.asarray(f(blk, tie_sorted, T))
            err = np.abs(out - want).max()
            print(f"P windowed bcast (N,8):      {timeit(f, blk, tie_sorted, T)*1e3:7.3f} ms"
                  f"  (max err {err:.2e})")
        except Exception as e:
            print(f"P windowed bcast:      FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "GSWP")
