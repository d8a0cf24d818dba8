"""Pallas probes: per-row dynamic gather/scatter against a VMEM-resident
table — the primitive that decides the fused S-matvec kernel design.

If a (n_img, 8) f32 table living in VMEM can be row-gathered (and
row-scatter-accumulated) at >= ~1 row/cycle from inside a kernel, the
whole correction matvec fuses into two streaming passes over the
tie-sorted observation stream and never materializes a padded (N, d)
intermediate in HBM.

Usage: python bench_pallas_gather.py [ABCDEF]
(argument selects which probes run; per-row-loop probes C/E are slow)
"""

import functools
import sys
import time

import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
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


def main(sel='ABDF'):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1_048_576
    n_img = 1024
    CHUNK = 4096
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.integers(0, n_img, N).astype(np.int32))
    V = jax.random.normal(key, (n_img, 8), jnp.float32)
    ref = np.asarray(V)[np.asarray(img)]

    # ---- A: jnp.take inside the kernel --------------------------------
    def take_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[:], axis=0)

    if "A" not in sel:
        print("A skipped")
    else:
      try:
          f = jax.jit(lambda idx, tab: pl.pallas_call(
              take_kernel,
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
          np.testing.assert_allclose(out, ref)
          print(f"A jnp.take gather:        {timeit(f, img, V)*1e3:7.3f} ms")
      except Exception as e:
          print(f"A jnp.take gather:        FAILED {type(e).__name__}: {str(e)[:160]}")

    # ---- B: advanced-indexing gather -----------------------------------
    def adv_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:, :] = tab_ref[idx_ref[:], :]

    if "B" not in sel:
        print("B skipped")
    else:
      try:
          f = jax.jit(lambda idx, tab: pl.pallas_call(
              adv_kernel,
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
          np.testing.assert_allclose(out, ref)
          print(f"B adv-index gather:       {timeit(f, img, V)*1e3:7.3f} ms")
      except Exception as e:
          print(f"B adv-index gather:       FAILED {type(e).__name__}: {str(e)[:160]}")

    # ---- C: fori_loop per-row dynamic_slice ----------------------------
    def loop_kernel(idx_ref, tab_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = tab_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, CHUNK, body, 0)

    if "C" not in sel:
        print("C skipped")
    else:
      try:
          f = jax.jit(lambda idx, tab: pl.pallas_call(
              loop_kernel,
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
          np.testing.assert_allclose(out, ref)
          print(f"C per-row loop gather:    {timeit(f, img, V, reps=3)*1e3:7.3f} ms")
      except Exception as e:
          print(f"C per-row loop gather:    FAILED {type(e).__name__}: {str(e)[:160]}")

    # ---- D: gather fused with contraction (the real kernel A shape) ----
    # stream M (CHUNK, 24) + idx; out (CHUNK, 4): t = sum_e M[., e, p] * vg[., e]
    M = jax.random.normal(key, (N, 24), jnp.float32)  # [e*4 + p] layout, e<6,p<3

    def fused_kernel(idx_ref, m_ref, tab_ref, out_ref):
        vg = tab_ref[idx_ref[:], :]  # (CHUNK, 8)
        m = m_ref[:, :]
        acc = jnp.zeros((CHUNK, 4), jnp.float32)
        for e in range(6):
            acc = acc + m[:, e * 4 : e * 4 + 4] * vg[:, e : e + 1]
        out_ref[:, :] = acc

    if "D" not in sel:
        print("D skipped")
    else:
      try:
          f = jax.jit(lambda idx, m, tab: pl.pallas_call(
              fused_kernel,
              out_shape=jax.ShapeDtypeStruct((N, 4), jnp.float32),
              grid=(N // CHUNK,),
              in_specs=[
                  pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, 24), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((n_img, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
              ],
              out_specs=pl.BlockSpec((CHUNK, 4), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
          )(idx, m, tab))
          out = np.asarray(f(img, M, V))
          # reference
          m_np = np.asarray(M).reshape(N, 6, 4)
          want = np.einsum("nep,ne->np", m_np, ref[:, :6])
          np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
          print(f"D fused gather+contract:  {timeit(f, img, M, V)*1e3:7.3f} ms")
      except Exception as e:
          print(f"D fused gather+contract:  FAILED {type(e).__name__}: {str(e)[:160]}")

    # ---- E: scatter-accumulate into a VMEM table ------------------------
    # acc[idx[i], :] += vals[i, :]; table persists across grid steps in
    # scratch, written out at the last step.
    vals = jax.random.normal(key, (N, 8), jnp.float32)

    def scat_kernel(idx_ref, val_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:, :] = jnp.zeros((n_img, 8), jnp.float32)

        def body(i, _):
            j = idx_ref[i]
            acc_ref[j, :] = acc_ref[j, :] + val_ref[i, :]
            return 0
        jax.lax.fori_loop(0, CHUNK, body, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[:, :] = acc_ref[:, :]

    if "E" not in sel:
        print("E skipped")
    else:
      try:
          f = jax.jit(lambda idx, v: pl.pallas_call(
              scat_kernel,
              out_shape=jax.ShapeDtypeStruct((n_img, 8), jnp.float32),
              grid=(N // CHUNK,),
              in_specs=[
                  pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
              ],
              out_specs=pl.BlockSpec((n_img, 8), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
              scratch_shapes=[pltpu.VMEM((n_img, 8), jnp.float32)],
          )(idx, v))
          out = np.asarray(f(img, vals))
          want = np.zeros((n_img, 8), np.float32)
          np.add.at(want, np.asarray(img), np.asarray(vals))
          np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
          print(f"E per-row scatter-acc:    {timeit(f, img, vals, reps=3)*1e3:7.3f} ms")
      except Exception as e:
          print(f"E per-row scatter-acc:    FAILED {type(e).__name__}: {str(e)[:160]}")

    # ---- F: one-hot MXU scatter (bf16 one-hot, f32 accumulate) ----------
    def onehot_scat_kernel(idx_ref, val_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:, :] = jnp.zeros((n_img, 8), jnp.float32)

        ids = idx_ref[:]  # (CHUNK,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, n_img), 1)
        oh = (cols == ids[:, None]).astype(jnp.bfloat16)  # (CHUNK, n_img)
        acc_ref[:, :] = acc_ref[:, :] + jax.lax.dot_general(
            oh, val_ref[:, :].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[:, :] = acc_ref[:, :]

    if "F" not in sel:
        print("F skipped")
    else:
      try:
          f = jax.jit(lambda idx, v: pl.pallas_call(
              onehot_scat_kernel,
              out_shape=jax.ShapeDtypeStruct((n_img, 8), jnp.float32),
              grid=(N // CHUNK,),
              in_specs=[
                  pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
              ],
              out_specs=pl.BlockSpec((n_img, 8), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
              scratch_shapes=[pltpu.VMEM((n_img, 8), jnp.float32)],
          )(idx, v))
          out = np.asarray(f(img, vals))
          want = np.zeros((n_img, 8), np.float32)
          np.add.at(want, np.asarray(img), np.asarray(vals))
          err = np.abs(out - want).max() / max(np.abs(want).max(), 1)
          print(f"F one-hot MXU scatter:    {timeit(f, img, vals, reps=5)*1e3:7.3f} ms"
                f"  (rel err {err:.2e})")
      except Exception as e:
          print(f"F one-hot MXU scatter:    FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ABDF")
