"""Micro-profile of the build_dense_S pair-reduction stages at bench scale.

Times each sub-op of the S_corr pair reduction as its own jitted unit:
gather A/B, flat 6x3@3x6 product, sorted segment sum into the block
table, mirror + densify.  Drives the round-3 kernel decision.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fish_eye_bundle_adjustment_tpu.ops.segment import (
    SegmentLayout,
    sorted_segment_sum,
)
from fish_eye_bundle_adjustment_tpu.solver.explicit import (
    _blocks_to_dense,
    _flat_abt,
    coupling_factors,
)
from fish_eye_bundle_adjustment_tpu.solver.schur import (
    ObsData,
    SchurKernel,
    SchurOptions,
    make_pair_plan,
)
from fish_eye_bundle_adjustment_tpu.synth import make_block
from fish_eye_bundle_adjustment_tpu.utils.layout import ParamLayout


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
    dtype = np.float32
    blk = make_block(
        n_img=1000, n_pts=100_000, model="fisheye", seed=2,
        settings_overrides={"inner_constraints": False}, control_frac=0.01,
    )
    problem = blk.problem
    layout = ParamLayout(problem)
    opts = SchurOptions(dtype=dtype, cg_maxiter=10, obs_order="tie")
    kernel = SchurKernel(layout, opts, obs_order="tie")
    order = ObsData.sort_order_by_tie(problem, layout)
    obs = ObsData.from_problem(
        problem, layout, dtype=dtype, order=order, with_plan=True
    )
    pairs = make_pair_plan(problem, layout, opts, order)
    P = pairs.n_pairs
    n_img = layout.n_img
    print(f"P = {P} pairs, n_img^2 = {n_img*n_img}")

    x0 = jnp.asarray(layout.initial().astype(dtype))
    q = x0 * jnp.asarray(layout.scale, dtype=dtype)
    fac = jax.jit(lambda q, obs: kernel.linearize(q, obs))(q, obs)
    Mt = jax.jit(lambda f: coupling_factors(f)[0])(fac)
    Mt = jax.device_put(np.asarray(Mt))

    gA = jax.jit(lambda Mt, p: Mt[p.pa])
    A = gA(Mt, pairs)
    print(f"gather A (P,18)      {timeit(gA, Mt, pairs)*1e3:9.2f} ms")
    gB = jax.jit(lambda Mt, p: Mt[p.pb])
    B = gB(Mt, pairs)
    print(f"gather B (P,18)      {timeit(gB, Mt, pairs)*1e3:9.2f} ms")

    pr = jax.jit(lambda A, B: _flat_abt(A, B, 6, 6, 3))
    prod = pr(A, B)
    print(f"flat abt -> (P,36)   {timeit(pr, A, B)*1e3:9.2f} ms")

    lay = SegmentLayout(begs=pairs.key_begs, ends=pairs.key_ends)
    ss = jax.jit(lambda prod: sorted_segment_sum(prod, lay))
    U = ss(prod)
    print(f"segsum -> (n^2,36)   {timeit(ss, prod)*1e3:9.2f} ms")

    fused = jax.jit(
        lambda Mt, p: sorted_segment_sum(
            _flat_abt(Mt[p.pa], Mt[p.pb], 6, 6, 3),
            SegmentLayout(begs=p.key_begs, ends=p.key_ends),
        )
    )
    fused(Mt, pairs)
    print(f"fused g+g+prod+ss    {timeit(fused, Mt, pairs)*1e3:9.2f} ms")

    def mirror_densify(U):
        Ut = jnp.transpose(
            U.reshape(n_img, n_img, 36), (1, 0, 2)
        ).reshape(n_img * n_img, 36)
        tr_cols = jnp.asarray([(f * 6 + e) for e in range(6) for f in range(6)])
        return _blocks_to_dense(U + Ut[:, tr_cols], n_img, 6)

    md = jax.jit(mirror_densify)
    md(U)
    print(f"mirror+densify       {timeit(md, U)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
