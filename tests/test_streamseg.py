"""Streaming segmented-reduce Pallas kernel (ops/attic/streamseg.py) vs numpy,
run in interpret mode so the fast CPU lane covers the kernel's indexing
and masking logic (the real-chip A/B lives in bench_streamseg.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fish_eye_bundle_adjustment_tpu.ops.attic.streamseg import (  # noqa: E402
    GroupedSegPlan,
    sorted_segment_sum_streaming,
)


@pytest.mark.parametrize("n,n_seg,d,m", [
    (4096, 300, 8, 128),
    (5000, 700, 5, 64),   # non-128 D, partial last group
    (2000, 2000, 3, 128),  # all length-1 segments
])
def test_streaming_matches_numpy(n, n_seg, d, m):
    rng = np.random.default_rng(n + n_seg)
    ids = np.sort(rng.integers(0, n_seg, n)).astype(np.int32)
    starts = np.searchsorted(ids, np.arange(n_seg + 1)).astype(np.int32)
    plan = GroupedSegPlan.build(starts[:-1], starts[1:], M=m)
    X = rng.standard_normal((n, d)).astype(np.float32)
    ref = np.zeros((n_seg, d), np.float32)
    np.add.at(ref, ids, X)
    got = np.asarray(
        sorted_segment_sum_streaming(jnp.asarray(X), plan, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_empty_segments_are_zero():
    # segments with beg == end (no rows) must come out exactly zero
    begs = np.array([0, 3, 3, 7], np.int32)
    ends = np.array([3, 3, 7, 9], np.int32)
    plan = GroupedSegPlan.build(begs, ends, M=128)
    X = np.ones((9, 4), np.float32)
    got = np.asarray(
        sorted_segment_sum_streaming(jnp.asarray(X), plan, interpret=True)
    )
    assert got.shape == (4, 4)
    np.testing.assert_array_equal(got[1], np.zeros(4))
    np.testing.assert_array_equal(got[0], np.full(4, 3.0))
    np.testing.assert_array_equal(got[2], np.full(4, 4.0))
    np.testing.assert_array_equal(got[3], np.full(4, 2.0))
