"""Segment op tests vs dense numpy oracles (reference delegates these to
torch-scatter/PyG CUDA kernels; here the oracle is a dense masked softmax)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.ops.segment import (
    segment_sum, segment_mean, segment_max, segment_softmax)


@pytest.fixture
def seg_problem(rng):
    n, s, f = 64, 9, 5
    data = rng.normal(size=(n, f)).astype(np.float32)
    ids = rng.integers(0, s, size=n).astype(np.int32)
    mask = rng.random(n) > 0.2
    return data, ids, mask, s


def test_segment_sum_oracle(seg_problem):
    data, ids, mask, s = seg_problem
    out = segment_sum(jnp.asarray(data), jnp.asarray(ids), s,
                      mask=jnp.asarray(mask))
    expect = np.zeros((s, data.shape[1]), np.float32)
    for i in range(len(data)):
        if mask[i]:
            expect[ids[i]] += data[i]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_segment_mean_oracle(seg_problem):
    data, ids, mask, s = seg_problem
    out = segment_mean(jnp.asarray(data), jnp.asarray(ids), s,
                       mask=jnp.asarray(mask))
    for seg in range(s):
        sel = (ids == seg) & mask
        if sel.sum():
            np.testing.assert_allclose(
                np.asarray(out[seg]), data[sel].mean(0), rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(out[seg]), 0.0)


def test_segment_max_oracle(seg_problem):
    data, ids, mask, s = seg_problem
    out = segment_max(jnp.asarray(data), jnp.asarray(ids), s,
                      mask=jnp.asarray(mask))
    for seg in range(s):
        sel = (ids == seg) & mask
        if sel.sum():
            np.testing.assert_allclose(np.asarray(out[seg]), data[sel].max(0),
                                       rtol=1e-6)


def test_segment_softmax_oracle(seg_problem):
    data, ids, mask, s = seg_problem
    out = np.asarray(segment_softmax(
        jnp.asarray(data), jnp.asarray(ids), s, mask=jnp.asarray(mask)))
    for seg in range(s):
        sel = (ids == seg) & mask
        if sel.sum():
            e = np.exp(data[sel] - data[sel].max(0))
            np.testing.assert_allclose(out[sel], e / e.sum(0),
                                       rtol=1e-5, atol=1e-6)
    # masked rows are exactly zero
    assert (out[~mask] == 0).all()


def test_segment_softmax_sums_to_one(seg_problem):
    data, ids, mask, s = seg_problem
    out = segment_softmax(jnp.asarray(data), jnp.asarray(ids), s,
                          mask=jnp.asarray(mask))
    sums = np.asarray(segment_sum(out, jnp.asarray(ids), s,
                                  mask=jnp.asarray(mask)))
    for seg in range(s):
        if ((ids == seg) & mask).sum():
            np.testing.assert_allclose(sums[seg], 1.0, rtol=1e-5)


def test_segment_softmax_empty_segment_no_nan():
    scores = jnp.array([[1.0], [2.0]])
    ids = jnp.array([0, 0], dtype=jnp.int32)
    out = segment_softmax(scores, ids, num_segments=3)
    assert not np.isnan(np.asarray(out)).any()


def test_segment_softmax_jit_and_grad(seg_problem):
    data, ids, mask, s = seg_problem

    @jax.jit
    def f(x):
        return segment_softmax(x, jnp.asarray(ids), s,
                               mask=jnp.asarray(mask)).sum()

    g = jax.grad(f)(jnp.asarray(data))
    assert not np.isnan(np.asarray(g)).any()
