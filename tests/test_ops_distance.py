"""Unit tests for distance / kNN ops against numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocopci_tpu import ops


def _np_sqdist(a, b):
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


def test_square_distance_matches_oracle(rng):
    a = rng.normal(size=(2, 17, 3)).astype(np.float32)
    b = rng.normal(size=(2, 29, 3)).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
    # the matmul formulation trades a little cancellation error for MXU speed
    np.testing.assert_allclose(got, _np_sqdist(a, b), rtol=2e-3, atol=1e-3)


def test_cosine_distance_matches_oracle(rng):
    a = rng.normal(size=(2, 9, 8)).astype(np.float32)
    b = rng.normal(size=(2, 13, 8)).astype(np.float32)
    an = a / np.sqrt((a**2).sum(-1, keepdims=True) + 1e-8)
    bn = b / np.sqrt((b**2).sum(-1, keepdims=True) + 1e-8)
    want = 1.0 - np.einsum("bnc,bmc->bnm", an, bn)
    got = np.asarray(ops.cosine_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_knn_returns_k_smallest_set(rng):
    ref = rng.normal(size=(2, 40, 3)).astype(np.float32)
    q = rng.normal(size=(2, 11, 3)).astype(np.float32)
    k = 5
    idx = np.asarray(ops.knn(k, jnp.asarray(ref), jnp.asarray(q)))
    d = _np_sqdist(q, ref)
    want = np.argsort(d, axis=-1)[..., :k]
    # compare as sets per row (reference topk is unsorted)
    assert idx.shape == (2, 11, k)
    for b in range(2):
        for n in range(11):
            assert set(idx[b, n]) == set(want[b, n])


def test_knn_cosine_set(rng):
    ref = rng.normal(size=(1, 30, 16)).astype(np.float32)
    q = rng.normal(size=(1, 7, 16)).astype(np.float32)
    idx = np.asarray(ops.knn_cosine(4, jnp.asarray(ref), jnp.asarray(q)))
    rn = ref / np.sqrt((ref**2).sum(-1, keepdims=True) + 1e-8)
    qn = q / np.sqrt((q**2).sum(-1, keepdims=True) + 1e-8)
    d = 1 - np.einsum("bnc,bmc->bnm", qn, rn)
    want = np.argsort(d, axis=-1)[..., :4]
    for n in range(7):
        assert set(idx[0, n]) == set(want[0, n])


def test_gather_and_group(rng):
    pts = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 6)).astype(np.int32)
    got = np.asarray(ops.gather(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b, idx[b]])

    gidx = rng.integers(0, 10, size=(2, 6, 3)).astype(np.int32)
    got = np.asarray(ops.group(jnp.asarray(pts), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b][gidx[b]])


def test_gather_grad_is_scatter_add(rng):
    pts = jnp.asarray(rng.normal(size=(1, 5, 2)).astype(np.float32))
    idx = jnp.asarray(np.array([[0, 0, 3]], dtype=np.int32))

    def f(p):
        return jnp.sum(ops.gather(p, idx) * jnp.arange(1.0, 7.0).reshape(1, 3, 2))

    g = np.asarray(jax.grad(f)(pts))[0]
    want = np.zeros((5, 2), np.float32)
    want[0] = [1, 2]
    want[0] += [3, 4]
    want[3] = [5, 6]
    np.testing.assert_allclose(g, want, rtol=1e-6)


def test_ball_query_semantics(rng):
    ref = jnp.asarray(
        np.array([[[0, 0, 0], [0.1, 0, 0], [5, 5, 5], [0, 0.1, 0]]], np.float32)
    )
    q = jnp.asarray(np.array([[[0, 0, 0]]], np.float32))
    idx = np.asarray(ops.ball_query(3, 0.5, ref, q))
    # in-radius points are 0,1,3; first-k by index order
    np.testing.assert_array_equal(idx[0, 0], [0, 1, 3])
    # pad-with-first-hit: only point 0 is within radius 0.05
    idx = np.asarray(ops.ball_query(3, 0.05, ref, q))
    np.testing.assert_array_equal(idx[0, 0], [0, 0, 0])


def test_three_nn_matches_oracle(rng):
    """Standalone (dists, idx) 3-NN API vs a numpy oracle (ref
    interpolate_gpu.cu:9-68 semantics: l2 (sqrt) distances, int32 indices)."""
    from mocopci_tpu import ops

    unknown = rng.normal(size=(2, 20, 3)).astype(np.float32)
    known = rng.normal(size=(2, 15, 3)).astype(np.float32)
    dists, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    assert dists.shape == (2, 20, 3) and idx.shape == (2, 20, 3)
    assert idx.dtype == jnp.int32
    d_full = np.sqrt(
        np.sum((unknown[:, :, None] - known[:, None]) ** 2, axis=-1)
    )
    want = np.sort(d_full, axis=-1)[..., :3]
    np.testing.assert_allclose(np.sort(np.asarray(dists), -1), want,
                               rtol=1e-4, atol=1e-5)
    got_d = np.take_along_axis(d_full, np.asarray(idx), -1)
    np.testing.assert_allclose(np.sort(got_d, -1), want, rtol=1e-4, atol=1e-5)
