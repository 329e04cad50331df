"""Unit tests for the bidirectional 1-NN Chamfer kernel
(ops/pallas/chamfer_pair.py) in interpret mode, against numpy oracles.

Oracle semantics: per-query min squared distance into the other cloud (ref
``pytorch3d.loss.chamfer_distance`` as used by ``models/utils.py:36-45``);
gradients via the argmin subgradient.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocopci_tpu.ops.pallas.chamfer_pair import chamfer_pair


def _oracle(p1, p2):
    d = ((p1[:, :, None, :] - p2[:, None, :, :]) ** 2).sum(-1)  # (G,N,M)
    return d.min(axis=2), d.min(axis=1)


@pytest.mark.parametrize("n,m", [(64, 64), (128, 256)])
def test_forward_matches_oracle(n, m):
    r = np.random.default_rng(0)
    p1 = r.normal(size=(3, n, 3)).astype(np.float32) * 4.0
    p2 = r.normal(size=(3, m, 3)).astype(np.float32) * 4.0
    d12, d21 = chamfer_pair(jnp.asarray(p1), jnp.asarray(p2), True)
    o12, o21 = _oracle(p1, p2)
    # packed-key near-tie quantisation: values exact for the selected
    # neighbour, selection within ~2^-10 relative of the true min
    np.testing.assert_allclose(np.asarray(d12), o12, rtol=3e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d21), o21, rtol=3e-3, atol=1e-6)


def test_gradients_match_dense(ndim=64):
    r = np.random.default_rng(1)
    # well-separated points so argmin selection is unambiguous and the
    # subgradient is unique
    p1 = (r.permutation(ndim * 4)[: ndim * 3]).reshape(1, ndim, 3).astype(
        np.float32
    )
    p2 = p1 + 0.01 * r.normal(size=(1, ndim, 3)).astype(np.float32)
    j1, j2 = jnp.asarray(p1), jnp.asarray(p2)
    w12 = jnp.asarray(r.normal(size=(1, ndim)).astype(np.float32))
    w21 = jnp.asarray(r.normal(size=(1, ndim)).astype(np.float32))

    def f_kernel(a, b):
        d12, d21 = chamfer_pair(a, b, True)
        return jnp.sum(d12 * w12) + jnp.sum(d21 * w21)

    def f_dense(a, b):
        d = jnp.sum((a[:, :, None] - b[:, None]) ** 2, -1)
        return jnp.sum(jnp.min(d, 2) * w12) + jnp.sum(jnp.min(d, 1) * w21)

    gk = jax.grad(f_kernel, argnums=(0, 1))(j1, j2)
    gd = jax.grad(f_dense, argnums=(0, 1))(j1, j2)
    for a, b in zip(gk, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_chamfer_many_matches_individual():
    from mocopci_tpu import ops

    r = np.random.default_rng(2)
    pairs = [
        (
            jnp.asarray(r.normal(size=(2, 96, 3)).astype(np.float32)),
            jnp.asarray(r.normal(size=(2, 96, 3)).astype(np.float32)),
        )
        for _ in range(3)
    ]
    batched = np.asarray(ops.chamfer_many(pairs))
    singles = np.asarray(
        [float(ops.chamfer_distance(a, b)) for a, b in pairs]
    )
    np.testing.assert_allclose(batched, singles, rtol=1e-5)
