"""Fused point-transformer tail vs the XLA vector-attention chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocopci_tpu.ops.pallas.transformer_tail import transformer_tail

jax.config.update("jax_platforms", "cpu")


def _xla_chain(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2, K):
    G, P, C = rows.shape
    S = P // K
    D = q.shape[-1]
    r = rows.reshape(G, K, S, C)
    knn_xyz, k_g, v_g = r[..., :3], r[..., 3 : 3 + D], r[..., 3 + D :]
    rel = xq[:, None] - knn_xyz
    pos = jax.nn.relu(rel @ wd1 + bd1) @ wd2 + bd2
    gvec = q[:, None] - k_g + pos
    logit = (jax.nn.relu(gvec @ wg1 + bg1) @ wg2 + bg2) / jnp.sqrt(D)
    attn = jax.nn.softmax(logit, axis=1)         # over k, per channel
    return jnp.sum(attn * (v_g + pos), axis=1)


def _mk(rng, G, S, K, D):
    rows = jnp.asarray(rng.normal(size=(G, K * S, 3 + 2 * D)).astype(np.float32))
    xq = jnp.asarray(rng.normal(size=(G, S, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(G, S, D)).astype(np.float32))
    ws = []
    for ci, co in [(3, D), (D, D), (D, D), (D, D)]:
        ws.append(jnp.asarray((rng.normal(size=(ci, co)) * 0.2).astype(np.float32)))
        ws.append(jnp.asarray((rng.normal(size=(co,)) * 0.1).astype(np.float32)))
    return (rows, xq, q, *ws)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("G,S,K,D", [(2, 32, 4, 8), (1, 24, 3, 16)])
def test_transformer_tail_forward(rng, G, S, K, D):
    args = _mk(rng, G, S, K, D)
    got = transformer_tail(*args, K, True)
    want = _xla_chain(*args, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_transformer_tail_grads(rng):
    G, S, K, D = 2, 32, 4, 8
    args = _mk(rng, G, S, K, D)

    def lf(*a):
        return jnp.sum(jnp.cos(transformer_tail(*a, K, True)))

    def lx(*a):
        return jnp.sum(jnp.cos(_xla_chain(*a, K)))

    g1 = jax.grad(lf, argnums=tuple(range(11)))(*args)
    g2 = jax.grad(lx, argnums=tuple(range(11)))(*args)
    names = ["rows", "xq", "q", "wd1", "bd1", "wd2", "bd2",
             "wg1", "bg1", "wg2", "bg2"]
    for a, c, n in zip(g1, g2, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=1e-5, err_msg=n)
