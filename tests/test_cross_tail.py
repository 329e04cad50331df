"""Fused cross-tail kernel (ops/pallas/cross_tail.py) vs the XLA chain.

Forward must match exactly (same arithmetic, tolerance covers dot
reassociation); gradients must match the XLA autodiff INCLUDING the
duplicate-neighbour max-tie case — the kernel's first-claim tie routing is
gradient-identical to XLA's even split once duplicates are summed (module
docstring), which these tests check end-to-end through a gather.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocopci_tpu.ops.pallas.cross_tail import cross_tail

jax.config.update("jax_platforms", "cpu")


def _xla_chain(rows, base, w, b, K):
    G, P, C = rows.shape
    S = P // K
    x = rows.reshape(G, K, S, C) + base[:, None]
    x = jnp.where(x >= 0, x, 0.1 * x)
    h = x @ w + b
    h = jnp.where(h >= 0, h, 0.1 * h)
    return jnp.max(h, axis=1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("G,S,K,C,C2", [(2, 64, 4, 8, 16), (1, 48, 3, 16, 8)])
def test_cross_tail_forward_matches_xla(rng, G, S, K, C, C2):
    rows = jnp.asarray(rng.normal(size=(G, K * S, C)).astype(np.float32))
    base = jnp.asarray(rng.normal(size=(G, S, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(C2,)).astype(np.float32) * 0.1)
    got = cross_tail(rows, base, w, b, K, True)
    want = _xla_chain(rows, base, w, b, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_cross_tail_grads_match_xla(rng):
    G, S, K, C, C2 = 2, 64, 4, 8, 16
    rows = jnp.asarray(rng.normal(size=(G, K * S, C)).astype(np.float32))
    base = jnp.asarray(rng.normal(size=(G, S, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(C2,)).astype(np.float32) * 0.1)

    def loss_fused(rows, base, w, b):
        return jnp.sum(jnp.cos(cross_tail(rows, base, w, b, K, True)))

    def loss_xla(rows, base, w, b):
        return jnp.sum(jnp.cos(_xla_chain(rows, base, w, b, K)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(rows, base, w, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(rows, base, w, b)
    for a, c, name in zip(g1, g2, ("rows", "base", "w", "b")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_cross_tail_duplicate_neighbour_ties_through_gather(rng):
    """Duplicate kNN indices (cosine + euclid halves selecting the same
    reference point) make exact max ties; after the gather's scatter-add VJP
    the first-claim and even-split conventions must agree."""
    G, S, K, C, C2, M = 1, 16, 4, 8, 8, 32
    tab = jnp.asarray(rng.normal(size=(G, M, C)).astype(np.float32))
    base = jnp.asarray(rng.normal(size=(G, S, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, C2)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(C2,)).astype(np.float32) * 0.1)
    idx = rng.integers(0, M, size=(G, K, S)).astype(np.int32)
    idx[:, 1] = idx[:, 0]          # neighbour slot 1 duplicates slot 0
    idx = jnp.asarray(idx)

    def gathered(tab):
        flat = idx.reshape(G, K * S)
        return jnp.take_along_axis(tab, flat[..., None], axis=1)

    def loss_fused(tab, base, w, b):
        return jnp.sum(jnp.sin(cross_tail(gathered(tab), base, w, b, K, True)))

    def loss_xla(tab, base, w, b):
        return jnp.sum(jnp.sin(_xla_chain(gathered(tab), base, w, b, K)))

    f1 = loss_fused(tab, base, w, b)
    f2 = loss_xla(tab, base, w, b)
    np.testing.assert_allclose(float(f1), float(f2), rtol=1e-5)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(tab, base, w, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(tab, base, w, b)
    for a, c, name in zip(g1, g2, ("tab", "base", "w", "b")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
