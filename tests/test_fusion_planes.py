"""Interpret-mode checks of the pair-plane build kernel
(ops/pallas/fusion_planes.py) against its XLA twin — values and gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocopci_tpu.ops.pallas.fusion_planes import (
    build_pair_planes,
    build_pair_planes_xla,
)


def _make(G=2, N=128, k2=3, seed=0):
    r = np.random.default_rng(seed)
    nbr = jnp.asarray(r.normal(size=(G, N * k2, 3)).astype(np.float32) * 8)
    p1t = jnp.asarray(r.normal(size=(G, 3, N)).astype(np.float32) * 8)
    return nbr, p1t


@pytest.mark.parametrize("N,k2", [(128, 1), (128, 3), (256, 2)])
def test_forward_matches_twin(N, k2):
    nbr, p1t = _make(N=N, k2=k2)
    x = build_pair_planes(nbr, p1t, interpret=True)
    x_t = build_pair_planes_xla(nbr, p1t)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_t),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_twin():
    nbr, p1t = _make(N=128, k2=2, seed=1)
    # non-symmetric downstream function so both plane rows get distinct grads
    r = np.random.default_rng(2)
    w = jnp.asarray(r.normal(size=(2, 4, 256)).astype(np.float32))

    def loss(f):
        def inner(nbr, p1t):
            x = f(nbr, p1t)
            return jnp.sum(x * jnp.tile(w, (1, 1, x.shape[2] // 256)))
        return inner

    g = jax.grad(loss(lambda a, b: build_pair_planes(a, b, interpret=True)),
                 argnums=(0, 1))(nbr, p1t)
    g_t = jax.grad(loss(build_pair_planes_xla), argnums=(0, 1))(nbr, p1t)
    for a, b in zip(g, g_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_zero_distance_pair_grad_finite():
    """A neighbour equal to its query (dist=0) must not NaN the backward."""
    G, N, k2 = 1, 128, 1
    r = np.random.default_rng(3)
    p1 = r.normal(size=(G, N, 3)).astype(np.float32)
    p1t = jnp.asarray(p1.transpose(0, 2, 1))
    nbr = jnp.asarray(p1.copy())                     # every pair coincides

    g = jax.grad(
        lambda a, b: jnp.sum(build_pair_planes(a, b, interpret=True))
    )(nbr, p1t)
    assert np.isfinite(np.asarray(g)).all()


def test_rejects_unaligned_n():
    nbr, p1t = _make(N=128, k2=1)
    with pytest.raises(ValueError):
        build_pair_planes(nbr[:, :60, :], p1t[:, :, :60], interpret=True)


def test_multi_chunk_grid_matches_twin():
    """N=16384 splits into two R=8192 point chunks (NT=2): exercises the
    t-grid dimension of both the forward sweep and the backward accumulator
    (dense 16k stress forwards hit this path)."""
    nbr, p1t = _make(G=1, N=16384, k2=2, seed=4)
    x = build_pair_planes(nbr, p1t, interpret=True)
    x_t = build_pair_planes_xla(nbr, p1t)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_t),
                               rtol=1e-5, atol=1e-5)

    g = jax.grad(
        lambda a, b: jnp.sum(jnp.cos(build_pair_planes(a, b, interpret=True)))
    )(nbr, p1t)
    g_t = jax.grad(
        lambda a, b: jnp.sum(jnp.cos(build_pair_planes_xla(a, b)))
    )(nbr, p1t)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_t),
                               rtol=1e-4, atol=1e-4)


def test_gather_pair_planes_matches_composed():
    """The fused gather+planes op: forward and BOTH gradients against the
    autodiff of gather -> XLA twin.  d_points2 runs through the radix-bucket
    scatter, whose interpret-mode bf16 accumulation adds ~1e-3 relative noise
    (f32 on the real MXU — see scatter_bucket.py)."""
    from mocopci_tpu.ops.pallas.fusion_planes import gather_pair_planes
    from mocopci_tpu.ops.sampling import gather

    r = np.random.default_rng(3)
    G, N, N2, k2 = 2, 128, 256, 3
    p2 = jnp.asarray(r.normal(size=(G, N2, 3)).astype(np.float32) * 8)
    p1t = jnp.asarray(r.normal(size=(G, 3, N)).astype(np.float32) * 8)
    idx = jnp.asarray(r.integers(0, N2, size=(G, N * k2)).astype(np.int32))

    def fused(p2, p1t):
        return jnp.sum(jnp.sin(gather_pair_planes(p2, idx, p1t, interpret=True)))

    def composed(p2, p1t):
        return jnp.sum(jnp.sin(build_pair_planes_xla(gather(p2, idx), p1t)))

    np.testing.assert_allclose(float(fused(p2, p1t)), float(composed(p2, p1t)),
                               rtol=1e-5)
    ga = jax.grad(fused, argnums=(0, 1))(p2, p1t)
    gb = jax.grad(composed, argnums=(0, 1))(p2, p1t)
    scale = np.abs(np.asarray(gb[0])).max()
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                               atol=5e-3 * scale)      # bucket interp noise
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               rtol=1e-4, atol=1e-4)
