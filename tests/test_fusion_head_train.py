"""Interpret-mode checks of the fused train-path fusion-head kernel
(ops/pallas/fusion_head_train.py) against a plain-jnp twin."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _twin(x, params, n_groups, eps=1e-3):
    """Straightforward program: 3x (dense -> per-frame-group BN -> relu),
    max over channels.  Returns (o, [(mean, biased_var)] * 3)."""
    G, _, P = x.shape
    F = n_groups
    Bg = G // F
    h = x
    stats = []
    for i in range(3):
        W, b, gam, bet = params[4 * i: 4 * i + 4]
        z = jnp.einsum("gcp,cd->gdp", h, W) + b[:, None]
        C = z.shape[1]
        zg = z.reshape(F, Bg, C, P)
        mean = zg.mean(axis=(1, 3))
        var = ((zg - mean[:, None, :, None]) ** 2).mean(axis=(1, 3))
        zh = (zg - mean[:, None, :, None]) * jax.lax.rsqrt(
            var[:, None, :, None] + eps
        )
        pre = gam[:, None] * zh.reshape(G, C, P) + bet[:, None]
        h = jax.nn.relu(pre)
        stats.append((mean, var))
    return jnp.max(h, axis=1), stats


def _make(G, P, widths=(8, 8, 16), seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(G, 4, P)).astype(np.float32))
    params = []
    cin = 4
    for c in widths:
        params += [
            jnp.asarray(r.normal(size=(cin, c)).astype(np.float32) * 0.5),
            jnp.asarray(r.normal(size=(c,)).astype(np.float32) * 0.1),
            jnp.asarray(1.0 + 0.1 * r.normal(size=(c,)).astype(np.float32)),
            jnp.asarray(0.1 * r.normal(size=(c,)).astype(np.float32)),
        ]
        cin = c
    return x, tuple(params)


@pytest.mark.parametrize("P", [300, 2200])
def test_forward_matches_twin(P):
    from mocopci_tpu.ops.pallas.fusion_head_train import fusion_head_train

    G, F = 6, 3
    x, params = _make(G, P)
    o, stats = fusion_head_train(x, params, F, interpret=True)
    o_t, stats_t = _twin(x, params, F)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_t),
                               rtol=1e-4, atol=1e-4)
    for (m, v), (mt, vt) in zip(stats, stats_t):
        np.testing.assert_allclose(np.asarray(m), np.asarray(mt),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vt),
                                   rtol=1e-3, atol=1e-5)


def test_gradients_match_twin():
    from mocopci_tpu.ops.pallas.fusion_head_train import fusion_head_train

    G, F, P = 6, 3, 700
    x, params = _make(G, P, seed=1)
    co = jnp.asarray(
        np.random.default_rng(2).normal(size=(G, P)).astype(np.float32)
    )

    def loss_k(x, params):
        o, _ = fusion_head_train(x, params, F, interpret=True)
        return jnp.sum(o * co)

    def loss_t(x, params):
        o, _ = _twin(x, params, F)
        return jnp.sum(o * co)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, params)
    gt = jax.grad(loss_t, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gt[0]),
                               rtol=2e-4, atol=2e-4)
    names = ["W1", "b1", "g1", "be1", "W2", "b2", "g2", "be2",
             "W3", "b3", "g3", "be3"]
    for n, a, b in zip(names, gk[1], gt[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"param grad mismatch: {n}",
        )
