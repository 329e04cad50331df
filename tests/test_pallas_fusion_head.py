"""Interpret-mode checks for the fused fusion-head MLP kernel."""
import numpy as np
import jax.numpy as jnp


def _mlp_max(x, pairs):
    h = x
    for w, b in pairs:
        h = np.maximum(h @ w + b, 0.0)
    return h.max(-1)


def test_fusion_head_matches_dense(rng):
    from mocopci_tpu.ops.pallas.fusion_head import fusion_head_pallas

    G, P = 2, 200
    x = rng.normal(size=(G, P, 4)).astype(np.float32)
    pairs = []
    dims = [(4, 16), (16, 16), (16, 32)]
    for a, b in dims:
        pairs.append((rng.normal(size=(a, b)).astype(np.float32) * 0.3,
                      rng.normal(size=(b,)).astype(np.float32) * 0.1))
    flat = [jnp.asarray(t) for pair in pairs for t in pair]
    xt = jnp.asarray(x.transpose(0, 2, 1))                  # (G, 4, P) planes
    got = np.asarray(fusion_head_pallas(xt, *flat, interpret=True))
    want = _mlp_max(x, pairs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fold_bn_dense_equals_sequential(rng):
    from mocopci_tpu.ops.pallas.fusion_head import fold_bn_dense

    cin, cout, eps = 4, 8, 1e-3
    w = rng.normal(size=(cin, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    scale = rng.normal(size=(cout,)).astype(np.float32)
    bn_b = rng.normal(size=(cout,)).astype(np.float32)
    mean = rng.normal(size=(cout,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(cout,)).astype(np.float32)

    x = rng.normal(size=(10, cin)).astype(np.float32)
    seq = ((x @ w + b) - mean) / np.sqrt(var + eps) * scale + bn_b
    wf, bf = fold_bn_dense(*[jnp.asarray(t) for t in (w, b, scale, bn_b, mean, var)], eps)
    np.testing.assert_allclose(x @ np.asarray(wf) + np.asarray(bf), seq,
                               rtol=1e-5, atol=1e-5)
