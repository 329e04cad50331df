"""Interpret-mode checks for the fused softmax-attention kernel."""
import numpy as np
import jax.numpy as jnp


def _ref_attention(q, k, v, scale):
    logits = np.einsum("gnd,gmd->gnm", q, k) * scale
    logits = logits - logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("gnm,gmd->gnd", w, v)


def test_fused_attention_matches_dense(rng):
    from mocopci_tpu.ops.pallas.attention import fused_attention_pallas

    G, N, M, D = 3, 40, 50, 8
    q = rng.normal(size=(G, N, D)).astype(np.float32)
    k = rng.normal(size=(G, M, D)).astype(np.float32)
    v = rng.normal(size=(G, M, D)).astype(np.float32)
    got = np.asarray(
        fused_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), D ** -0.5,
            interpret=True,
        )
    )
    want = _ref_attention(q, k, v, D ** -0.5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_attention_masks_m_padding(rng):
    # M not a multiple of 128 engages the iota mask; padded keys must carry
    # zero softmax weight regardless of their (zero-padded) logits
    from mocopci_tpu.ops.pallas.attention import fused_attention_pallas

    G, N, M, D = 1, 16, 130, 8
    q = rng.normal(size=(G, N, D)).astype(np.float32)
    k = rng.normal(size=(G, M, D)).astype(np.float32)
    v = rng.normal(size=(G, M, D)).astype(np.float32) + 5.0
    got = np.asarray(
        fused_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.5, interpret=True
        )
    )
    want = _ref_attention(q, k, v, 0.5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
