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


def test_chunked_mha_dropout_rate0_matches_dense(rng):
    """rate=0 chunked-train attention == dense softmax attention exactly."""
    import jax
    import jax.numpy as jnp
    from mocopci_tpu.nn import attention as A

    B, F, N, H, D = 1, 2, 384, 2, 8
    q = jnp.asarray(rng.normal(size=(B, F, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, F, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, F, N, H, D)).astype(np.float32))
    scale = D ** -0.5
    dense = jnp.einsum("bfnhd,bfmhd->bfhnm", q, k) * scale
    dense = jax.nn.softmax(dense, axis=-1)
    want = jnp.einsum("bfhnm,bfmhd->bfnhd", dense, v)

    old = A._DENSE_ATTN_LIMIT
    try:
        A._DENSE_ATTN_LIMIT = 128 * N  # force multi-chunk (chunk=128, nb=3)
        got = A._chunked_mha_dropout(q, k, v, scale, 0.0,
                                     jax.random.PRNGKey(0))
    finally:
        A._DENSE_ATTN_LIMIT = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_chunked_mha_dropout_statistics(rng):
    """rate>0: per-chunk masks differ, mean output ~ rate-invariant."""
    import jax
    import jax.numpy as jnp
    from mocopci_tpu.nn import attention as A

    B, F, N, H, D = 1, 1, 256, 1, 4
    q = jnp.asarray(rng.normal(size=(B, F, N, H, D)).astype(np.float32))
    v = jnp.ones((B, F, N, H, D), jnp.float32)
    old = A._DENSE_ATTN_LIMIT
    try:
        A._DENSE_ATTN_LIMIT = 128 * N
        got = A._chunked_mha_dropout(q, q, v, D ** -0.5, 0.3,
                                     jax.random.PRNGKey(1))
    finally:
        A._DENSE_ATTN_LIMIT = old
    out = np.asarray(got)
    assert np.isfinite(out).all()
    # v == 1 rows: output = sum of kept attn/keep ≈ 1 in expectation
    assert abs(out.mean() - 1.0) < 0.05
    # dropout actually fired: some deviation from exactly 1
    assert np.abs(out - 1.0).max() > 1e-3


def test_multiframeblock_train_chunked_path(rng):
    """MultiFrameBlock train forward+grad through the chunked-dropout branch."""
    import jax
    import jax.numpy as jnp
    from mocopci_tpu.nn import attention as A

    B, F, N, C = 1, 5, 256, 16
    xs = jnp.asarray(rng.normal(size=(B, F, N, C)).astype(np.float32))
    blk = A.MultiFrameBlock(dim=C, latent=24, num_heads=2)
    variables = blk.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        xs, True, False,
    )
    old = A._DENSE_ATTN_LIMIT
    try:
        A._DENSE_ATTN_LIMIT = N * 128  # chunk=128: train hits the new branch

        def loss(p):
            feats, frames = blk.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                xs, True, False,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )[0]
            return jnp.sum(feats ** 2) + jnp.sum(frames ** 2)

        val, g = jax.value_and_grad(loss)(variables["params"])
    finally:
        A._DENSE_ATTN_LIMIT = old
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
