"""Interpret-mode checks for the training-path attention kernel (custom VJP)."""
import numpy as np
import jax
import jax.numpy as jnp


def _dense_with_mask(q, k, v, scale, mask):
    # jnp twin of the kernel: softmax then elementwise dropout factors
    logits = jnp.einsum("gnd,gmd->gnm", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    if mask is not None:
        attn = attn * mask
    return jnp.einsum("gnm,gmd->gnd", attn, v)


def _make_qkv(rng, G, N, M, D):
    q = jnp.asarray(rng.normal(size=(G, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(G, M, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(G, M, D)).astype(np.float32))
    return q, k, v


def test_attention_train_rate0_matches_dense(rng):
    from mocopci_tpu.ops.pallas.attention_train import attention_train

    G, N, M, D = 2, 24, 40, 8
    q, k, v = _make_qkv(rng, G, N, M, D)
    seed = jnp.zeros((), jnp.int32)
    got = attention_train(q, k, v, seed, D ** -0.5, 0.0, True)
    want = _dense_with_mask(q, k, v, D ** -0.5, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_attention_train_rate0_grads(rng):
    from mocopci_tpu.ops.pallas.attention_train import attention_train

    G, N, M, D = 1, 16, 16, 8
    q, k, v = _make_qkv(rng, G, N, M, D)
    seed = jnp.zeros((), jnp.int32)

    def kern_loss(q, k, v):
        return jnp.sum(attention_train(q, k, v, seed, 0.5, 0.0, True) ** 2)

    def dense_loss(q, k, v):
        return jnp.sum(_dense_with_mask(q, k, v, 0.5, None) ** 2)

    g1 = jax.grad(kern_loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_attention_train_dropout_matches_reference_mask(rng):
    from mocopci_tpu.ops.pallas.attention_train import (
        attention_train,
        keep_mask_reference,
    )

    G, N, M, D, rate = 2, 16, 24, 8, 0.3
    q, k, v = _make_qkv(rng, G, N, M, D)
    seed = jnp.asarray(1234, jnp.int32)
    mask = jnp.stack(
        [keep_mask_reference(1234, g, N, M, rate) for g in range(G)]
    )
    got = attention_train(q, k, v, seed, D ** -0.5, rate, True)
    want = _dense_with_mask(q, k, v, D ** -0.5, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # dropped entries exist and the mask is reproducible
    assert float(jnp.mean(mask == 0)) > 0.1

    def kern_loss(q, k, v):
        return jnp.sum(attention_train(q, k, v, seed, D ** -0.5, rate, True) ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(_dense_with_mask(q, k, v, D ** -0.5, mask) ** 2)

    g1 = jax.grad(kern_loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_dropout_mask_unique_across_groups():
    # Regression (ADVICE r2): packing the group id as (g << 24) aliased masks
    # for groups 256 apart; the full-width hash mix must keep them distinct.
    from mocopci_tpu.ops.pallas.attention_train import keep_mask_reference

    m0 = np.asarray(keep_mask_reference(7, 0, 32, 32, 0.3))
    m256 = np.asarray(keep_mask_reference(7, 256, 32, 32, 0.3))
    m1 = np.asarray(keep_mask_reference(7, 1, 32, 32, 0.3))
    assert not np.array_equal(m0, m256)
    assert not np.array_equal(m0, m1)
    # reproducibility with the same (seed, g)
    np.testing.assert_array_equal(
        m0, np.asarray(keep_mask_reference(7, 0, 32, 32, 0.3))
    )


def test_attention_train_multi_tile_accumulation(rng):
    # N spans several q-tiles (tq=256) -> dk/dv accumulate across grid steps,
    # and the zero-padded tail rows must contribute nothing
    from mocopci_tpu.ops.pallas.attention_train import attention_train

    G, N, M, D = 1, 300, 16, 8
    q, k, v = _make_qkv(rng, G, N, M, D)
    seed = jnp.zeros((), jnp.int32)

    def kern_loss(q, k, v):
        return jnp.sum(attention_train(q, k, v, seed, 0.4, 0.0, True) ** 2)

    def dense_loss(q, k, v):
        return jnp.sum(_dense_with_mask(q, k, v, 0.4, None) ** 2)

    g1 = jax.grad(kern_loss, argnums=(1, 2))(q, k, v)
    g2 = jax.grad(dense_loss, argnums=(1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
