"""Fused softmax attention with custom VJP (training path).

The training attentions keep dropout on the softmax matrix (ref
``Multi_Frame_Att``/``Cross_Frame_Att``, ``attn_drop=0.05``), so the dense XLA
program materializes the (B, F, H, N, M) logits, the dropout mask, and their
backward — ~27 ms of the train step at L1 (N=M=2048, 671 MB per tensor).
Here forward and backward are flash-style Pallas kernels: each (TQ, M) logits
tile lives only in VMEM (M <= MAX_SEQ, so a full-row softmax needs no online
rescaling), and the backward recomputes the tile instead of loading it.

Dropout inside the kernel uses a counter-based murmur3-finalizer hash of the
global element index — pure elementwise u32 arithmetic, so it is (a) cheap,
(b) bit-reproducible between the forward and backward kernels (same seed →
same mask), and (c) implementable in plain jnp for exact unit tests (the
``pltpu`` hardware PRNG has no interpret-mode lowering).  The mask therefore
differs bit-for-bit from flax's threefry dropout but has identical iid
Bernoulli semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SEQ = 4096


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hash_u32(x):
    """murmur3 fmix32 — elementwise avalanche hash on uint32."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _keep_mask(seed, g, q0, tq, mw, rate):
    """(tq, mw) keep/(1-rate) dropout scale factors, 0 where dropped.

    The (row, col) counter packs as (row << 12) ^ col — unique for
    N, M <= 4096 (= MAX_SEQ) regardless of padding — and the group id is
    mixed into the SEED through a full-width avalanche hash (a shifted-g
    counter would wrap at g >= 256, aliasing dropout masks across attention
    groups since G = B·F·H easily exceeds 256).  Forward kernel, backward
    kernel, and the plain-jnp test twin all see the same mask.
    """
    rows = lax.broadcasted_iota(jnp.uint32, (tq, mw), 0) + jnp.uint32(q0)
    cols = lax.broadcasted_iota(jnp.uint32, (tq, mw), 1)
    ctr = (rows << jnp.uint32(12)) ^ cols
    h = _hash_u32(ctr ^ _hash_u32(jnp.uint32(g) ^ jnp.uint32(seed)))
    # Mosaic has no uint32 -> float cast; compare in int32 (values < 2^24)
    keep = (h & jnp.uint32(0xFFFFFF)).astype(jnp.int32) >= jnp.int32(
        rate * (1 << 24)
    )
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _fwd_kernel(scale, rate, M, TQ, q_ref, k_ref, v_ref, seed_ref, out_ref):
    g = pl.program_id(0)
    t = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if M != k.shape[0]:
        col = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < M, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    attn = e / s
    if rate > 0.0:
        attn = attn * _keep_mask(seed_ref[0], g, t * TQ, TQ, e.shape[1], rate)
    out_ref[0] = lax.dot_general(
        attn, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(scale, rate, M, TQ,
                q_ref, k_ref, v_ref, seed_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    g = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    logits = lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if M != k.shape[0]:
        col = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < M, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    attn = e / s                                            # pre-dropout
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], g, t * TQ, TQ, e.shape[1], rate)
        attn_d = attn * keep
    else:
        attn_d = attn
    # dv += attn_dᵀ @ do
    dv_ref[0] += lax.dot_general(
        attn_d, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # d_attn (post-dropout grad) = do @ vᵀ, masked back through dropout
    d_attn = lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        d_attn = d_attn * keep
    # softmax backward: dl = attn ∘ (d_attn − Σ_m d_attn∘attn)
    dot = jnp.sum(d_attn * attn, axis=1, keepdims=True)
    dl = attn * (d_attn - dot)
    dq_ref[0] = lax.dot_general(
        dl, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dk_ref[0] += lax.dot_general(
        dl, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale


def _pad_qkv(q, k, v, tq):
    G, N, D = q.shape
    M = k.shape[1]
    npad = _round_up(N, tq)
    mpad = _round_up(M, 128)
    q = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, npad - N), (0, 0)))
    k = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, mpad - M), (0, 0)))
    v = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, mpad - M), (0, 0)))
    return q, k, v, npad, mpad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def attention_train(q, k, v, seed, scale, rate, interpret=False):
    """Softmax attention with dropout on the attention matrix.

    Args:
      q: (G, N, D) f32; k, v: (G, M, D), M <= MAX_SEQ.
      seed: int32 scalar array — dropout stream seed (ignored if rate == 0).
      scale: static logit scale; rate: static dropout rate in [0, 1).
    Returns:
      (G, N, D) f32.
    """
    out, _ = _attention_train_fwd(q, k, v, seed, scale, rate, interpret)
    return out


def _attention_train_fwd(q, k, v, seed, scale, rate, interpret=False):
    G, N, D = q.shape
    M = k.shape[1]
    assert M <= MAX_SEQ, (M, MAX_SEQ)
    tq = min(256, _round_up(N, 8))
    qp, kp, vp, npad, mpad = _pad_qkv(q, k, v, tq)
    kernel = functools.partial(_fwd_kernel, float(scale), float(rate), M, tq)
    out = pl.pallas_call(
        kernel,
        grid=(G, npad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda g, t: (g, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, t: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, t: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, D), lambda g, t: (g, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, npad, D), jnp.float32),
        interpret=interpret,
    )(qp, kp, vp, seed.reshape(1).astype(jnp.int32))
    return out[:, :N], (q, k, v, seed)


def _attention_train_bwd(scale, rate, interpret, res, g_out):
    q, k, v, seed = res
    G, N, D = q.shape
    M = k.shape[1]
    tq = min(256, _round_up(N, 8))
    qp, kp, vp, npad, mpad = _pad_qkv(q, k, v, tq)
    dop = jnp.pad(g_out.astype(jnp.float32), ((0, 0), (0, npad - N), (0, 0)))
    kernel = functools.partial(_bwd_kernel, float(scale), float(rate), M, tq)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(G, npad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda g, t: (g, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, t: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, t: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, D), lambda g, t: (g, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, D), lambda g, t: (g, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, t: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, t: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, npad, D), jnp.float32),
            jax.ShapeDtypeStruct((G, mpad, D), jnp.float32),
            jax.ShapeDtypeStruct((G, mpad, D), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, seed.reshape(1).astype(jnp.int32), dop)
    return dq[:, :N], dk[:, :M], dv[:, :M], None


attention_train.defvjp(_attention_train_fwd, _attention_train_bwd)


def keep_mask_reference(seed, g, n, m, rate):
    """Plain-jnp twin of the in-kernel mask for unit tests: (n, m) factors."""
    rows = jnp.arange(n, dtype=jnp.uint32)[:, None]
    cols = jnp.arange(m, dtype=jnp.uint32)[None, :]
    ctr = (rows << jnp.uint32(12)) ^ cols
    h = _hash_u32(ctr ^ _hash_u32(jnp.uint32(g) ^ jnp.uint32(seed)))
    keep = (h & jnp.uint32(0xFFFFFF)).astype(jnp.int32) >= jnp.int32(
        rate * (1 << 24)
    )
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))
