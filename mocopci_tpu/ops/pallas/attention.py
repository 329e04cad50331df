"""Fused softmax attention for the decoder's token attentions.

The L1/L2 attention blocks (EI cross-attention and the time-token
Multi_Frame_Att) run at up to 2048 points with 8 heads of dim 8; the XLA
program materializes the (B, F, H, N, M) logits tensor in HBM (671 MB at L1),
reads it back for the softmax, and reads it again for the value matmul —
~2 GB of HBM traffic per call for ~3 GFLOP of MXU work.  This kernel keeps
each (TQ, M) logits tile in VMEM: the only HBM traffic is q/k/v/out.

Full-row softmax (no online rescaling): the reference sequence lengths are
<= 2048, so a (TQ, M) f32 tile fits VMEM comfortably; the caller guards
M <= 4096.  Numerics match the dense XLA path: logits accumulate in f32 on
the MXU (default precision, same as the jnp.einsum it replaces), softmax in
f32, value matmul in f32.

Eval path only — the training path keeps the dense program because attention
dropout samples the full matrix.
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


def _attn_kernel(scale: float, M: int, q_ref, k_ref, v_ref, out_ref):
    q = q_ref[0]                  # (TQ, D)
    k = k_ref[0]                  # (Mpad, D)
    v = v_ref[0]
    logits = lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                      # (TQ, Mpad)
    if M != k.shape[0]:
        col = lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
        logits = jnp.where(col < M, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    out = lax.dot_general(
        e, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out / s


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def fused_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    tq: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Softmax attention with VMEM-resident logits tiles.

    Args:
      q: (G, N, D) — G = flattened (batch, frames, heads).
      k, v: (G, M, D), M <= MAX_SEQ.
      scale: logit scale (e.g. D^-0.5).
    Returns:
      (G, N, D) f32.
    """
    G, N, D = q.shape
    M = k.shape[1]
    assert M <= MAX_SEQ, (M, MAX_SEQ)
    tq = min(tq, _round_up(N, 8))
    npad = _round_up(N, tq)
    mpad = _round_up(M, 128)
    q = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, npad - N), (0, 0)))
    k = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, mpad - M), (0, 0)))
    v = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, mpad - M), (0, 0)))

    kernel = functools.partial(_attn_kernel, float(scale), M)
    out = pl.pallas_call(
        kernel,
        grid=(G, npad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda g, n: (g, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, n: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, D), lambda g, n: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, D), lambda g, n: (g, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, npad, D), jnp.float32),
        interpret=interpret,
    )(q, k, v)
    return out[:, :N]
