"""Fused kNN-softmax fusion-head MLP (ref ``fusion``, ``mocopci.py:798-819``).

The fusion head scores every (query, neighbour) pair with a 3-layer MLP
(4 -> 64 -> 64 -> 128, BN + ReLU) followed by a max over channels.  The dense
XLA program materializes each (F·B, N, 2k, C) activation in HBM — ~400-800 MB
per layer at 8192 points — for ~40 GFLOP of MXU work, i.e. it is purely
HBM-bound.  This kernel streams row tiles of the flattened (F·B·N·2k, 4)
pair-feature matrix through VMEM: the only HBM traffic is the 4-wide input
and the 1-wide channel-max output.

Eval-only: BatchNorm running statistics are folded into the dense weights by
the caller (`fold_bn_dense`); the training path keeps the dense XLA program
(per-batch BN statistics + autodiff).  The softmax over neighbours and the
position blend stay in XLA — they touch (F·B, N, 2k[, 3]) tensors only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_bn_dense(kernel, bias, scale, bn_bias, mean, var, eps):
    """Fold eval-mode BatchNorm into the preceding dense layer.

    y = ((x @ W + b) - mean) * rsqrt(var + eps) * scale + bn_bias
      =  x @ (W * s) + ((b - mean) * s + bn_bias),  s = scale * rsqrt(var+eps)
    """
    s = scale * jax.lax.rsqrt(var + eps)
    return kernel * s[None, :], (bias - mean) * s + bn_bias


def _head_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
    x = x_ref[0]                                            # (R, 4)

    def dense_relu(h, w_ref, b_ref):
        h = lax.dot_general(
            h, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(h + b_ref[:], 0.0)

    h = dense_relu(x, w1_ref, b1_ref)                       # (R, C1)
    h = dense_relu(h, w2_ref, b2_ref)                       # (R, C1)
    h = dense_relu(h, w3_ref, b3_ref)                       # (R, C2)
    out_ref[0] = jnp.max(h, axis=1, keepdims=True)          # (R, 1)


@functools.partial(jax.jit, static_argnums=(7,))
def fusion_head_pallas(
    x: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array, b3: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Per-pair MLP + channel max with VMEM-resident activations.

    Args:
      x: (G, P, 4) f32 — pair features [resi_xyz, dist], P = N·2k rows.
      w1/b1, w2/b2, w3/b3: BN-folded dense parameters (see `fold_bn_dense`).
    Returns:
      (G, P) f32 — max over the last MLP layer's channels per pair.
    """
    G, P, F = x.shape
    R = min(4096, _round_up(P, 8))
    ppad = _round_up(P, R)
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, ppad - P), (0, 0)))
    args = [w.astype(jnp.float32) for w in (w1, w2, w3)]
    biases = [b.astype(jnp.float32).reshape(1, -1) for b in (b1, b2, b3)]

    full = lambda *s: pl.BlockSpec(s, lambda g, t: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _head_kernel,
        grid=(G, ppad // R),
        in_specs=[
            pl.BlockSpec((1, R, F), lambda g, t: (g, t, 0),
                         memory_space=pltpu.VMEM),
            full(*args[0].shape), full(*biases[0].shape),
            full(*args[1].shape), full(*biases[1].shape),
            full(*args[2].shape), full(*biases[2].shape),
        ],
        out_specs=pl.BlockSpec((1, R, 1), lambda g, t: (g, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, ppad, 1), jnp.float32),
        interpret=interpret,
    )(x, args[0], biases[0], args[1], biases[1], args[2], biases[2])
    return out[:, :P, 0]
