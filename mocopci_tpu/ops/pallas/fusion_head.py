"""Fused kNN-softmax fusion-head MLP (ref ``fusion``, ``mocopci.py:798-819``).

The fusion head scores every (query, neighbour) pair with a 3-layer MLP
(4 -> 64 -> 64 -> 128, BN + ReLU) followed by a max over channels.  The dense
XLA program materializes each (F·B, N, 2k, C) activation in HBM — ~400-800 MB
per layer at 8192 points — for ~40 GFLOP of MXU work, i.e. it is purely
HBM-bound.

Layout: everything runs TRANSPOSED, (channels, pairs), so the huge pair axis
always sits on lanes at full 128-wide occupancy.  The caller provides the
pair features as four stacked planes ``(G, 4, P)`` (one XLA relayout of the
18 MB resi/dist tensor — a pairs-minor ``(G, P, 4)`` layout would pad every
lane tile 4/128 and turn each pass into 32x the traffic, measured as a 14 ms
regression).  Weights multiply from the left on the MXU; the channel max is a
cheap sublane reduction; the output is a dense ``(G, P)`` logits row.

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
    x = x_ref[0]                                            # (4, R)

    def dense_relu_t(h, w_ref, b_ref):
        # h: (Cin, R); w: (Cin, Cout); b: (Cout, 1) -> (Cout, R)
        h = lax.dot_general(
            w_ref[:], h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(h + b_ref[:], 0.0)

    h = dense_relu_t(x, w1_ref, b1_ref)                     # (C1, R)
    h = dense_relu_t(h, w2_ref, b2_ref)                     # (C1, R)
    h = dense_relu_t(h, w3_ref, b3_ref)                     # (C2, R)
    out_ref[0] = jnp.max(h, axis=0, keepdims=True)          # (1, R)


@functools.partial(jax.jit, static_argnums=(7,))
def fusion_head_pallas(
    x: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    w3: jax.Array, b3: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Per-pair MLP + channel max with VMEM-resident transposed activations.

    Args:
      x: (G, 4, P) f32 — pair-feature planes [resi_x, resi_y, resi_z, dist],
        P = N·2k pairs on lanes.
      w1/b1, w2/b2, w3/b3: BN-folded dense parameters (see `fold_bn_dense`),
        wi of shape (Cin, Cout).
    Returns:
      (G, P) f32 — max over the last MLP layer's channels per pair.
    """
    G, F, P = x.shape
    R = min(8192, _round_up(P, 128))
    ppad = _round_up(P, R)
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, ppad - P)))
    ws = [w.astype(jnp.float32) for w in (w1, w2, w3)]
    biases = [b.astype(jnp.float32).reshape(-1, 1) for b in (b1, b2, b3)]

    full = lambda *s: pl.BlockSpec(s, lambda g, t: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _head_kernel,
        grid=(G, ppad // R),
        in_specs=[
            pl.BlockSpec((1, F, R), lambda g, t: (g, 0, t),
                         memory_space=pltpu.VMEM),
            full(*ws[0].shape), full(*biases[0].shape),
            full(*ws[1].shape), full(*biases[1].shape),
            full(*ws[2].shape), full(*biases[2].shape),
        ],
        out_specs=pl.BlockSpec((1, 1, R), lambda g, t: (g, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 1, ppad), jnp.float32),
        interpret=interpret,
    )(x, ws[0], biases[0], ws[1], biases[1], ws[2], biases[2])
    return out[:, 0, :P]
