"""Point-transformer block used once in the refine head.

Ref ``TransformerBlock`` (``models/pointT_layer2.py:37-77``): k-NN vector
attention with subtraction-based logits ``fc_gamma(q − k + pos)``, softmax over
the neighbour axis (scaled by sqrt(d_model)), aggregation of ``v + pos``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mocopci_tpu import ops
from mocopci_tpu.nn.basic import compute_dtype


class PointTransformerBlock(nn.Module):
    d_model: int
    k: int = 16

    @nn.compact
    def __call__(self, features, xyz):
        """features: (B, N, d_points); xyz: (B, N, 3) -> (B, N, d_points)."""
        idx = ops.knn(self.k, xyz, xyz)            # sorted ascending == argsort[:k]

        cdt = compute_dtype()
        pre = features
        x = nn.Dense(self.d_model, dtype=cdt, name="fc1")(features)
        q = nn.Dense(self.d_model, use_bias=False, dtype=cdt, name="w_qs")(x)
        ks = nn.Dense(self.d_model, use_bias=False, dtype=cdt, name="w_ks")(x)
        vs = nn.Dense(self.d_model, use_bias=False, dtype=cdt, name="w_vs")(x)
        knn_xyz, k_g, v_g = ops.group_multi(idx, xyz, ks, vs)

        rel = (xyz[:, :, None, :] - knn_xyz).astype(cdt)
        pos = nn.Dense(self.d_model, dtype=cdt, name="fc_delta2")(
            nn.relu(nn.Dense(self.d_model, dtype=cdt, name="fc_delta1")(rel))
        )
        attn = nn.Dense(self.d_model, dtype=cdt, name="fc_gamma2")(
            nn.relu(nn.Dense(self.d_model, dtype=cdt, name="fc_gamma1")(
                q[:, :, None] - k_g + pos))
        )
        # softmax over the small neighbour axis in f32
        attn = nn.softmax(attn.astype(jnp.float32) / jnp.sqrt(self.d_model), axis=2)
        res = jnp.sum(attn.astype(cdt) * (v_g + pos), axis=2)
        return nn.Dense(features.shape[-1], dtype=cdt, name="fc2")(res) + pre
