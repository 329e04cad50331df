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

    def setup(self):
        cdt = compute_dtype()
        self.fc1 = nn.Dense(self.d_model, dtype=cdt, name="fc1")
        self.w_qs = nn.Dense(self.d_model, use_bias=False, dtype=cdt, name="w_qs")
        self.w_ks = nn.Dense(self.d_model, use_bias=False, dtype=cdt, name="w_ks")
        self.w_vs = nn.Dense(self.d_model, use_bias=False, dtype=cdt, name="w_vs")
        self.fc_delta1 = nn.Dense(self.d_model, dtype=cdt, name="fc_delta1")
        self.fc_delta2 = nn.Dense(self.d_model, dtype=cdt, name="fc_delta2")
        self.fc_gamma1 = nn.Dense(self.d_model, dtype=cdt, name="fc_gamma1")
        self.fc_gamma2 = nn.Dense(self.d_model, dtype=cdt, name="fc_gamma2")
        # fc2 output width is the input feature width == d_model on the live
        # path (refine head: TransformerBlock(64, 64), ``mocopci.py:763``)
        self.fc2 = nn.Dense(self.d_model, dtype=cdt, name="fc2")

    def __call__(self, features, xyz):
        """features: (B, N, d_model); xyz: (B, N, 3) -> (B, N, d_model)."""
        return self.attend(features, xyz, features, xyz)

    def attend(self, features, xyz, features_kv, xyz_kv):
        """Query-row-parallel core: ``features``/``xyz`` are the query rows,
        ``features_kv``/``xyz_kv`` the (possibly all-gathered full) reference
        set the kNN searches over.  The unsharded call passes the same arrays
        for both; the point-sharded forward passes (local, full)."""
        idx = ops.knn(self.k, xyz_kv, xyz)        # sorted ascending == argsort[:k]

        cdt = compute_dtype()
        pre = features
        x = self.fc1(features)
        q = self.w_qs(x)
        x_kv = self.fc1(features_kv)
        ks = self.w_ks(x_kv)
        vs = self.w_vs(x_kv)
        knn_xyz, k_g, v_g = ops.group_multi(idx, xyz_kv, ks, vs)

        rel = (xyz[:, :, None, :] - knn_xyz).astype(cdt)
        pos = self.fc_delta2(nn.relu(self.fc_delta1(rel)))
        attn = self.fc_gamma2(nn.relu(self.fc_gamma1(q[:, :, None] - k_g + pos)))
        # softmax over the small neighbour axis in f32
        attn = nn.softmax(attn.astype(jnp.float32) / jnp.sqrt(self.d_model), axis=2)
        res = jnp.sum(attn.astype(cdt) * (v_g + pos), axis=2)
        return self.fc2(res) + pre
