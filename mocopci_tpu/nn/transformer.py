"""Point-transformer block used once in the refine head.

Ref ``TransformerBlock`` (``models/pointT_layer2.py:37-77``): k-NN vector
attention with subtraction-based logits ``fc_gamma(q − k + pos)``, softmax over
the neighbour axis (scaled by sqrt(d_model)), aggregation of ``v + pos``.
"""
from __future__ import annotations

import jax
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

        if cdt == jnp.float32 and xyz.shape[1] >= 1024:
            # TPU: the whole pair-tensor chain (pos MLP, q−k+pos, gamma MLP,
            # per-channel softmax, weighted sum) runs as ONE fused Pallas
            # sweep with a flash-style online softmax and a recompute VJP
            # (ops/pallas/transformer_tail.py) — the XLA twin below is the
            # same arithmetic for CPU.  Dummy calls materialize the four
            # Dense layers' params outside the platform branches.
            D = self.d_model
            _ = self.fc_delta1(jnp.zeros((1, 1, 3), cdt))
            _ = self.fc_delta2(jnp.zeros((1, 1, D), cdt))
            _ = self.fc_gamma1(jnp.zeros((1, 1, D), cdt))
            _ = self.fc_gamma2(jnp.zeros((1, 1, D), cdt))
            ps = [
                m.variables["params"]
                for m in (self.fc_delta1, self.fc_delta2,
                          self.fc_gamma1, self.fc_gamma2)
            ]
            w8 = []
            for p in ps:
                w8 += [p["kernel"].astype(jnp.float32),
                       p["bias"].astype(jnp.float32)]
            B, K = idx.shape[0], self.k
            table = jnp.concatenate(
                [xyz_kv.astype(jnp.float32), ks, vs], axis=-1
            )
            idx_km = idx.transpose(0, 2, 1).reshape(B, -1)

            def fused(table, xyzq, q):
                from mocopci_tpu.ops.pallas.transformer_tail import (
                    transformer_tail,
                )

                rows = ops.gather(table, idx_km)
                return transformer_tail(rows, xyzq, q, *w8, K)

            def xla(table, xyzq, q):
                (r,) = ops.group_multi(idx, table)
                knn_xyz = r[..., :3]
                k_g = r[..., 3 : 3 + D]
                v_g = r[..., 3 + D :]
                rel = xyzq[:, :, None, :] - knn_xyz
                pos = nn.relu(rel @ w8[0] + w8[1]) @ w8[2] + w8[3]
                gv = q[:, :, None] - k_g + pos
                logit = (nn.relu(gv @ w8[4] + w8[5]) @ w8[6] + w8[7])
                attn = nn.softmax(logit / jnp.sqrt(D), axis=2)
                return jnp.sum(attn * (v_g + pos), axis=2)

            res = jax.lax.platform_dependent(
                table, xyz.astype(jnp.float32), q, tpu=fused, default=xla
            )
            return self.fc2(res) + pre

        knn_xyz, k_g, v_g = ops.group_multi(idx, xyz_kv, ks, vs)

        rel = (xyz[:, :, None, :] - knn_xyz).astype(cdt)
        pos = self.fc_delta2(nn.relu(self.fc_delta1(rel)))
        attn = self.fc_gamma2(nn.relu(self.fc_gamma1(q[:, :, None] - k_g + pos)))
        # softmax over the small neighbour axis in f32
        attn = nn.softmax(attn.astype(jnp.float32) / jnp.sqrt(self.d_model), axis=2)
        res = jnp.sum(attn.astype(cdt) * (v_g + pos), axis=2)
        return self.fc2(res) + pre
