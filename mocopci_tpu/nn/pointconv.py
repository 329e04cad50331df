"""PointConv layers (flax, channels-last).

Ref ``PointConv``/``PointConvD`` (``models/m_models/mocopci.py:1303-1396``):
kNN grouping → WeightNet on relative xyz → per-point matmul aggregation
``(C, K) × (K, W) → (C·W)`` → Dense → LeakyReLU.  The ``D`` variant FPS-
downsamples the queries first.

The aggregation einsum is a batch of tiny (C×K)·(K×W) matmuls; with
channels-last layout XLA vectorises it across the point axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mocopci_tpu import ops
from mocopci_tpu.nn.basic import LEAKY_RATE, WeightNet, compute_dtype


def _pointconv_core(
    weightnet: WeightNet,
    linear: nn.Dense,
    query_xyz: jax.Array,     # (B, S, 3)
    grouped_rows: jax.Array,  # (B, S, K, 3+D) raw [xyz | feat] neighbour rows
) -> jax.Array:
    """Shared PointConv aggregation. Returns (B, S, out).

    The aggregation+linear pair ``linear(einsum("bskc,bskw->bscw", X, W))``
    is computed as the mathematically identical per-w sum
    ``Σ_w (X ⊙ W[..., w]) @ lin[:, w, :]`` — the 4D einsum's (B,S,C,W)
    output forced XLA layout copies on the grouped tensors and a heavier
    transpose set in the backward (measured on v5e, L0 shape B=4:
    fwd+bwd 22.9 → 20.6 ms; ``scripts/pointconv_layout_experiments.py``).
    The elementwise ``X ⊙ W[..., w]`` fuses into each dot's producer, and
    summation order over (k, then w) only reorders an f32 reduction.

    ``X = concat([nbr_xyz − q, nbr_feat])`` is built as ONE broadcast
    subtract on the raw gathered rows, ``grouped_rows − [q | 0]`` — the
    slice-into-two / re-concatenate round trip of the former
    (grouped_xyz, grouped_feat) interface cost three full passes over the
    (B, S, K, 3+D) tensor plus an add_any gradient merge in the backward.
    Only the query subtraction differs per channel group (features are NOT
    query-subtracted — ref ``mocopci.py:1331-1339``), so padding the query
    with D zeros reproduces it exactly.
    """
    cdt = compute_dtype()
    rel = grouped_rows[..., :3] - query_xyz[:, :, None, :]     # (B,S,K,3)
    D = grouped_rows.shape[-1] - 3
    qpad = jnp.pad(query_xyz, ((0, 0), (0, 0), (0, D)))        # (B,S,3+D)
    new_points = (grouped_rows - qpad[:, :, None, :]).astype(cdt)
    weights = weightnet(rel).astype(cdt)                        # (B,S,K,W)
    C = new_points.shape[-1]
    W = weights.shape[-1]
    # dummy pass creates the linear params with their (C·W, out) shape
    hd = linear(jnp.zeros((1, 1, C * W), cdt))
    lv = linear.variables["params"]
    # agg.reshape(B, S, C·W) flattens (c, w) with w minor → kernel rows are
    # (c, w)-ordered: reshape to (C, W, out) and take the w slice
    lin3 = lv["kernel"].astype(cdt).reshape(C, W, -1)
    out = lv["bias"].astype(jnp.float32)
    for w in range(W):
        m = new_points * weights[..., w : w + 1]                # (B,S,K,C)
        out = out + jnp.einsum(
            "bskc,cd->bsd", m, lin3[:, w],
            preferred_element_type=jnp.float32,
        )
    return nn.leaky_relu(out.astype(cdt), LEAKY_RATE)


class PointConv(nn.Module):
    """Same-resolution PointConv (ref ``mocopci.py:1303-1346``).

    ``grouped`` exposes the aggregation core on pre-gathered neighbourhoods so
    the point-sharded path (``parallel.sp.pointconv_sp``) can run the kNN +
    gather against an all-gathered reference set per query shard.
    """

    nsample: int
    out_channel: int
    weightnet: int = 8

    def setup(self):
        self.wn = WeightNet(self.weightnet, name="weightnet")
        self.linear = nn.Dense(self.out_channel, dtype=compute_dtype(), name="linear")

    def __call__(self, xyz, feat):
        """xyz: (B, N, 3); feat: (B, N, D) -> (B, N, out)."""
        idx = ops.knn(self.nsample, xyz, xyz)
        rows = ops.group(jnp.concatenate([xyz, feat], axis=-1), idx)
        return _pointconv_core(self.wn, self.linear, xyz, rows)

    def grouped(self, query_xyz, grouped_xyz, grouped_feat):
        rows = jnp.concatenate(
            [grouped_xyz, grouped_feat.astype(grouped_xyz.dtype)], axis=-1
        )
        return _pointconv_core(self.wn, self.linear, query_xyz, rows)


class PointConvD(nn.Module):
    """Downsampling PointConv: FPS to ``npoint`` then grouped conv
    (ref ``mocopci.py:1349-1396``).

    ``grouped`` exposes the aggregation core on pre-gathered neighbourhoods
    for the point-sharded forward, which runs FPS on the gathered cloud and
    the grouped conv per query shard (parallel/sp_forward.py).
    """

    npoint: int
    nsample: int
    out_channel: int
    weightnet: int = 8

    def setup(self):
        self.wn = WeightNet(self.weightnet, name="weightnet")
        self.linear = nn.Dense(self.out_channel, dtype=compute_dtype(), name="linear")

    def __call__(self, xyz, feat, fps_idx=None):
        """xyz: (B, N, 3); feat: (B, N, D) -> (new_xyz (B,npoint,3), out (B,npoint,C)).

        ``fps_idx`` lets the caller supply precomputed FPS indices — the
        encoder samples its whole xyz pyramid in one fused Pallas launch
        (``ops.farthest_point_sample_pyramid``) instead of one FPS kernel
        per level.
        """
        if fps_idx is None:
            fps_idx = ops.farthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather(xyz, fps_idx)
        idx = ops.knn(self.nsample, xyz, new_xyz)
        rows = ops.group(jnp.concatenate([xyz, feat], axis=-1), idx)
        return new_xyz, _pointconv_core(self.wn, self.linear, new_xyz, rows)

    def grouped(self, query_xyz, grouped_xyz, grouped_feat):
        rows = jnp.concatenate(
            [grouped_xyz, grouped_feat.astype(grouped_xyz.dtype)], axis=-1
        )
        return _pointconv_core(self.wn, self.linear, query_xyz, rows)
