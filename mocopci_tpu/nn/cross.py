"""Cost-volume / correlation layers (flax, channels-last).

  - ``CrossLayerFeatCosine`` ≙ ``CrossLayerLightFeatCosine``
    (ref ``models/pointconv_util.py:718-791``): dual-kNN cost volume — half the
    neighbours by cosine distance in *feature* space, half by Euclidean
    distance in xyz — grouped ``feat2 + feat1 + pos(direction)`` → conv MLP →
    max-pool over neighbours.
  - ``BidirectionalLayerFeatCosine`` (ref ``pointconv_util.py:874-930``):
    symmetric cross feature update.  NOTE the reference's Euclidean half uses
    ``pytorch3d.knn_points(xyz2, xyz1)`` (``pointconv_util.py:910``), i.e. it
    queries from the *second* cloud into the first — the opposite direction of
    ``CrossLayer``'s ``knn_point(k, xyz2, xyz1)``.  The network was trained
    with this, so we reproduce it bit-for-bit (both clouds have equal size on
    every call site, so shapes line up).
  - ``FlowEmbeddingLayer`` (ref ``pointconv_util.py:1107-1161``).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mocopci_tpu import ops
from mocopci_tpu.nn.basic import LEAKY_RATE, ConvLReLU, compute_dtype


def _dual_knn_indices(
    k_half: int,
    xyz1: jax.Array,
    xyz2: jax.Array,
    knn1: jax.Array,
    knn2: jax.Array,
    idx_cos: jax.Array = None,
) -> jax.Array:
    """Concatenated cosine-feature + Euclidean-xyz neighbour indices (B,N1,2k).

    ``idx_cos`` may be passed in when the cosine half was already computed for
    the same (knn1, knn2) features — the bid and fe layers inside one decoder
    stage use identical feature-space queries (``pointconv_util.py:909, 1145``),
    and the warped-frame loop repeats them 3× with unchanged features.
    """
    if idx_cos is None:
        idx_cos = ops.knn_cosine(k_half, knn2, knn1)
    idx_euc = ops.knn(k_half, xyz2, xyz1)
    return jnp.concatenate([idx_cos, idx_euc], axis=-1)


def _cross_core(
    pos: nn.Dense,
    mlp: Sequence[ConvLReLU],
    xyz1: jax.Array,
    xyz2: jax.Array,
    points1: jax.Array,
    points2: jax.Array,
    idx: jax.Array,
) -> jax.Array:
    """Shared grouped-correlation body: gather, pos-encode, MLP, max-pool.

    The position encoding is linear, so ``pos(neighbor − x1) = pos(neighbor)
    − pos(x1) + bias``: computing ``pos`` on the reference cloud FIRST and
    gathering the encoded rows (same row count, wider rows — TPU gathers are
    row-rate bound) eliminates the (B, N1, 2k, 3) direction tensor, whose
    3/128-lane layout made the subtract and the pos matmul cost ~30x their
    bytes on v5e.
    """
    # The pos Dense MUST run in float32: it encodes absolute coordinates
    # (|xyz| can be tens of units on NL-Drive) and the small direction
    # encoding is recovered by subtracting two near-equal values, so bf16's
    # ~8 mantissa bits would leave O(|pos(xyz)|/|pos(dir)| · 2^-8) relative
    # error in the result.  f32 keeps the cancellation at ~2^-24.
    #
    # pos(neighbor) and points2 are summed per pair anyway, so gather their
    # SUM: one gathered tensor instead of two halves the post-gather
    # elementwise passes, the backward's gradient merge (add_any), and the
    # slice copies of the concat-gather — the query-side terms are
    # k-independent and hoist out of the pair tensor entirely.
    pos2 = pos(xyz2.astype(jnp.float32))                      # (B,M,C) with bias
    tab = pos2 + points2.astype(jnp.float32)                  # (B,M,C)
    bias = pos.variables["params"]["bias"]
    base = (
        points1.astype(jnp.float32)
        - (pos(xyz1.astype(jnp.float32)) - bias)
    )                                                         # (B,N1,C)

    cdt = compute_dtype()
    if len(mlp) == 1 and cdt == jnp.float32 and xyz1.shape[1] >= 1024:
        # every live call site (bid/fe at up_1/up_2, cross3) has exactly one
        # post-gather ConvLReLU — on TPU the add→leaky→dense→leaky→max tail
        # runs as ONE fused Pallas sweep per direction (k-major rows, the
        # running max never leaves VMEM; custom VJP recomputes tiles instead
        # of materializing the (B, N1, k, C) activations — see
        # ops/pallas/cross_tail.py).  Gated to N1 ≥ 1024: measured wins only
        # at the up_1 shape (6.26→6.02 ms fwd+bwd); at cross3 (S=256) the
        # fused path LOSES 0.6 ms and at up_2 the eval forward is 0.5 ms
        # worse (scripts/cross_tail_check.py) — small grids don't amortize
        # the sweep.  The XLA twin below is the same arithmetic and serves
        # CPU + the bf16/multi-layer/small-N fallback.
        _ = mlp[0](jnp.zeros((1, 1, tab.shape[-1]), cdt))     # create params
        cp = mlp[0].variables["params"]["conv"]
        w1 = cp["kernel"].astype(jnp.float32)
        b1 = cp["bias"].astype(jnp.float32)
        B, K = idx.shape[0], idx.shape[-1]
        idx_km = idx.transpose(0, 2, 1).reshape(B, -1)        # k-major flat

        def fused(tab, base):
            from mocopci_tpu.ops.pallas.cross_tail import cross_tail

            rows = ops.gather(tab, idx_km)                    # (B, k·N1, C)
            return cross_tail(rows, base, w1, b1, K)

        def xla(tab, base):
            (tg,) = ops.group_multi(idx, tab)
            x = nn.leaky_relu(tg + base[:, :, None, :], LEAKY_RATE)
            x = nn.leaky_relu(x @ w1 + b1, LEAKY_RATE)
            return jnp.max(x, axis=2)

        return jax.lax.platform_dependent(tab, base, tpu=fused, default=xla)

    (tg,) = ops.group_multi(idx, tab)                         # (B,N1,k,C)
    x = nn.leaky_relu(
        (tg + base[:, :, None, :]).astype(points2.dtype), LEAKY_RATE
    )
    for layer in mlp:
        x = layer(x)
    return jnp.max(x, axis=2)                                 # (B,N1,C)


class CrossLayerFeatCosine(nn.Module):
    """L3 cost volume (ref ``CrossLayerLightFeatCosine``).

    The live path only consumes the two directional features
    (``mocopci.py:851`` binds the third output to an unused name), so the
    ``pos2``/``mlp2`` fusion pass of the reference is not computed here.
    """

    nsample: int
    mlp1: Sequence[int]
    mlp2: Sequence[int]

    def setup(self):
        # f32 regardless of compute_dtype(): see the cancellation note in
        # _cross_core.
        self.pos1 = nn.Dense(self.mlp1[0], dtype=jnp.float32, name="pos1")
        self.cross_t11 = nn.Dense(self.mlp1[0], dtype=compute_dtype(), name="cross_t11")
        self.cross_t22 = nn.Dense(self.mlp1[0], dtype=compute_dtype(), name="cross_t22")
        self.mlp1_layers = [
            ConvLReLU(c, name=f"mlp1_{i}") for i, c in enumerate(self.mlp1[1:])
        ]
        self.cross_t1 = nn.Dense(self.mlp2[0], dtype=compute_dtype(), name="cross_t1")
        self.cross_t2 = nn.Dense(self.mlp2[0], dtype=compute_dtype(), name="cross_t2")

    def _dir(self, proj, pc_q, pc_r, feat_q, feat_r, knn_q, knn_r):
        """One directional pass: query rows of ``pc_q`` against cloud ``r``.

        Row-parallel over queries given the full reference cloud — the
        point-sharded forward passes a local query shard with all-gathered
        ``pc_r``/``feat_r``/``knn_r`` (parallel/sp_forward.py).
        """
        k = self.nsample // 2
        fq = self.cross_t11(feat_q)
        fr = self.cross_t22(feat_r)
        idx = _dual_knn_indices(k, pc_q, pc_r, knn_q, knn_r)
        out = _cross_core(self.pos1, self.mlp1_layers, pc_q, pc_r, fq, fr, idx)
        return proj(out)

    def dir1(self, pc1, pc2, feat1, feat2, knn1, knn2):
        return self._dir(self.cross_t1, pc1, pc2, feat1, feat2, knn1, knn2)

    def dir2(self, pc1, pc2, feat1, feat2, knn1, knn2):
        return self._dir(self.cross_t2, pc2, pc1, feat2, feat1, knn2, knn1)

    def __call__(self, pc1, pc2, feat1, feat2, knn1, knn2):
        feat1_new = self.dir1(pc1, pc2, feat1, feat2, knn1, knn2)
        feat2_new = self.dir2(pc1, pc2, feat1, feat2, knn1, knn2)
        return feat1_new, feat2_new


class BidirectionalLayerFeatCosine(nn.Module):
    """Symmetric cross feature update (ref ``pointconv_util.py:874-930``)."""

    nsample: int
    mlp: Sequence[int]

    def setup(self):
        self.pos = nn.Dense(self.mlp[0], dtype=jnp.float32, name="pos")
        self.cross_t11 = nn.Dense(self.mlp[0], dtype=compute_dtype(), name="cross_t11")
        self.cross_t22 = nn.Dense(self.mlp[0], dtype=compute_dtype(), name="cross_t22")
        self.mlp_layers = [
            ConvLReLU(c, name=f"mlp_{i}") for i, c in enumerate(self.mlp[1:])
        ]

    def one_direction(self, pc_q, pc_r, feat_q, feat_r, knn_q, knn_r,
                      idx_cos=None, pc_q_euc_ref=None, pc_r_euc_q=None):
        """feat_q_new: query rows of ``pc_q`` correlated against cloud ``r``.

        The Euclidean kNN half reproduces the reference's swapped query
        (``pytorch3d.knn_points(xyz2, xyz1)``, ``pointconv_util.py:910``):
        the reference set is THIS cloud and the queries are the OTHER cloud's
        rows — valid because both clouds have equal size on every call site.
        The point-sharded forward passes ``pc_q_euc_ref`` (this cloud, fully
        gathered, as the euclid reference) and ``pc_r_euc_q`` (the other
        cloud's LOCAL rows as euclid queries); both default to pc_q / pc_r.
        """
        k = self.nsample // 2
        if idx_cos is None:
            idx_cos = ops.knn_cosine(k, knn_r, knn_q)
        idx_euc = ops.knn(
            k,
            pc_q if pc_q_euc_ref is None else pc_q_euc_ref,
            pc_r if pc_r_euc_q is None else pc_r_euc_q,
        )
        idx = jnp.concatenate([idx_cos, idx_euc], axis=-1)
        return _cross_core(
            self.pos, self.mlp_layers, pc_q, pc_r,
            self.cross_t11(feat_q), self.cross_t22(feat_r), idx,
        )

    def __call__(self, pc1, pc2, feat1, feat2, knn1, knn2,
                 idx_cos_12=None, idx_cos_21=None):
        feat1_new = self.one_direction(
            pc1, pc2, feat1, feat2, knn1, knn2, idx_cos=idx_cos_12
        )
        feat2_new = self.one_direction(
            pc2, pc1, feat2, feat1, knn2, knn1, idx_cos=idx_cos_21
        )
        return feat1_new, feat2_new


class FlowEmbeddingLayer(nn.Module):
    """Motion embedding between pc1 and the warped pc2 (ref ``pointconv_util.py:1107-1161``)."""

    nsample: int
    mlp: Sequence[int]

    def setup(self):
        self.pos = nn.Dense(self.mlp[0], dtype=jnp.float32, name="pos")
        self.conv1 = nn.Dense(self.mlp[0], dtype=compute_dtype(), name="conv1")
        self.conv2 = nn.Dense(self.mlp[0], dtype=compute_dtype(), name="conv2")
        self.mlp_layers = [
            ConvLReLU(c, name=f"mlp_{i}") for i, c in enumerate(self.mlp[1:])
        ]

    def __call__(self, pc1, pc2, feat1, feat2, knn1, knn2, idx_cos=None):
        k = self.nsample // 2
        idx = _dual_knn_indices(k, pc1, pc2, knn1, knn2, idx_cos=idx_cos)
        return _cross_core(
            self.pos, self.mlp_layers, pc1, pc2,
            self.conv1(feat1), self.conv2(feat2), idx,
        )
