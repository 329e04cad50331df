"""3-NN inverse-distance interpolation, upsampling, and warping.

TPU-native equivalents of:
  - ``three_nn`` / ``three_interpolate`` (ref CUDA
    ``pointnet2/src/interpolate_gpu.cu:9-161``) — exposed as ``three_interpolate``
    for API completeness (the live model path re-implements the same math with
    dense kNN, which is what ``upsample`` below does).
  - ``UpsampleFlow`` (ref ``models/pointconv_util.py:1193-1212``)
  - ``PointWarping`` (ref ``models/pointconv_util.py:1163-1191``)

All functions are channels-last ``(B, N, C)`` and differentiable; the gathers'
backward pass is a deterministic segment-sum (vs. the reference's atomicAdd).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mocopci_tpu.ops.distance import knn
from mocopci_tpu.ops.sampling import group_multi


def _inverse_distance_weights(query_xyz: jax.Array, neigh: jax.Array) -> jax.Array:
    """1/d weights over k gathered neighbours (B,N,k,3), normalised; d >= 1e-10.

    Matches ``UpsampleFlow``'s ``torch.norm(...).clamp(min=1e-10)`` weighting
    (``pointconv_util.py:1205-1208``).
    """
    diff = neigh - query_xyz[:, :, None, :]
    # epsilon inside the sqrt: pyramid levels share exact points (FPS), and
    # sqrt at 0 has an infinite derivative that torch's norm masks but JAX
    # does not — clamping after the sqrt would still produce 0·inf = NaN grads.
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-20)
    dist = jnp.maximum(dist, 1e-10)
    w = 1.0 / dist
    return w / jnp.sum(w, axis=-1, keepdims=True)       # (B, N, k)


def upsample(
    dense_xyz: jax.Array, sparse_xyz: jax.Array, sparse_feat: jax.Array, k: int = 3
) -> jax.Array:
    """Interpolate per-point vectors from a sparse to a dense point set.

    Ref ``UpsampleFlow`` (``pointconv_util.py:1193-1212``): 3-NN in the sparse
    cloud around each dense point, inverse-distance weighted average.
    One fused gather serves both the weight computation and the features
    (TPU gathers are row-rate bound).

    Args:
      dense_xyz:  (B, N, 3)
      sparse_xyz: (B, S, 3)
      sparse_feat:(B, S, C)
    Returns:
      (B, N, C)
    """
    idx = knn(k, sparse_xyz, dense_xyz)
    neigh, feats = group_multi(idx, sparse_xyz, sparse_feat)
    w = _inverse_distance_weights(dense_xyz, neigh)
    return jnp.sum(w[..., None] * feats, axis=2)


def upsample_multi(
    dense_xyz: jax.Array,
    sparse_xyz: jax.Array,
    sparse_feats,
    k: int = 3,
):
    """Upsample SEVERAL fields living on the same sparse geometry at once.

    The reference calls ``UpsampleFlow`` separately for each per-frame flow and
    feature even though the (dense, sparse) geometry — and therefore the 3-NN
    indices and inverse-distance weights — is identical (``mocopci.py:864-878,
    930-944, 986-1007``).  One kNN + one fused gather serves them all.

    Args:
      sparse_feats: sequence of (B, S, C_i) arrays.
    Returns:
      list of (B, N, C_i) arrays.
    """
    idx = knn(k, sparse_xyz, dense_xyz)
    gathered = group_multi(idx, sparse_xyz, *sparse_feats)
    w = _inverse_distance_weights(dense_xyz, gathered[0])[..., None]
    return [jnp.sum(w * g, axis=2) for g in gathered[1:]]


def three_nn(unknown: jax.Array, known: jax.Array):
    """(dists, idx) of the 3 nearest ``known`` points per ``unknown`` point.

    API-parity twin of the CUDA ``three_nn`` (``interpolate_gpu.cu:9-68`` via
    ``pointnet2/pointnet2_utils.py:76-105``): returns the *l2* (sqrt'd)
    distances and int32 indices, non-differentiable like the original.

    Args:
      unknown: (B, N, 3) query points.
      known:   (B, M, 3) reference points.
    Returns:
      (dists (B, N, 3) f32, idx (B, N, 3) int32)
    """
    idx = knn(3, known, unknown)
    neigh = group_multi(idx, known)[0]
    diff = neigh - unknown[:, :, None, :]
    dists = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return jax.lax.stop_gradient(dists), idx


def three_interpolate(
    dense_xyz: jax.Array, sparse_xyz: jax.Array, sparse_feat: jax.Array
) -> jax.Array:
    """three_nn + three_interpolate equivalent (ref ``interpolate_gpu.cu:9-161``).

    The CUDA pair returns the 3-NN l2 distances/indices and a weighted gather;
    its only caller (dead ``models/layers.py:162``) uses normalised ``1/dist``
    weights — exactly the math of ``upsample`` above, which is also what the
    live model path uses for every level-to-level transfer.  Exposed for API
    completeness.
    """
    return upsample(dense_xyz, sparse_xyz, sparse_feat, k=3)


def point_warp(xyz1: jax.Array, xyz2: jax.Array, flow1: jax.Array) -> jax.Array:
    """Inverse warping of cloud 2 toward cloud 1's flow field.

    Ref ``PointWarping`` (``pointconv_util.py:1163-1191``): move ``xyz1`` by
    ``flow1``, find the 3 nearest moved points for every ``xyz2`` point,
    inverse-distance-average their flows, and pull ``xyz2`` back.

    Args:
      xyz1, xyz2: (B, N1, 3), (B, N2, 3)
      flow1: (B, N1, 3)
    Returns:
      warped xyz2: (B, N2, 3)
    """
    xyz1_to_2 = xyz1 + flow1
    idx = knn(3, xyz1_to_2, xyz2)
    neigh, flows = group_multi(idx, xyz1_to_2, flow1)
    w = _inverse_distance_weights(xyz2, neigh)
    flow2 = jnp.sum(w[..., None] * flows, axis=2)
    return xyz2 - flow2
