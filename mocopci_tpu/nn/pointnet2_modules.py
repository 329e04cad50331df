"""Stock PointNet++ set-abstraction / feature-propagation modules.

TPU-native equivalents of ``pointnet2/pointnet2_modules.py:10-160`` in the
reference (present there as part of the pointnet2 library; unused by the live
MoCoPCI path — provided for op-library feature parity).

  - ``QueryAndGroup`` ≙ ``pointnet2_utils.QueryAndGroup``
    (``pointnet2/pointnet2_utils.py:231-264``): radius ball query + grouping,
    relative coordinates concatenated with grouped features.
  - ``SetAbstraction`` ≙ ``PointnetSAModule``: FPS downsample, ball-query (or
    kNN) grouping, shared MLP, max-pool over the neighbourhood.
  - ``FeaturePropagation`` ≙ ``PointnetFPModule``: 3-NN inverse-distance
    feature interpolation, skip concatenation, shared MLP.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mocopci_tpu import ops


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: Optional[jax.Array] = None,
    use_xyz: bool = True,
) -> jax.Array:
    """Ball-query grouping (ref ``QueryAndGroup``): (B, S, K, 3[+C])."""
    idx = ops.ball_query(nsample, radius, xyz, new_xyz)
    grouped_xyz = ops.group(xyz, idx) - new_xyz[:, :, None, :]
    if features is None:
        return grouped_xyz
    grouped = ops.group(features, idx)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped], axis=-1)
    return grouped


class SetAbstraction(nn.Module):
    """FPS + grouping + shared MLP + max-pool (ref ``PointnetSAModule``)."""

    npoint: int
    nsample: int
    mlp: Sequence[int]
    radius: Optional[float] = None   # None -> kNN grouping

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        """xyz (B,N,3), features (B,N,C) -> (new_xyz (B,npoint,3), (B,npoint,mlp[-1]))."""
        fps_idx = ops.farthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather(xyz, fps_idx)
        if self.radius is not None:
            h = query_and_group(self.radius, self.nsample, xyz, new_xyz, features)
        else:
            idx = ops.knn(self.nsample, xyz, new_xyz)
            grouped_xyz = ops.group(xyz, idx) - new_xyz[:, :, None, :]
            if features is not None:
                h = jnp.concatenate([grouped_xyz, ops.group(features, idx)], axis=-1)
            else:
                h = grouped_xyz
        for i, c in enumerate(self.mlp):
            h = nn.relu(nn.Dense(c, name=f"mlp{i}")(h))
        return new_xyz, jnp.max(h, axis=2)


class FeaturePropagation(nn.Module):
    """3-NN interpolation + skip concat + shared MLP (ref ``PointnetFPModule``)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_dense, xyz_sparse, feat_dense, feat_sparse):
        """Propagate sparse features to the dense set.

        xyz_dense (B,N,3), xyz_sparse (B,S,3), feat_dense (B,N,C1) or None,
        feat_sparse (B,S,C2) -> (B, N, mlp[-1]).
        """
        interp = ops.upsample(xyz_dense, xyz_sparse, feat_sparse)
        h = (
            jnp.concatenate([interp, feat_dense], axis=-1)
            if feat_dense is not None
            else interp
        )
        for i, c in enumerate(self.mlp):
            h = nn.relu(nn.Dense(c, name=f"mlp{i}")(h))
        return h
