"""Radius (ball) query.

TPU-native equivalent of the ``ball_query`` CUDA kernel
(``pointnet2/src/ball_query_gpu.cu:9-67``): for each query point, the indices
of up to ``nsample`` reference points within ``radius``; slots after the k-th
hit are padded with the *first* hit (the CUDA kernel pre-fills the row with the
first in-radius index, ``ball_query_gpu.cu:39-46``).

Not on the live model path (the live path uses kNN throughout) — provided for
parity with the reference op library (``QueryAndGroup``,
``pointnet2/pointnet2_utils.py:231-264``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mocopci_tpu.ops.distance import square_distance


@functools.partial(jax.jit, static_argnums=(0,))
def ball_query(
    nsample: int, radius: float, ref: jax.Array, query: jax.Array
) -> jax.Array:
    """Args:
      nsample: max points per ball (static).
      radius: ball radius.
      ref:   (B, M, 3) points searched over.
      query: (B, N, 3) ball centres.
    Returns:
      (B, N, nsample) int32 indices into ``ref``; rows with no hit are all 0
      (matching the CUDA kernel's zero-init buffer).
    """
    d = square_distance(query, ref)                       # (B, N, M)
    in_ball = d < radius * radius
    M = ref.shape[1]
    pos = jnp.arange(M, dtype=jnp.int32)
    # order of first-k in-radius points by index, as the CUDA loop does
    rank = jnp.where(in_ball, pos[None, None, :], M)
    _, idx = jax.lax.top_k(-rank, nsample)                # k smallest indices
    idx = idx.astype(jnp.int32)
    hit = jnp.take_along_axis(in_ball, idx, axis=-1)
    first = idx[..., :1]                                  # first hit (or 0)
    any_hit = jnp.any(in_ball, axis=-1, keepdims=True)
    first = jnp.where(any_hit, first, 0)
    return jnp.where(hit, idx, first)
