"""Point-dimension (sequence-parallel) sharded ops.

The reference has no sequence/context parallelism (SURVEY.md §5.7) — its point
counts stay bounded by the FPS pyramid.  For the dense stress configs
(16k-32k points) the natural TPU extension is sharding the *point* axis over
the mesh's ``model`` axis: Chamfer/kNN-style reductions are embarrassingly
parallel over query points (each shard reduces over the full reference set),
so `shard_map` + a final mean/psum gives linear scaling with zero comms in the
hot loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mocopci_tpu.ops.distance import square_distance


def chamfer_distance_sp(mesh: Mesh, pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Bidirectional Chamfer with the point axis sharded over mesh axis 'model'.

    Both directions shard their query axis; the reference cloud is replicated.
    Per-shard work is a (N/p, M) min-reduction; the only collective is the
    final mean (psum of per-shard sums).
    """

    def directed(src, dst):
        # src sharded on points, dst replicated -> per-shard sum of min dists
        d = jnp.min(square_distance(src, dst), axis=-1)       # (B, N/p)
        return jax.lax.psum(jnp.sum(d, axis=1), "model")      # (B,) global sum

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "model", None), P(None, "model", None)),
        out_specs=P(),
        check_vma=False,
    )
    def _cham(p1, p2):
        n = p1.shape[1] * jax.lax.psum(1, "model")
        m = p2.shape[1] * jax.lax.psum(1, "model")
        p2_full = jax.lax.all_gather(p2, "model", axis=1, tiled=True)
        p1_full = jax.lax.all_gather(p1, "model", axis=1, tiled=True)
        d12 = directed(p1, p2_full) / n                       # (B,)
        d21 = directed(p2, p1_full) / m
        return jnp.mean(d12 + d21)

    return _cham(pc1, pc2)
