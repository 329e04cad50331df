"""Point-dimension (sequence-parallel) sharded ops.

The reference has no sequence/context parallelism (SURVEY.md §5.7) — its point
counts stay bounded by the FPS pyramid.  For the dense stress configs
(16k-32k points) the natural TPU extension shards the *point* axis over the
mesh's ``model`` axis: each device owns a query shard and the reference cloud
(and its features) are all-gathered ONCE per op over ICI — after that single
collective, the kNN / grouping / reduction work is embarrassingly parallel
over query points, so the O(N·M) inner loop scales linearly with the axis
size.  Comms cost per op: one ``all_gather`` of the (B, M/p, C) shard.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mocopci_tpu import ops
from mocopci_tpu.ops.distance import square_distance

# Every public function here builds jit(shard_map(...)) and caches it on its
# static arguments (Mesh and flax Modules are hashable).  Eager shard_map
# dispatch would bypass BOTH the in-process jit cache (the closure is rebuilt
# per call) and the persistent compilation cache — measured 10-50x process
# wall-time overhead on the CPU mesh for the composed forward.


@functools.lru_cache(maxsize=None)
def _cham_jit(mesh: Mesh):
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

    return jax.jit(_cham)


def chamfer_distance_sp(mesh: Mesh, pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Bidirectional Chamfer with the point axis sharded over mesh axis 'model'.

    Both directions shard their query axis; each device all-gathers the other
    cloud once, then reduces its (B, N/p, M) block locally.  Collectives: two
    all_gathers up front plus the final psum of per-shard partial sums.
    """
    return _cham_jit(mesh)(pc1, pc2)


def knn_sp(mesh: Mesh, k: int, ref: jax.Array, query: jax.Array) -> jax.Array:
    """k-NN with the query point axis sharded over the mesh 'model' axis.

    The reference set is all-gathered once; each shard then runs the local
    (blocked / fused) kNN against the full reference cloud.  Returns GLOBAL
    indices into ``ref``, identical to ``ops.knn(k, ref, query)``.

    Args:
      ref:   (B, M, C) — sharded on points like query (gathered internally).
      query: (B, N, C) — N must divide by the 'model' axis size.
    """
    return _knn_jit(mesh, k)(ref, query)


@functools.lru_cache(maxsize=None)
def _knn_jit(mesh: Mesh, k: int):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "model", None), P(None, "model", None)),
        out_specs=P(None, "model", None),
        check_vma=False,
    )
    def _knn(ref_s, query_s):
        ref_full = jax.lax.all_gather(ref_s, "model", axis=1, tiled=True)
        return ops.knn(k, ref_full, query_s)

    return jax.jit(_knn)


def pointconv_sp(mesh: Mesh, module, variables, xyz: jax.Array, feat: jax.Array):
    """Same-resolution PointConv forward with the point axis sharded.

    This is the stress-config (16k-32k pts) version of the encoder's grouped
    conv: queries sharded over 'model', parameters replicated, and the
    reference cloud + features all-gathered once; the kNN, neighbour gather,
    WeightNet, and aggregation all run on the local query shard.  Numerically
    identical to ``module(xyz, feat)`` unsharded.

    Args:
      module: a ``mocopci_tpu.nn.PointConv`` instance.
      variables: its (replicated) parameter pytree.
      xyz: (B, N, 3); feat: (B, N, D) — N divisible by the 'model' axis size.
    Returns:
      (B, N, out) sharded like the inputs.
    """
    return _pointconv_jit(mesh, module)(variables, xyz, feat)


@functools.lru_cache(maxsize=None)
def _pointconv_jit(mesh: Mesh, module):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "model", None), P(None, "model", None)),
        out_specs=P(None, "model", None),
        check_vma=False,
    )
    def _apply(v, xyz_s, feat_s):
        xyz_full = jax.lax.all_gather(xyz_s, "model", axis=1, tiled=True)
        feat_full = jax.lax.all_gather(feat_s, "model", axis=1, tiled=True)
        idx = ops.knn(module.nsample, xyz_full, xyz_s)
        gx, gf = ops.group_multi(idx, xyz_full, feat_full)
        return module.apply(v, xyz_s, gx, gf, method="grouped")

    return jax.jit(_apply)


def upsample_sp(
    mesh: Mesh,
    dense_xyz: jax.Array,
    sparse_xyz: jax.Array,
    sparse_feat: jax.Array,
    k: int = 3,
) -> jax.Array:
    """Point-sharded 3-NN inverse-distance upsampling (``ops.upsample``).

    The DENSE (query) axis is sharded over 'model'; the sparse field — always
    the smaller pyramid level — is all-gathered once.  This is the remaining
    hot op of a point-sharded stress forward: every level-to-level flow /
    feature upsample and the final L1->L0 lift run through it.

    Args:
      dense_xyz:  (B, N, 3), N divisible by the 'model' axis size.
      sparse_xyz: (B, S, 3); sparse_feat: (B, S, C) — sharded like dense
        (gathered internally).
    Returns:
      (B, N, C) sharded on points like ``dense_xyz``.
    """
    return _upsample_jit(mesh, k)(dense_xyz, sparse_xyz, sparse_feat)


@functools.lru_cache(maxsize=None)
def _upsample_jit(mesh: Mesh, k: int):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, "model", None),
            P(None, "model", None),
            P(None, "model", None),
        ),
        out_specs=P(None, "model", None),
        check_vma=False,
    )
    def _up(dense_s, sparse_s, feat_s):
        sparse_full = jax.lax.all_gather(sparse_s, "model", axis=1, tiled=True)
        feat_full = jax.lax.all_gather(feat_s, "model", axis=1, tiled=True)
        return ops.upsample(dense_s, sparse_full, feat_full, k)

    return jax.jit(_up)
