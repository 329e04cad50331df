"""Sampling and gathering ops.

TPU-native equivalents of the ``pointnet2`` CUDA extension:
  - ``farthest_point_sample``  (ref kernel ``pointnet2/src/sampling_gpu.cu:93-253``)
  - ``gather``                 (ref ``gather_points`` kernel, ``sampling_gpu.cu:8-83``;
    autograd wrapper ``pointnet2/pointnet2_utils.py:39-73``)
  - ``group``                  (ref ``group_points`` kernel,
    ``pointnet2/src/group_points_gpu.cu:8-86``)

The CUDA gather/group backward passes are hand-written ``atomicAdd`` scatters;
here ``jnp.take_along_axis`` gives the identical (and deterministic) scatter-add
gradient through autodiff, so no custom VJP is needed.

FPS is inherently sequential (each step depends on the running min-distance
field).  The portable implementation below is a ``lax.scan`` whose body is a
fused distance-update + argmax — one compiled loop, no host round trips.  A
Pallas kernel that keeps the xyz tile and min-distance field resident in VMEM
is provided in ``mocopci_tpu.ops.pallas.fps`` and is used automatically on TPU.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnums=1)
def farthest_point_sample_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative farthest point sampling (portable XLA version).

    Semantics match the CUDA kernel exactly: the first sample is index 0
    (``sampling_gpu.cu:113-115``), the running min-distance buffer starts at
    1e10, and each step picks the argmax of the min-distance field (already
    selected points have distance 0 and are never re-picked).

    Args:
      xyz: (B, N, 3) float32 points.
      npoint: number of samples (static).
    Returns:
      (B, npoint) int32 indices.
    """
    B, N, _ = xyz.shape
    x32 = xyz.astype(jnp.float32)

    def step(carry, _):
        mind, last = carry
        last_xyz = jnp.take_along_axis(x32, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((x32 - last_xyz) ** 2, axis=-1)  # (B,N)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        return (mind, nxt), nxt

    init = (jnp.full((B, N), 1e10, jnp.float32), jnp.zeros((B,), jnp.int32))
    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)
    (_, _), rest = lax.scan(step, init, None, length=npoint - 1)
    return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), rest.T], axis=1)


def farthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """FPS dispatching to the Pallas kernel on TPU, XLA scan elsewhere.

    The dispatch uses ``lax.platform_dependent`` so it is resolved at lowering
    time for the backend the computation actually runs on (a jit may target
    CPU even when a TPU backend is registered, e.g. the virtual-mesh dry run).

    Index selection is non-differentiable (the CUDA original marks it
    non-diff too, ``pointnet2_utils.py:33-36``), so gradients are stopped at
    the input — this also keeps autodiff from trying to linearise through the
    Pallas kernel.
    """
    from mocopci_tpu.ops.pallas.fps import farthest_point_sample_pallas

    xyz = lax.stop_gradient(xyz)
    if os.environ.get("MOCOPCI_FPS") == "xla":  # kernel escape hatch
        return farthest_point_sample_xla(xyz, npoint)
    return jax.lax.platform_dependent(
        xyz,
        tpu=functools.partial(farthest_point_sample_pallas, npoint=npoint),
        default=functools.partial(farthest_point_sample_xla, npoint=npoint),
    )


def farthest_point_sample_pyramid(xyz: jax.Array, npoints) -> tuple:
    """Cascaded FPS: level l samples ``npoints[l]`` from the level-(l-1) subset.

    Returns a tuple of (B, npoints[l]) int32 index arrays, each addressing the
    PREVIOUS level's sampled cloud (level 0 addresses ``xyz``) — exactly the
    ``fps; gather; fps; …`` chain the reference encoder runs per level
    (``mocopci.py:424-436`` via ``PointConvD``), but on TPU the whole cascade
    is ONE Pallas launch with the intermediate clouds resident in VMEM
    (``ops.pallas.fps._fps_pyramid_kernel``).
    """
    from mocopci_tpu.ops.pallas.fps import farthest_point_sample_pyramid_pallas

    xyz = lax.stop_gradient(xyz)
    npoints = tuple(int(n) for n in npoints)

    def _seq(x):
        idxs = []
        pc = x
        for n in npoints:
            i = farthest_point_sample_xla(pc, n)
            pc = jnp.take_along_axis(pc, i[..., None], axis=1)
            idxs.append(i)
        return tuple(idxs)

    if xyz.shape[1] % 128 != 0 or os.environ.get("MOCOPCI_FPS") == "xla":
        # tiny/odd shapes: the Pallas path needs N % 128 == 0 (lane tiling)
        def _seq_native(x):
            idxs = []
            pc = x
            for n in npoints:
                i = farthest_point_sample(pc, n)
                pc = jnp.take_along_axis(pc, i[..., None], axis=1)
                idxs.append(i)
            return tuple(idxs)

        return _seq_native(xyz)
    return jax.lax.platform_dependent(
        xyz,
        tpu=functools.partial(farthest_point_sample_pyramid_pallas,
                              npoints=npoints),
        default=_seq,
    )


@jax.custom_vjp
def _flat_row_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather with batch folded into the index.

    XLA's batched ``take_along_axis`` lowers ~2.5× slower per row on TPU than a
    single flat row gather, so the batch offset is folded into the indices and
    one ``take`` over the flattened rows is emitted.  Indices come from
    kNN / FPS / 3-NN selection and are in bounds by construction; the default
    fill mode would append a select_n pass over the whole gathered tensor
    (~0.6 ms per big gather on v5e), so clip mode clamps the (small) index
    vector instead.

    The gradient is a custom VJP doing ONE deterministic scatter-add PER BATCH
    ELEMENT: above ~2M flattened updates XLA's scatter emitter switches to a
    sort-based path (the fusion-head scatter went 10.6 → 43.4 ms from B=1 to
    B=2); per-element scatters stay on the vectorized read-modify-write path
    and scale linearly.

    Args: points (B, N, C); idx (B, ...) int32.  Returns (B, ..., C).
    """
    B, N, C = points.shape
    off = jnp.arange(B, dtype=jnp.int32).reshape((B,) + (1,) * (idx.ndim - 1)) * N
    flat = jnp.take(
        points.reshape(B * N, C),
        (idx + off).reshape(-1),
        axis=0,
        mode="clip",
    )
    return flat.reshape(idx.shape + (C,))


def _flat_row_gather_fwd(points, idx):
    return _flat_row_gather(points, idx), (idx, points.shape)


def _flat_row_gather_bwd(res, g):
    idx, (B, N, C) = res
    g2 = g.reshape(B, -1, C)
    i2 = idx.reshape(B, -1)
    S = i2.shape[1]

    def loop_scatter(g2, i2):
        # NOTE (measured, r3): a single flat scatter under the 2M cliff is NOT
        # faster — at 491k×3 (batched loss) it cost 19.9 ms and at 1M×35
        # (encoder L0 grouping) 14.4 ms vs a few ms for the per-element loop;
        # XLA's TPU scatter emitter is slow at any size, it just gets *worse*
        # past ~2M/element.  The loop stays.
        #
        # NOTE (measured, r3b): routing C=3 gathers through the Pallas one-hot
        # accumulation kernel (``ops.pallas.scatter.onehot_scatter_rows``) is
        # an O(S·N) multiply-reduce — it wins where S ≈ N (chamfer_pair's own
        # VJP, which keeps it), but at the fusion gather shape (S = N·2k =
        # 524k rows into N = 8192) it cost 91 ms vs 5 ms for this loop and
        # regressed the B=2 train step 244 → 314 ms.  Do not route row-gather
        # backwards through it.
        grads = [
            jnp.zeros((N, C), g2.dtype).at[i2[b]].add(
                g2[b], mode="drop", unique_indices=False
            )
            for b in range(B)
        ]
        return jnp.stack(grads)

    # Large-S small-C scatters (the fusion-head and loss gathers) go through
    # the radix-factorized MXU kernel: XLA's scatter emitter costs ~6 ns/row
    # (3.2 ms per 524k-row group; 19.4 ms of the B=2 train step), while the
    # bucket kernel runs the same contraction as Wᵀ@V matmuls (see
    # ``ops/pallas/scatter_bucket.py``).  Gates: lane-radix needs N % 128
    # == 0; S ≥ 32k is where the kernel overtakes the loop; the MAC count
    # scales with (N/128)·C·S, so wider channels are admitted only at
    # smaller tables — C ≤ 4 up to N=16384 (fusion/loss gathers), C ≤ 160
    # at N ≤ 2048 (the up-level cross/bid/fe gathers at C=64/128 and the
    # point-transformer's [xyz|k|v] table at C=131: H·C ≤ 2560 keeps the
    # accumulator + W tile in VMEM and the MACs ~0.2 ms vs 1-2 ms of
    # XLA scatter).
    if (
        N % 128 == 0
        and S >= 32768
        and (C <= 4 and N <= 16384 or C <= 160 and N <= 2048)
    ):
        from mocopci_tpu.ops.pallas.scatter_bucket import bucket_scatter_add

        def tpu_scatter(g2, i2):
            out = bucket_scatter_add(g2.astype(jnp.float32), i2, N)
            return out.astype(g2.dtype)

        grad = lax.platform_dependent(
            g2, i2, tpu=tpu_scatter, default=loop_scatter
        )
    else:
        grad = loop_scatter(g2, i2)
    return grad, None


_flat_row_gather.defvjp(_flat_row_gather_fwd, _flat_row_gather_bwd)


# ---------------------------------------------------------------------------
# Batch-parallel gather mode for data-parallel meshes.
#
# The flat-index gather above folds the batch offset INTO the index values —
# the fastest single-chip formulation, but opaque to the SPMD partitioner:
# with the batch axis sharded it must all-gather the table and replicate all
# downstream compute (measured on the 8-device virtual mesh: per-device
# flops grow 1.72x from 1 -> 8 devices at the 256-pt tiny model, dominated
# by 50 MB pair-row all-gathers — runs/dp_device_cost_256.json).  The
# batched formulation keeps the batch dimension explicit (take_along_axis /
# vmapped scatter), which XLA SPMD partitions as a parallel gather/scatter.
# Trace-time switch, enabled by the train CLI when the data mesh axis > 1.
# ---------------------------------------------------------------------------

_BATCHED_GATHER = os.environ.get("MOCOPCI_BATCHED_GATHER") == "1"


def set_batched_gather(enabled: bool) -> None:
    """Batch-parallel gather/scatter formulation (trace-time switch)."""
    global _BATCHED_GATHER
    _BATCHED_GATHER = bool(enabled)


@jax.custom_vjp
def _batched_row_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    B, N, C = points.shape
    i2 = jnp.clip(idx.reshape(B, -1), 0, N - 1)
    out = jnp.take_along_axis(points, i2[..., None], axis=1)
    return out.reshape(idx.shape + (C,))


def _batched_row_gather_fwd(points, idx):
    return _batched_row_gather(points, idx), (idx, points.shape)


def _batched_row_gather_bwd(res, g):
    idx, (B, N, C) = res
    g2 = g.reshape(B, -1, C)
    i2 = idx.reshape(B, -1)

    def one(g_b, i_b):
        return jnp.zeros((N, C), g2.dtype).at[i_b].add(
            g_b, mode="drop", unique_indices=False
        )

    return jax.vmap(one)(g2, i2), None


_batched_row_gather.defvjp(_batched_row_gather_fwd, _batched_row_gather_bwd)


def _row_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    if _BATCHED_GATHER:
        return _batched_row_gather(points, idx)
    return _flat_row_gather(points, idx)


def gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows: (B, N, C) x (B, S) -> (B, S, C).

    Equivalent of ``index_points_gather`` (``models/pointconv_util.py:168-179``)
    without the channels-first round trip.
    """
    return _row_gather(points, idx.astype(jnp.int32))


def group(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Grouped gather: (B, N, C) x (B, S, K) -> (B, S, K, C).

    Equivalent of ``index_points_group`` (``models/pointconv_util.py:181-192``),
    the workhorse behind every kNN grouping in the reference.
    """
    return _row_gather(points, idx.astype(jnp.int32))


def group_multi(idx: jax.Array, *arrays: jax.Array):
    """Gather several (B, N, C_i) arrays with the SAME (B, S, K) indices.

    TPU gathers are row-rate bound (~2 cycles/row regardless of row width), so
    concatenating channels first and gathering once is ~len(arrays)× cheaper
    than separate gathers.  Returns one (B, S, K, C_i) array per input.
    """
    if len(arrays) == 1:
        return (group(arrays[0], idx),)
    widths = [a.shape[-1] for a in arrays]
    cat = jnp.concatenate(arrays, axis=-1)
    g = group(cat, idx)
    out, off = [], 0
    for w in widths:
        out.append(g[..., off : off + w])
        off += w
    return tuple(out)


def downsample_fps(points: jax.Array, npoint: int) -> jax.Array:
    """FPS + gather, ref ``downsampling`` (``mocopci.py:1099-1104``), (B,N,3)->(B,npoint,3)."""
    return gather(points, farthest_point_sample(points, npoint))
