"""Chamfer distance — the training loss of the reference.

Replaces ``pytorch3d.loss.chamfer_distance`` as used by ``chamfer_loss``
(ref ``models/utils.py:36-45``): bidirectional squared-distance Chamfer,
mean over points in each direction, the two directions summed, then mean over
the batch.

Two implementations:
  - ``chamfer_distance``: dense (B, N, M) distance matrix; XLA fuses the min
    reduction into the matmul epilogue.  Fine up to 8192² per batch element.
  - ``chamfer_distance_blocked``: chunks the query axis with ``lax.map`` so the
    peak memory is (B, block, M); used for stress sizes (16k-32k points).

Both are differentiable (min picks the argmin subgradient, identical to the
reference's autograd behaviour).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from mocopci_tpu.ops.distance import square_distance


def _directed_min(src: jax.Array, dst: jax.Array) -> jax.Array:
    """min over dst of squared distance, per src point: (B, N).

    On TPU this runs as a 1-NN query through the fused Pallas kNN kernel
    plus a row gather, then recomputes the distance exactly from the matched
    pair.  Exactness caveat: the kernel packs the candidate index into the
    low ceil(log2 M) mantissa bits of the distance key (~2^-10 relative
    quantisation at M=8192), so among near-ties (relative gap below that
    bound) it may select a neighbour marginally farther than the true argmin;
    the recomputed distance is then exact for the *selected* pair but can
    exceed the true min by the tie gap.  This is why TPU-vs-dense parity
    assertions carry a ~1e-3 relative tolerance.  The dense
    (B, N, M) matrix + min/argmin reduction cost ~3.5 ms per direction at
    8192² in the training loss, the 1-NN form ~1 ms, and autodiff through
    the gather reproduces the same argmin subgradient as min().
    """

    def nn_path(src, dst):
        from mocopci_tpu.ops.pallas.knn import fused_knn_pallas
        from mocopci_tpu.ops.sampling import gather

        idx = fused_knn_pallas(
            lax.stop_gradient(src), lax.stop_gradient(dst), 1
        )[..., 0]                                              # (B, N)
        nearest = gather(dst, idx)                             # (B, N, 3)
        diff = src - nearest
        return jnp.sum(diff * diff, axis=-1)

    def dense_path(src, dst):
        return jnp.min(square_distance(src, dst), axis=-1)

    return lax.platform_dependent(src, dst, tpu=nn_path, default=dense_path)


def _pair_means(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Per-sample bidirectional Chamfer (B,) — one shared distance sweep.

    TPU (tileable sizes): the ``chamfer_pair`` Pallas kernel computes BOTH
    directed minima from one (N, M) distance evaluation and its VJP scatters
    via one-hot accumulation tiles (ops/pallas/chamfer_pair.py).  Elsewhere
    (and for sizes off the kernel's grid): two directed mins.
    """
    from mocopci_tpu.ops.pallas import chamfer_pair as cp

    def default_path(pc1, pc2):
        return jnp.mean(_directed_min(pc1, pc2), axis=1) + jnp.mean(
            _directed_min(pc2, pc1), axis=1
        )

    if not cp.supported(pc1.shape[1], pc2.shape[1]):
        return default_path(pc1, pc2)

    def tpu_path(pc1, pc2):
        d12, d21 = cp.chamfer_pair(pc1, pc2)
        return jnp.mean(d12, axis=1) + jnp.mean(d21, axis=1)

    return lax.platform_dependent(pc1, pc2, tpu=tpu_path, default=default_path)


@jax.jit
def chamfer_distance(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Bidirectional Chamfer distance, scalar (batch mean).

    Args:
      pc1: (B, N, 3)
      pc2: (B, M, 3)
    """
    return jnp.mean(_pair_means(pc1, pc2))


@jax.jit
def chamfer_distance_per_sample(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Per-sample bidirectional Chamfer: (B,). Used by the eval loop."""
    return _pair_means(pc1, pc2)


def chamfer_many(pairs) -> jax.Array:
    """Batch-mean Chamfer for MANY same-shape pairs in ONE kernel launch.

    The reference loss (``train.py:135-160``) makes ~33 separate
    ``chamfer_loss`` calls per step (per frame × per scale × fwd/bwd); as
    individual 1-NN queries those cost ~66 small Pallas launches whose fixed
    overhead dominates at the pyramid sizes (measured ~42 ms of
    ``fused_knn_pallas`` per B=2 train step, most of it launch-bound).  Here
    all pairs of one shape fold into a single (2·K·B) 1-NN launch: queries
    are [preds; gts], references [gts; preds], so both Chamfer directions
    ride the same kernel call.

    Args:
      pairs: sequence of (pc1 (B, N, 3), pc2 (B, N, 3)) — identical shapes.
    Returns:
      (K,) — ``chamfer_distance(pc1, pc2)`` per pair.
    """
    K = len(pairs)
    B = pairs[0][0].shape[0]
    src = jnp.concatenate([p for p, _ in pairs], axis=0)   # (KB, N, 3)
    dst = jnp.concatenate([q for _, q in pairs], axis=0)   # (KB, M, 3)

    from mocopci_tpu.ops.pallas import chamfer_pair as cp

    if not cp.supported(src.shape[1], dst.shape[1]):
        per = _pair_means(src, dst)
        return jnp.mean(per.reshape(K, B), axis=-1)

    def tpu_path(src, dst):
        d12, d21 = cp.chamfer_pair(src, dst)
        return jnp.mean(d12, axis=1) + jnp.mean(d21, axis=1)

    def default_path(src, dst):
        # dense (N, M) per element, sequential over the folded batch so the
        # peak is one matrix (the all-at-once dense path would be
        # KB·N² floats)
        def one(sd):
            dmat = square_distance(sd[0][None], sd[1][None])[0]
            return jnp.mean(jnp.min(dmat, axis=-1)) + jnp.mean(
                jnp.min(dmat, axis=-2)
            )

        return lax.map(one, (src, dst))

    per = lax.platform_dependent(src, dst, tpu=tpu_path, default=default_path)
    return jnp.mean(per.reshape(K, B), axis=-1)            # (K,)


@functools.partial(jax.jit, static_argnums=2)
def chamfer_distance_blocked(pc1: jax.Array, pc2: jax.Array, block: int = 2048) -> jax.Array:
    """Memory-bounded Chamfer for large clouds.

    Chunks the query axis so only a (B, block, M) slab is live at a time.
    N and M must be multiples of ``block`` divisors; static shapes only.
    """

    def directed(src, dst):
        B, N, _ = src.shape
        nb = max(N // block, 1)
        chunks = src.reshape(B, nb, N // nb, 3).transpose(1, 0, 2, 3)

        def one(chunk):  # (B, n_c, 3)
            return jnp.min(square_distance(chunk, dst), axis=-1)

        mins = lax.map(one, chunks)  # (nb, B, n_c)
        return jnp.mean(mins.transpose(1, 0, 2).reshape(B, N), axis=1)

    return jnp.mean(directed(pc1, pc2) + directed(pc2, pc1))
