"""Pairwise distances and k-nearest-neighbour selection.

TPU-native replacements for the dense kNN machinery of the reference:
  - ``square_distance``      (ref ``models/pointconv_util.py:92-97`` /
    ``models/m_models/mocopci.py:1130-1155``)
  - ``cosine_distance``      (ref ``models/pointconv_util.py:111-127``)
  - ``knn``/``knn_cosine``   (ref ``knn_point``/``knn_point_cosine``,
    ``models/pointconv_util.py:129-153``)

Everything is channels-last ``(B, N, C)`` and static-shaped, so the whole
pipeline stays on device.  The distance matrix is computed with one matmul
(MXU) plus rank-1 corrections; selection uses the TPU PartialReduce unit
(``approx_min_k``) by default with an exact ``top_k`` mode available — see
``set_knn_mode``.  The reference's ``torch.topk(..., sorted=False)`` returns
the same *set* of neighbours in unspecified order; every consumer on the live
path is permutation-invariant over the k axis (max-pool / softmax /
inverse-distance weighting), so sorted order here is semantically identical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distance.

    Args:
      src: (B, N, C)
      dst: (B, M, C)
    Returns:
      (B, N, M) squared distances.
    """
    # -2 src·dstᵀ rides the MXU; the squared-norm terms are rank-1 corrections
    # that XLA fuses into the same loop.  Precision HIGHEST keeps the matmul in
    # fp32 on TPU — kNN index selection is sensitive to distance error, and the
    # default bf16 pass gives ~1e-1 relative error on squared distances.
    d = -2.0 * jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = d + jnp.sum(src * src, axis=-1, keepdims=True)
    d = d + jnp.sum(dst * dst, axis=-1)[:, None, :]
    return d


def cosine_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """1 - cosine similarity with the reference's eps (=1e-8) normalisation."""
    src = src * jax.lax.rsqrt(jnp.sum(src * src, axis=-1, keepdims=True) + 1e-8)
    dst = dst * jax.lax.rsqrt(jnp.sum(dst * dst, axis=-1, keepdims=True) + 1e-8)
    return 1.0 - jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# Neighbour-selection backend.  ``lax.top_k`` lowers to a full sort on TPU
# (~48 ms for one 8192x8192/k=32 call on v5e); ``lax.approx_min_k`` uses the
# TPU's dedicated PartialReduce unit (~5 ms, recall 0.95) and is bit-exact on
# CPU.  The reference's own ``torch.topk(sorted=False)`` guarantees only the
# neighbour *set*, and every live consumer is permutation-invariant over k, so
# a 0.95-recall neighbour set is a principled TPU-native trade; set mode
# "exact" for parity runs.  The mode is read at trace time — set it before
# jit-tracing model functions.
_KNN_MODE = "approx"
_KNN_RECALL = 0.95


def set_knn_mode(mode: str, recall: float = 0.95) -> None:
    """mode: "approx" (TPU PartialReduce, default) or "exact" (full top-k)."""
    global _KNN_MODE, _KNN_RECALL
    assert mode in ("approx", "exact"), mode
    _KNN_MODE = mode
    _KNN_RECALL = recall


def _topk_min_indices(dists: jax.Array, k: int) -> jax.Array:
    """Indices of the k smallest entries along the last axis. (B, N, k) int32.

    k is clamped to the number of reference points (only reachable in tiny
    test configs; the production pyramid always has >= k points per level).

    On TPU in approx mode the selection runs in two stages: the PartialReduce
    unit produces ~1024 candidates per row (aggregate_to_topk=False — its
    built-in aggregation SORTS the candidate row, the single largest cost of
    the kNN pipeline), then the Pallas ``select_min_k`` kernel extracts the k
    smallest by iterative VMEM-resident min-extraction.  Dispatch uses
    ``lax.platform_dependent`` so it follows the backend the computation is
    lowered for, not the default platform.
    """
    k = min(k, dists.shape[-1])
    if _KNN_MODE != "approx":
        M = dists.shape[-1]
        # k <= 1024 guard: a chunk holding more than 1024 of the global top-k
        # would silently lose true neighbours in the per-chunk stage.
        if M > 2048 and M % 1024 == 0 and k <= 1024:
            # exact chunked merge: lax.top_k lowers to a full-width sort
            # (O(M log^2 M) per row); per-1024-chunk top-k + an exact top-k
            # over the nchunks*k survivors returns the identical set ~3x
            # faster at 8192 wide
            nc = M // 1024
            d = dists.reshape(dists.shape[:-1] + (nc, 1024))
            v, i = jax.lax.top_k(-d, min(k, 1024))           # (..., nc, k)
            base = (jnp.arange(nc, dtype=jnp.int32) * 1024)[:, None]
            i = i.astype(jnp.int32) + base
            v = v.reshape(dists.shape[:-1] + (-1,))
            i = i.reshape(dists.shape[:-1] + (-1,))
            _, sel = jax.lax.top_k(v, k)
            return jnp.take_along_axis(i, sel, axis=-1)
        _, idx = jax.lax.top_k(-dists, k)
        return idx.astype(jnp.int32)

    def tpu_path(d):
        vals, idx = jax.lax.approx_min_k(
            d, k, recall_target=_KNN_RECALL, aggregate_to_topk=False
        )
        if vals.shape[-1] > 2 * k:
            from mocopci_tpu.ops.pallas.select_k import select_min_k_pallas

            # index selection is non-differentiable; stop the gradient so
            # autodiff never tries to linearise through the Pallas kernel
            return select_min_k_pallas(jax.lax.stop_gradient(vals), idx, k)
        _, sel = jax.lax.top_k(-vals, k)
        return jnp.take_along_axis(idx, sel, axis=-1).astype(jnp.int32)

    def default_path(d):
        _, idx = jax.lax.approx_min_k(d, k, recall_target=_KNN_RECALL)
        return idx.astype(jnp.int32)

    return jax.lax.platform_dependent(dists, tpu=tpu_path, default=default_path)


# Above this many distance-matrix entries per batch element, the kNN switches
# to blockwise evaluation (the moral equivalent of blockwise attention —
# SURVEY.md §5.7): the query axis is chunked with lax.map, and very wide
# reference sets are additionally processed in chunks whose per-chunk top-k
# candidates are merged with an exact top-k.  Needed for the 16k-32k-point
# stress configs where a dense (N, M) matrix would not fit in HBM.
_DENSE_LIMIT = 1 << 26  # 64M entries = 256 MB fp32
_REF_CHUNK = 16384


def _select_blocked(dist_fn, k: int, ref: jax.Array, query: jax.Array) -> jax.Array:
    B, N, _ = query.shape
    M = ref.shape[1]
    k = min(k, M)
    if N * M <= _DENSE_LIMIT:
        return _topk_min_indices(dist_fn(query, ref), k)

    def one_chunk(q):  # (B, qb, C) -> (B, qb, k)
        if M <= _REF_CHUNK:
            return _topk_min_indices(dist_fn(q, ref), k)
        # chunk the reference axis too: per-chunk top-k candidates (using the
        # configured selection backend — a full sort per chunk would dominate
        # the stress configs), then an exact merge over the nchunks*k survivors
        n_r = -(-M // _REF_CHUNK)
        vals, idxs = [], []
        for j in range(n_r):
            lo = j * _REF_CHUNK
            hi = min(M, lo + _REF_CHUNK)
            d = dist_fn(q, ref[:, lo:hi])
            kk = min(k, hi - lo)
            if _KNN_MODE == "approx":
                v, i = jax.lax.approx_min_k(d, kk, recall_target=_KNN_RECALL)
                v = -v
            else:
                v, i = jax.lax.top_k(-d, kk)
            vals.append(v)
            idxs.append(i.astype(jnp.int32) + lo)
        vals = jnp.concatenate(vals, axis=-1)
        idxs = jnp.concatenate(idxs, axis=-1)
        _, sel = jax.lax.top_k(vals, k)
        return jnp.take_along_axis(idxs, sel, axis=-1)

    qb = max(_DENSE_LIMIT // max(M, 1), 128)
    if N <= qb:
        return one_chunk(query)
    n_q = -(-N // qb)
    pad = n_q * qb - N
    qpad = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
    chunks = qpad.reshape(B, n_q, qb, -1).transpose(1, 0, 2, 3)
    out = jax.lax.map(one_chunk, chunks)          # (n_q, B, qb, k)
    out = out.transpose(1, 0, 2, 3).reshape(B, n_q * qb, k)
    return out[:, :N]


def _knn_dispatch(metric: str, dist_fn, k: int, ref: jax.Array, query: jax.Array):
    """approx mode on TPU -> fused Pallas kernel (streams ref tiles, never
    materializes the (B, N, M) matrix in HBM); everywhere else -> dense/blocked
    XLA.  The fused kernel's per-column candidate bins are the same structure
    ``lax.approx_min_k`` produces, with recall ~0.985 at M=8192 (>= the 0.95
    XLA default)."""
    k = min(k, ref.shape[1])
    if _KNN_MODE != "approx":
        from mocopci_tpu.ops.pallas.knn import EXACT_MAX_M, exact_knn_pallas

        if ref.shape[1] > EXACT_MAX_M:
            return _select_blocked(dist_fn, k, ref, query)

        def tpu_exact(ref, query):
            if metric == "cosine":
                query = query * jax.lax.rsqrt(
                    jnp.sum(query * query, axis=-1, keepdims=True) + 1e-8
                )
                ref = ref * jax.lax.rsqrt(
                    jnp.sum(ref * ref, axis=-1, keepdims=True) + 1e-8
                )
            return exact_knn_pallas(
                jax.lax.stop_gradient(query), jax.lax.stop_gradient(ref), k, metric
            )

        def default_exact(ref, query):
            return _select_blocked(dist_fn, k, ref, query)

        return jax.lax.platform_dependent(
            ref, query, tpu=tpu_exact, default=default_exact
        )

    def tpu_path(ref, query):
        from mocopci_tpu.ops.pallas.knn import fused_knn_pallas

        if metric == "cosine":
            query = query * jax.lax.rsqrt(
                jnp.sum(query * query, axis=-1, keepdims=True) + 1e-8
            )
            ref = ref * jax.lax.rsqrt(
                jnp.sum(ref * ref, axis=-1, keepdims=True) + 1e-8
            )
        return fused_knn_pallas(
            jax.lax.stop_gradient(query), jax.lax.stop_gradient(ref), k, metric
        )

    def default_path(ref, query):
        return _select_blocked(dist_fn, k, ref, query)

    return jax.lax.platform_dependent(ref, query, tpu=tpu_path, default=default_path)


def knn(k: int, ref: jax.Array, query: jax.Array) -> jax.Array:
    """Euclidean k-NN: for each query point the k nearest reference points.

    Mirrors ``knn_point(nsample, xyz=ref, new_xyz=query)``
    (``models/pointconv_util.py:129-140``).  Automatically switches to
    blockwise evaluation at stress sizes.

    Args:
      k: number of neighbours (static).
      ref:   (B, M, C) points searched over.
      query: (B, N, C) query points.
    Returns:
      (B, N, k) int32 indices into ``ref``.
    """
    return _knn_dispatch("euclidean", square_distance, k, ref, query)


def knn_cosine(k: int, ref: jax.Array, query: jax.Array) -> jax.Array:
    """Cosine-distance k-NN in feature space.

    Mirrors ``knn_point_cosine`` (``models/pointconv_util.py:142-153``).
    """
    return _knn_dispatch("cosine", cosine_distance, k, ref, query)
