"""Fused Pallas kNN: distance tiles on the fly + streaming top-k in VMEM.

Replaces the three-stage XLA pipeline (materialize the (B, N, M) distance
matrix in HBM -> ``lax.approx_min_k`` PartialReduce -> select-k kernel) with a
single pass (ref op: ``knn_point``, ``models/pointconv_util.py:129-140``).
At 8192^2 the dense pipeline moves ~0.75 GB of HBM traffic per call and the
full matrix forces batch=1 to be throughput-optimal; here nothing bigger than
a (TQ, TR) tile ever exists.

Algorithm (per query tile of TQ rows):
  1. stream reference tiles of TR points; compute the distance tile with one
     MXU contraction;
  2. pack each distance and its global ref index into ONE uint32 key — the
     distance is non-negative, so its f32 bit pattern is order-preserving, and
     the low ``ceil(log2 M)`` mantissa bits are replaced by the index.  The
     streaming top-k state is then a single per-column min:
     ``bins[q, j] = min over tiles of key[q, j]`` (one VPU pass per tile) —
     the same candidate structure the TPU PartialReduce unit produces
     (``aggregate_to_topk=False``);
  3. after the last tile, fold the TR bin columns into per-lane-column top-3
     survivors (pure elementwise mins/maskings across TR/128 slabs — no lane
     crossing), then extract the k smallest keys from the (TQ, 384) candidate
     set by iterative min-extraction — with packed keys each extraction is one
     min-reduce plus one masked update (keys are unique by construction).  The
     fold cuts the extraction working set ~2.7x; it can only lose a neighbour
     when >= 4 of the true top-k collide in one column mod 128 (measured
     overlap vs the unfolded extraction: 0.9998 at 8192^2/k=32).  The fold is
     applied only when M > TR, so the M <= TR regime keeps its exactness
     guarantee (up to the packing quantisation).

For small point dimensionality (C <= 8, i.e. xyz) the distance tile is
computed as an explicit sum of squared differences on the VPU — a (TQ, C)
x (C, TR) MXU contraction pads C to the systolic width and runs 6 passes at
HIGHEST precision, which is slower than 3C elementwise ops.

Accuracy: like ``lax.approx_min_k`` this is approximate when M > TR — a true
neighbour is lost only if a *closer* point lands in the same bin column.
``MOCOPCI_KNN_WIDEN=1`` widens the ref tile to cover 1024 < M <= 2·tr in one
exact pass (see ``fused_knn_pallas``); off by default — measured 2-3x kernel
latency at the band call sites for a 0.993 -> 1.0 recall gain.
Expected recall for k neighbours out of L=TR bins is ~1 - (k-1)/(2L) ≈ 0.985
for k=32, L=1024 (>= the 0.95 default of the XLA path it replaces); exact when
M <= TR up to the packing quantisation: stealing ``ceil(log2 M)`` mantissa
bits quantises distances to ~2^-10 relative at M=8192, which can only swap
near-exact ties — every live consumer is permutation-invariant over the
neighbour set (see ops/distance.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dist_tile(metric: str, q, r_ref, rn_ref):
    """Distance tile (TQ, TR) for one query tile x one ref tile."""
    C = q.shape[-1]
    TQ = q.shape[0]
    TR = rn_ref.shape[-1]
    if metric == "euclidean" and C <= 8:
        # xyz-scale C: explicit expansion on the VPU beats a padded MXU pass.
        # The ref tile arrives as lane-dense (C, TR) PLANES: with a (TR, C)
        # row tile every r[:, c] read is a sublane->lane relayout of 1024
        # values (C=3 occupies 3/128 lanes), which dominated the kernel —
        # planes make it a free (1, TR) slice (measured: see knn_micro).
        d = jnp.zeros((TQ, TR), jnp.float32)
        for c in range(C):
            diff = q[:, c : c + 1] - r_ref[0, c][None, :]
            d = d + diff * diff
        return d
    # distance tile: one MXU contraction.  Precision HIGHEST: the default
    # bf16 MXU pass gives ~1e-1 absolute error on squared distances,
    # enough to reorder neighbours (see ops/distance.py).
    dot = lax.dot_general(
        q,
        r_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if metric == "euclidean":
        qn = jnp.sum(q * q, axis=-1, keepdims=True)        # (TQ, 1)
        return qn + rn_ref[0] - 2.0 * dot
    return 1.0 - dot


def _knn_kernel(k: int, M: int, TR: int, idx_bits: int, metric: str,
                q_ref, r_ref, rn_ref, out_ref, bins):
    TQ = q_ref.shape[1]
    m_idx = pl.program_id(2)
    n_m = pl.num_programs(2)
    idx_mask = jnp.int32((1 << idx_bits) - 1)

    @pl.when(m_idx == 0)
    def _init():
        bins[:, :] = jnp.full((TQ, TR), 0x7FFFFFFF, jnp.int32)

    d = _dist_tile(metric, q_ref[0], r_ref, rn_ref)
    # d >= 0 mathematically, so its f32 bit pattern is order-preserving under
    # signed int compare.  fp rounding can make a true-zero distance slightly
    # negative; its bit pattern then sorts *first*, which is still correct
    # membership (it IS a nearest neighbour) and consumers are
    # permutation-invariant over the k set, so no clamp is needed.

    col = lax.broadcasted_iota(jnp.int32, (TQ, TR), dimension=1)
    gcol = col + m_idx * TR
    key = (lax.bitcast_convert_type(d, jnp.int32) & ~idx_mask) | gcol
    if M % TR != 0:
        key = jnp.where(gcol < M, key, jnp.int32(0x7FFFFFFF))
    bins[:, :] = jnp.minimum(bins[:, :], key)

    @pl.when(m_idx == n_m - 1)
    def _select():
        kpad = out_ref.shape[-1]
        out_col = lax.broadcasted_iota(jnp.int32, (TQ, kpad), dimension=1)
        INF = jnp.int32(0x7FFFFFFF)

        S = TR // 128
        out0 = jnp.zeros((TQ, kpad), jnp.int32)
        if S >= 4 and 3 * 128 >= k and M > TR:
            # fold S slabs of 128 columns into per-column top-3 survivors:
            # elementwise across slabs, no lane crossing.  A neighbour is
            # lost only when >= 4 of the top-k collide in one column mod 128.
            # Skipped when M <= TR: there each bin column holds exactly one
            # reference point, so the unfolded extraction is exact (up to key
            # quantisation) and the fold would *introduce* collision loss.
            slabs = [bins[:, s * 128 : (s + 1) * 128] for s in range(S)]
            m1 = slabs[0]
            for s in slabs[1:]:
                m1 = jnp.minimum(m1, s)
            rest = [jnp.where(s == m1, INF, s) for s in slabs]
            m2 = rest[0]
            for s in rest[1:]:
                m2 = jnp.minimum(m2, s)
            rest = [jnp.where(s == m2, INF, s) for s in rest]
            m3 = rest[0]
            for s in rest[1:]:
                m3 = jnp.minimum(m3, s)

            # 3-slab TOURNAMENT extraction: the fold leaves each column
            # sorted (m1 <= m2 <= m3), so the global minimum of the remaining
            # candidates always sits in the head slab — each of the k
            # extractions is a min-reduce over 128 lanes (not 384) plus a
            # shift-down of the one consumed column (keys are unique, so the
            # equality mask fires in exactly one lane per row).  Candidate
            # set identical to the former concatenated loop; ~3x less VPU
            # work per iteration (measured: see scripts/knn_micro.py).
            # fully unrolled (k is static): the fori_loop's per-iteration
            # scheduling overhead dominated the short vector bodies
            h, s2, s3, out = m1, m2, m3, out0
            for i in range(k):
                m = jnp.min(h, axis=1, keepdims=True)          # (TQ, 1)
                picked = m & idx_mask
                out = jnp.where(out_col == i, picked, out)
                hit = h == m
                h = jnp.where(hit, s2, h)
                s2 = jnp.where(hit, s3, s2)
                s3 = jnp.where(hit, INF, s3)
        else:
            def body(i, carry):
                b, out = carry
                m = jnp.min(b, axis=1, keepdims=True)          # (TQ, 1)
                picked = m & idx_mask
                out = jnp.where(out_col == i, picked, out)
                b = jnp.where(b == m, INF, b)                  # keys are unique
                return b, out

            _, out = lax.fori_loop(0, k, body, (bins[:, :], out0))
        out_ref[0] = out


def fused_knn_pallas(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    metric: str = "euclidean",
    tq: int = 256,
    tr: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """k nearest reference points per query, streaming over the ref axis.

    With MOCOPCI_KNN_WIDEN=1 (read at trace time, like the other kernel
    hatches) and 1024 < M <= 2·tr, the ref tile widens to cover M in one pass
    — the small-M exact regime: every reference point gets its own bin column
    (exact up to the packing quantisation).  Covers the 1024 < M <= 2048 call
    sites (encoder level 2, the L1 correlation layers, the refine-head point
    transformer) that otherwise take the fold's collision loss.  OFF by
    default: the wide tile skips the fold3 tournament, so extraction runs
    k min-reduces over 2048 lanes instead of 128 — measured 2-3x kernel
    latency at the band shapes (0.018->0.77 ms at 2048x2048/k=16,
    0.64->1.79 ms at 8192x2048/k=16, 0.78->2.49 ms at 6x2048x2048/k=32 on
    v5e) for a 0.993 -> 1.0 recall gain that every live consumer is
    insensitive to (permutation-invariant neighbour sets, approx mode is the
    documented default — see ops/distance.py).

    Args:
      query: (B, N, C) fp32.  For metric="cosine" pass pre-normalised rows.
      ref:   (B, M, C) fp32 (pre-normalised for cosine).
      k: number of neighbours (static, <= min(M, tr)).
      metric: "euclidean" | "cosine".
    Returns:
      (B, N, k) int32 indices into ref, ascending distance.
    """
    M = ref.shape[1]
    if tr < M <= 2 * tr and os.environ.get("MOCOPCI_KNN_WIDEN") == "1":
        tr = 2 * tr
    return _fused_knn_call(query, ref, k, metric, tq, tr, interpret)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _fused_knn_call(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    metric: str,
    tq: int,
    tr: int,
    interpret: bool,
) -> jax.Array:
    assert metric in ("euclidean", "cosine"), metric
    B, N, C = query.shape
    M = ref.shape[1]
    assert k <= M, (k, M)
    tq = min(tq, _round_up(N, 8))
    tr = min(tr, _round_up(M, 128))
    assert k <= tr, (k, tr)
    idx_bits = max((M - 1).bit_length(), 1)

    npad = _round_up(N, tq)
    mpad = _round_up(M, tr)
    kpad = _round_up(k, 128)
    q = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, npad - N), (0, 0)))
    r = jnp.pad(ref.astype(jnp.float32), ((0, 0), (0, mpad - M), (0, 0)))
    if metric == "euclidean":
        rn = jnp.sum(r * r, axis=-1)[:, None, :]  # (B, 1, mpad)
    else:
        rn = jnp.zeros((B, 1, mpad), jnp.float32)
    planes = metric == "euclidean" and C <= 8
    if planes:
        # lane-dense (B, C, mpad) coordinate planes (see kernel comment)
        r = r.transpose(0, 2, 1)
        r_spec = pl.BlockSpec((1, C, tr), lambda b, n, m: (b, 0, m),
                              memory_space=pltpu.VMEM)
    else:
        r_spec = pl.BlockSpec((1, tr, C), lambda b, n, m: (b, m, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_knn_kernel, k, M, tr, idx_bits, metric)
    out = pl.pallas_call(
        kernel,
        grid=(B, npad // tq, mpad // tr),
        in_specs=[
            pl.BlockSpec((1, tq, C), lambda b, n, m: (b, n, 0),
                         memory_space=pltpu.VMEM),
            r_spec,
            pl.BlockSpec((1, 1, tr), lambda b, n, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, kpad), lambda b, n, m: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npad, kpad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tq, tr), jnp.int32),
        ],
        interpret=interpret,
    )(q, r, rn)
    return out[:, :N, :k]


# ---------------------------------------------------------------------------
# Exact-mode kernel: reference top-k semantics at full resolution.
# ---------------------------------------------------------------------------

def _exact_knn_kernel(k: int, M: int, TR: int, metric: str,
                      q_ref, r_ref, rn_ref, out_ref, dmat):
    """Streaming exact kNN: distance tiles accumulate into a full-row VMEM
    scratch; extraction is k lexicographic (distance, column) min-reductions.

    Unlike ``_knn_kernel`` nothing is packed — distances stay full f32 and
    ties are broken by the *numeric* column compare, so the selected set AND
    order are bit-identical to ``lax.top_k(-d, k)`` (which also prefers the
    lower index on ties).  Loss-free by construction: every candidate row is
    materialised (TQ x Mpad f32 in VMEM, e.g. 4 MB at TQ=128/M=8192), and
    each of the k extractions scans the whole row with the mask
    ``(d, col) > (g, gi)`` — previously extracted pairs are exactly the
    lexicographic prefix, so no destructive masking (and no second scratch
    write pass) is needed.
    """
    TQ = q_ref.shape[1]
    m_idx = pl.program_id(2)
    n_m = pl.num_programs(2)

    d = _dist_tile(metric, q_ref[0], r_ref, rn_ref)
    if M % TR != 0:
        # padded ref points sit at the origin — mask them out of the tile
        col = lax.broadcasted_iota(jnp.int32, d.shape, dimension=1) + m_idx * TR
        d = jnp.where(col < M, d, jnp.float32(jnp.inf))
    dmat[:, pl.ds(m_idx * TR, TR)] = d

    @pl.when(m_idx == n_m - 1)
    def _select():
        # NOTE(round 5): a fold-based extraction (per-column sorted top-5
        # survivors + tournament + flagged full-scan fallback) was built and
        # interpret-verified, but its Mosaic HARDWARE compile ran >20 min at
        # 8192² (fori over 10-array carry + dynamic lane slices) — reverted
        # to this simple form, which compiles in normal time and measures
        # 9.8 ms at 8192²/k=32 (2.6x the approx kernel, 2.6x faster than
        # chunked-XLA exact).
        Mp = dmat.shape[1]
        dall = dmat[:, :]
        cols = lax.broadcasted_iota(jnp.int32, (TQ, Mp), dimension=1)
        kpad = out_ref.shape[-1]
        out_col = lax.broadcasted_iota(jnp.int32, (TQ, kpad), dimension=1)
        INF = jnp.float32(jnp.inf)
        IMAX = jnp.int32(0x7FFFFFFF)
        g = jnp.full((TQ, 1), -INF)
        gi = jnp.full((TQ, 1), -1, jnp.int32)
        out = jnp.zeros((TQ, kpad), jnp.int32)
        # unrolled (k static): each iteration is two row-wide reductions —
        # ascending extraction means the already-taken pairs are exactly
        # those lexicographically <= (g, gi)
        for i in range(k):
            valid = (dall > g) | ((dall == g) & (cols > gi))
            m = jnp.min(jnp.where(valid, dall, INF), axis=1, keepdims=True)
            sel = valid & (dall == m)
            idx = jnp.min(jnp.where(sel, cols, IMAX), axis=1, keepdims=True)
            out = jnp.where(out_col == i, idx, out)
            g, gi = m, idx
        out_ref[0] = out


# scratch budget for the full-row distance matrix: 4 MB of the ~16 MB VMEM
# (input/output blocks are double-buffered on top of this)
_EXACT_SCRATCH_ELEMS = 1 << 20
# above this ref width the (TQ, Mpad) scratch would drop TQ below a sublane
# row — callers fall back to the blocked XLA merge (ops/distance.py)
EXACT_MAX_M = 65536


def exact_knn_pallas(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    metric: str = "euclidean",
    tq: int = 0,
    tr: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Exact k nearest reference points per query (reference semantics).

    The exact counterpart of ``fused_knn_pallas`` — same streamed distance
    tiles, but selection is loss-free: full f32 distances, (distance, column)
    lexicographic order, identical set and order to ``lax.top_k(-d, k)``.
    Replaces the chunked XLA sort-merge exact path at production sizes
    (whole-model forward 326.6 -> 86.8 ms at 8192 points on v5e; the kernel
    itself: 9.8 ms vs 25.9 ms chunked-XLA at 8192^2/k=32, bit-equal to
    ``lax.top_k`` over the same distance formula on all 8192 rows — see
    ``scripts/exact_knn_check.py``).
    Ref op: ``torch.topk(d, k, largest=False)``,
    ``models/pointconv_util.py:129-140``.

    Args:
      query: (B, N, C) fp32.  For metric="cosine" pass pre-normalised rows.
      ref:   (B, M, C) fp32 (pre-normalised for cosine), M <= EXACT_MAX_M.
      k: number of neighbours (static, k <= M).
      metric: "euclidean" | "cosine".
      tq: query tile rows; 0 = auto from the VMEM scratch budget.
    Returns:
      (B, N, k) int32 indices into ref, ascending (distance, index).
    """
    M = ref.shape[1]
    if tq == 0:
        tq = max(8, min(256, _EXACT_SCRATCH_ELEMS // _round_up(M, 128)))
    return _exact_knn_call(query, ref, k, metric, tq, tr, interpret)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _exact_knn_call(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    metric: str,
    tq: int,
    tr: int,
    interpret: bool,
) -> jax.Array:
    assert metric in ("euclidean", "cosine"), metric
    B, N, C = query.shape
    M = ref.shape[1]
    assert k <= M, (k, M)
    assert M <= EXACT_MAX_M, (M, EXACT_MAX_M)
    tq = min(tq, _round_up(N, 8))
    tr = min(tr, _round_up(M, 128))

    npad = _round_up(N, tq)
    mpad = _round_up(M, tr)
    kpad = _round_up(k, 128)
    q = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, npad - N), (0, 0)))
    r = jnp.pad(ref.astype(jnp.float32), ((0, 0), (0, mpad - M), (0, 0)))
    if metric == "euclidean":
        rn = jnp.sum(r * r, axis=-1)[:, None, :]  # (B, 1, mpad)
    else:
        rn = jnp.zeros((B, 1, mpad), jnp.float32)
    planes = metric == "euclidean" and C <= 8
    if planes:
        r = r.transpose(0, 2, 1)
        r_spec = pl.BlockSpec((1, C, tr), lambda b, n, m: (b, 0, m),
                              memory_space=pltpu.VMEM)
    else:
        r_spec = pl.BlockSpec((1, tr, C), lambda b, n, m: (b, m, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_exact_knn_kernel, k, M, tr, metric)
    out = pl.pallas_call(
        kernel,
        grid=(B, npad // tq, mpad // tr),
        in_specs=[
            pl.BlockSpec((1, tq, C), lambda b, n, m: (b, n, 0),
                         memory_space=pltpu.VMEM),
            r_spec,
            pl.BlockSpec((1, 1, tr), lambda b, n, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, kpad), lambda b, n, m: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npad, kpad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tq, mpad), jnp.float32),
        ],
        interpret=interpret,
    )(q, r, rn)
    return out[:, :N, :k]
