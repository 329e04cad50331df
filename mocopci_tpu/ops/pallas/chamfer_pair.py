"""Bidirectional 1-NN Chamfer kernel with a matmul-scatter VJP.

The training loss is ~33 Chamfer terms (ref ``train.py:135-160``); batched
into one launch they still cost ~23 ms forward (generic kNN kernel run twice
per pair, once per direction) plus ~8 ms of XLA scatter-adds in the backward
(B≈60 per-element loop).  This kernel exploits two structural facts:

  1. both Chamfer directions share ONE distance evaluation: the (N, M)
     distance tile yields the row minima (pc1→pc2) and the column minima
     (pc2→pc1) in the same sweep — half the distance work of two directed
     1-NN queries;
  2. the backward scatter ``d_dst[m] += Σ_{n: argmin(n)=m} v_n`` is a
     matmul against an on-the-fly one-hot matrix: ``out += v · 1[idx==m]``
     runs on the MXU (precision HIGHEST, exact for fp32 inputs) instead of
     XLA's scatter emitter (which is slow at every size on TPU — measured
     19.9 ms for a single 491k×3 flat scatter, ~8 ms as a 60-element loop).

Semantics match ``pytorch3d.loss.chamfer_distance``'s squared-distance
bidirectional form as used by ``chamfer_loss`` (ref ``models/utils.py:36-45``):
per-query min over the other cloud, recomputed EXACTLY from the selected
neighbour outside the kernel.  Selection uses the packed distance+index key
(idx in the low ``ceil(log2 M)`` mantissa bits, ~2^-10 relative quantisation
at M=8192) — among near-ties a marginally farther neighbour may win, the same
caveat as the fused kNN kernel (``ops/chamfer.py:_directed_min`` docstring).

Distances are diff-then-square on the VPU: the |q|²+|r|²−2q·r matmul form
cancels catastrophically for near neighbours (coordinates ~32 units, nearest
distances ~1e-2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mocopci_tpu.ops.pallas.scatter import TO, TS  # scatter tile sizes

TQ = 256   # query tile (pc1 points per grid step; kNN-kernel-proven shape)
TM = 1024  # reference tile (pc2 points per grid step)

_IMAX = 0x7F7FFFFF  # +inf-ish packed key (f32 max bit pattern), python int


def supported(n: int, m: int) -> bool:
    """True when (N=n, M=m) clouds tile onto this kernel's grid.

    Mirrors the static asserts of ``_pair_keys`` (query/reference tiles)
    and ``_onehot_scatter`` (both sizes appear as scatter source and
    output).  Callers fall back to the generic directed-min path otherwise.
    """
    for size, tile in ((n, TQ), (m, TM), (n, TS), (m, TS), (n, TO), (m, TO)):
        t = min(tile, size)
        if size % t or t % 8:
            return False
    # the colfold lane slice is addressed at multiples of the m-tile —
    # Mosaic requires provable 128-lane alignment, so a sub-128 reference
    # tile (tiny configs on hardware) cannot compile
    if min(TM, m) % 128:
        return False
    return True


def _pack(d, col, idx_mask):
    """Pack distance (f32, >=0) and index into one sortable int32 key."""
    return (lax.bitcast_convert_type(d, jnp.int32) & ~idx_mask) | col


def _pair_kernel(nm_t, idx_bits, p1_ref, p2_ref, k12_ref, k21_ref,
                 bins, colfold):
    """Grid (G, N/TQ, M/TM), m innermost.

    p1_ref: (1, tq, 3) query rows; p2_ref: (1, 3, tm) reference planes.
    Row side (pc1→pc2): ``bins`` (tq, tm) scratch takes ONE elementwise
    packed-key min per step (the kNN kernel's PartialReduce pattern — m-tiles
    fold onto the same columns, the embedded global index keeps them
    distinguishable); reduced over lanes once per q-tile into k12 (1, tq, 1).
    Col side (pc2→pc1): the tile is folded 512→8 sublanes (~1 extra pass)
    into the ``colfold`` (8, M) scratch; the final 8→1 min runs outside in
    XLA.  No per-step cross-lane reductions, no dynamic-slice read-modify
    -writes on big buffers — both made a first version of this kernel slower
    than two directed kNN sweeps.
    """
    q = pl.program_id(1)
    m = pl.program_id(2)
    idx_mask = jnp.int32((1 << idx_bits) - 1)

    @pl.when(m == 0)
    def _init_bins():
        bins[:, :] = jnp.full(bins.shape, _IMAX, jnp.int32)

    @pl.when(jnp.logical_and(q == 0, m == 0))
    def _init_colfold():
        colfold[:, :] = jnp.full(colfold.shape, _IMAX, jnp.int32)

    p1 = p1_ref[0]                                     # (tq, 3) query ROWS
    p2 = p2_ref[0]                                     # (3, tm) ref PLANES
    tq = p1.shape[0]
    tm = p2.shape[1]
    dx = p1[:, 0:1] - p2[0][None, :]
    dy = p1[:, 1:2] - p2[1][None, :]
    dz = p1[:, 2:3] - p2[2][None, :]
    d = dx * dx + dy * dy + dz * dz                    # (tq, tm)

    cols = m * tm + lax.broadcasted_iota(jnp.int32, (tq, tm), 1)
    bins[:, :] = jnp.minimum(bins[:, :], _pack(d, cols & idx_mask, idx_mask))

    rows = q * tq + lax.broadcasted_iota(jnp.int32, (tq, tm), 0)
    kcol = _pack(d, rows & idx_mask, idx_mask).reshape(tq // 8, 8, tm)
    colfold[:, pl.ds(m * tm, tm)] = jnp.minimum(
        colfold[:, pl.ds(m * tm, tm)], jnp.min(kcol, axis=0)
    )

    @pl.when(m == nm_t - 1)
    def _flush_row():
        k12_ref[0] = jnp.min(bins[:, :], axis=1, keepdims=True)

    @pl.when(jnp.logical_and(q == pl.num_programs(1) - 1, m == nm_t - 1))
    def _flush_col():
        k21_ref[0] = colfold[:, :]


def _pair_keys(pc1: jax.Array, pc2_t: jax.Array, interpret: bool = False):
    """(G,N,3) rows x (G,3,M) planes -> packed argmin keys ((G,N), (G,M))."""
    G, N, _ = pc1.shape
    M = pc2_t.shape[2]
    tq = min(TQ, N)
    tm = min(TM, M)
    assert N % tq == 0 and M % tm == 0 and tq % 8 == 0, (N, M)
    idx_bits = max((max(N, M) - 1).bit_length(), 1)
    grid = (G, N // tq, M // tm)
    kern = functools.partial(_pair_kernel, M // tm, idx_bits)
    k12, k21 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, 3), lambda g, q, m: (g, q, 0)),
            pl.BlockSpec((1, 3, tm), lambda g, q, m: (g, 0, m)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, 1), lambda g, q, m: (g, q, 0)),
            pl.BlockSpec((1, 8, M), lambda g, q, m: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, 1), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, M), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((min(TQ, N), min(TM, M)), jnp.int32),
            pltpu.VMEM((8, M), jnp.int32),
        ],
        interpret=interpret,
    )(pc1, pc2_t)
    return k12[:, :, 0], jnp.min(k21, axis=1)


# One-hot scatter tile: promoted to its own module (it now also serves the
# generic C=3 row-gather backward in ops/sampling.py); re-exported here for
# the VJP below and existing callers.
from mocopci_tpu.ops.pallas.scatter import (  # noqa: E402
    onehot_scatter_rows as _onehot_scatter,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chamfer_pair(pc1: jax.Array, pc2: jax.Array, interpret: bool = False):
    """Both directed per-point min squared distances in one kernel sweep.

    Args:  pc1 (G, N, 3), pc2 (G, M, 3); N, M multiples of 512.
    Returns: (d12 (G, N), d21 (G, M)) — exact values for the selected
    neighbours (see module docstring for the near-tie selection caveat).
    """
    d12, d21, _, _, _, _ = _chamfer_pair_fwd_impl(pc1, pc2, interpret)
    return d12, d21


def _chamfer_pair_fwd_impl(pc1, pc2, interpret=False):
    from mocopci_tpu.ops.sampling import gather

    G, N, _ = pc1.shape
    M = pc2.shape[1]
    idx_bits = max((max(N, M) - 1).bit_length(), 1)
    mask = (1 << idx_bits) - 1
    k12, k21 = _pair_keys(
        lax.stop_gradient(pc1),
        lax.stop_gradient(pc2).transpose(0, 2, 1),
        interpret,
    )
    i12 = k12 & mask
    i21 = k21 & mask
    near12 = lax.stop_gradient(gather(pc2, i12))        # (G, N, 3)
    near21 = lax.stop_gradient(gather(pc1, i21))        # (G, M, 3)
    diff12 = pc1 - near12
    diff21 = pc2 - near21
    d12 = jnp.sum(diff12 * diff12, axis=-1)
    d21 = jnp.sum(diff21 * diff21, axis=-1)
    return d12, d21, diff12, diff21, i12, i21


def _chamfer_pair_fwd(pc1, pc2, interpret=False):
    d12, d21, diff12, diff21, i12, i21 = _chamfer_pair_fwd_impl(
        pc1, pc2, interpret
    )
    return (d12, d21), (diff12, diff21, i12, i21, pc2.shape[1])


def _chamfer_pair_bwd(interpret, res, g):
    diff12, diff21, i12, i21, M = res
    g12, g21 = g
    N = diff12.shape[1]
    v12 = (2.0 * g12)[..., None] * diff12               # (G, N, 3)
    v21 = (2.0 * g21)[..., None] * diff21               # (G, M, 3)
    if N % 128 == 0 and M % 128 == 0:
        # radix-bucket MXU scatter (3-term exact split): the O(S·N) one-hot
        # multiply-reduce cost 9.9 ms for the 30-group full-res loss sweep,
        # the bucket contraction 3.1 (scripts log, docs/DESIGN.md round 3g)
        from mocopci_tpu.ops.pallas.scatter_bucket import bucket_scatter_add

        d_pc1 = v12 - bucket_scatter_add(v21, i21, N, 3, interpret)
        d_pc2 = v21 - bucket_scatter_add(v12, i12, M, 3, interpret)
    else:
        s21 = _onehot_scatter(v21, i21, N, interpret)   # (G, 3, N)
        s12 = _onehot_scatter(v12, i12, M, interpret)   # (G, 3, M)
        d_pc1 = v12 - s21.transpose(0, 2, 1)
        d_pc2 = v21 - s12.transpose(0, 2, 1)
    return d_pc1, d_pc2


chamfer_pair.defvjp(_chamfer_pair_fwd, _chamfer_pair_bwd)
