"""MXU/VPU one-hot scatter-add: the TPU replacement for XLA's scatter emitter.

``onehot_scatter_rows`` computes ``out[g, :, o] += Σ_s v[g, s, :]·1[idx[g, s]
== o]`` — the gradient of a row gather — as a Pallas multiply-reduce tile
oriented (source rows on sublanes, output columns on lanes).  XLA's TPU
scatter emitter is slow at every size (measured 19.9 ms for ONE 491k×3 flat
scatter; a 60-element per-batch ``.at[].add`` loop still ~8 ms), while this
tile sweep runs at VPU rate.

Load-bearing for two gradient paths (ref semantics: the CUDA kernels'
``atomicAdd`` scatters, e.g. ``group_points_gpu.cu:24`` — here deterministic):
  - the bidirectional Chamfer pair kernel's VJP (``chamfer_pair.py``),
  - every C=3 row-gather backward on TPU (``ops/sampling.py``: fusion pair
    planes, warps, loss gathers).

Out-of-range targets never match any output column — the drop-mode semantics
the gather VJP needs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

TO = 512   # output tile (columns per grid step)
TS = 512   # source tile (value rows per grid step)


def _scatter_kernel(ns_t, v_ref, idx_ref, out_ref):
    """out[g, :, o] += Σ_s v[g, :, s]·1[idx[g, s] == o]  — MXU one-hot scatter.

    Grid (G, OUT/TO, S/TS), s innermost; out block (1, 3, TO) revisited
    across the s sweep.
    """
    o = pl.program_id(1)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    v = v_ref[0]                                        # (ts, 3) value ROWS
    idx = idx_ref[0]                                    # (ts, 1) int32
    ts = v.shape[0]
    to = out_ref.shape[2]
    # VPU multiply-reduce per channel: an MXU dot here pads the 3-row
    # operand to 128 and (at fp32-exact precision) runs 6 passes — ~250×
    # the useful FLOPs (measured 8.7 ms for one scatter).  Tile oriented
    # (ts sublanes, to lanes): idx/v broadcast from sublane vectors, the
    # sum reduces over sublanes straight into lane-major (3, to) rows.
    targets = o * to + lax.broadcasted_iota(jnp.int32, (ts, to), 1)
    hit = idx == targets                                # (ts, to) bool
    acc = [
        jnp.sum(jnp.where(hit, v[:, c : c + 1], 0.0), axis=0)  # (to,)
        for c in range(3)
    ]
    out_ref[0] += jnp.stack(acc, axis=0)                # (3, to)


def onehot_scatter_rows(
    v: jax.Array, idx: jax.Array, out_size: int, interpret: bool = False
) -> jax.Array:
    """(G,S,3) value rows + (G,S) int32 targets -> (G,3,out_size) sums."""
    G, S, _ = v.shape
    ts = min(TS, S)
    to = min(TO, out_size)
    assert S % ts == 0 and out_size % to == 0, (S, out_size)
    kern = functools.partial(_scatter_kernel, S // ts)
    return pl.pallas_call(
        kern,
        grid=(G, out_size // to, S // ts),
        in_specs=[
            pl.BlockSpec((1, ts, 3), lambda g, o, s: (g, s, 0)),
            pl.BlockSpec((1, ts, 1), lambda g, o, s: (g, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, to), lambda g, o, s: (g, 0, o)),
        out_shape=jax.ShapeDtypeStruct((G, 3, out_size), jnp.float32),
        interpret=interpret,
    )(v, idx[:, :, None])
