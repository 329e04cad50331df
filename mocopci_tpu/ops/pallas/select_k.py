"""Pallas kernel: exact k smallest from a per-row candidate set.

Replaces the aggregation step of ``lax.approx_min_k``: the TPU PartialReduce
unit cheaply produces ~1024 candidates per query, but its built-in aggregation
SORTS the full candidate row (~1.4 ms per 8192×1024 call — the single largest
cost in the kNN pipeline).  For k ≤ 32 an iterative min-extraction over a
VMEM-resident tile is ~3× cheaper: k passes of (row-min, masked-iota argmin,
mask-out), everything on the VPU, one HBM read of the candidates.

Returns indices in ascending-distance order (same as the sorted aggregation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 256  # rows per grid cell


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _select_k_kernel(k: int, vals_ref, idxs_ref, out_ref):
    # vals_ref/idxs_ref: (TR, L); out_ref: (TR, Kpad) i32
    L = vals_ref.shape[-1]
    kpad = out_ref.shape[-1]
    vals = vals_ref[:, :]
    idxs = idxs_ref[:, :]
    lane = lax.broadcasted_iota(jnp.int32, (_TR, L), dimension=1)
    out_col = lax.broadcasted_iota(jnp.int32, (_TR, kpad), dimension=1)

    def body(i, carry):
        vals, out = carry
        m = jnp.min(vals, axis=1, keepdims=True)                  # (TR, 1)
        pos = jnp.min(jnp.where(vals == m, lane, L), axis=1, keepdims=True)
        sel = lane == pos
        picked = jnp.sum(jnp.where(sel, idxs, 0), axis=1, keepdims=True)
        out = jnp.where(out_col == i, picked, out)
        vals = jnp.where(sel, jnp.inf, vals)
        return vals, out

    out0 = jnp.zeros((_TR, kpad), jnp.int32)
    _, out = lax.fori_loop(0, k, body, (vals, out0))
    out_ref[:, :] = out


@functools.partial(jax.jit, static_argnums=(2, 3))
def select_min_k_pallas(
    vals: jax.Array, idxs: jax.Array, k: int, interpret: bool = False
) -> jax.Array:
    """vals/idxs: (..., L) candidate distances and indices -> (..., k) int32
    indices of the k smallest values, ascending."""
    shape = vals.shape
    L = shape[-1]
    R = 1
    for s in shape[:-1]:
        R *= s
    rpad = _round_up(R, _TR)
    lpad = _round_up(L, 128)
    v = jnp.full((rpad, lpad), jnp.inf, jnp.float32)
    v = v.at[:R, :L].set(vals.reshape(R, L).astype(jnp.float32))
    i = jnp.zeros((rpad, lpad), jnp.int32)
    i = i.at[:R, :L].set(idxs.reshape(R, L).astype(jnp.int32))
    kpad = _round_up(k, 128)

    kernel = functools.partial(_select_k_kernel, k)
    out = pl.pallas_call(
        kernel,
        grid=(rpad // _TR,),
        in_specs=[
            pl.BlockSpec((_TR, lpad), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, lpad), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TR, kpad), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, kpad), jnp.int32),
        interpret=interpret,
    )(v, i)
    return out[:R, :k].reshape(shape[:-1] + (k,))
