"""Fused cross-correlation tail: add-base → LeakyReLU → Dense → LeakyReLU →
max-over-neighbours, as streaming Pallas sweeps with a custom VJP.

The `_cross_core` layers (``nn/cross.py`` — bid / fe / cross3, ref
``pointconv_util.py:718-791, 874-930, 1107-1161``) spend their time on HBM
round-trips of the (G, S, 2k, C) pair tensor between the XLA gather and the
MLP/max ops (B=2 trace: bid 20.5 ms + fe 9.9 ms fwd+bwd, dominated by
those passes plus the backward's add_any merges).  This op consumes the
gathered rows ONCE: each (ts, C) tile flows add→relu→dense→relu→max
entirely in VMEM/registers, and the backward recomputes the tile chain
instead of materializing activations (the fusion-head recompute economics,
``fusion_head_train.py``: one tile recompute is ~registers, one stored
activation is ~100 MB of HBM).

Layout: pair rows arrive k-major — ``rows[g, j*S + n, :]`` is neighbour j of
query n — so a row tile is an aligned query range and the output block
(indexed by the query tile) stays VMEM-resident across the k-innermost grid
axis: the running max never leaves VMEM.

Max-tie gradients: the backward routes each (n, c)'s gradient to the FIRST
neighbour j attaining the max (a `claimed` scratch plane tracks this across
the j axis).  XLA's ``jnp.max`` VJP splits ties evenly instead; the two
conventions produce IDENTICAL end-to-end gradients here because the only
systematic tie source is a duplicated neighbour index (the cosine and
Euclidean kNN halves may select the same reference point): duplicate rows
are identical (same gathered row + same base), so every downstream gradient
— the scatter-add into the table (sum over duplicates), d_base (sum over
j), dW = Σ x0ᵀdpre with identical x0 columns, db — is invariant to how the
tied mass is distributed among them.  Coincidental float ties between
distinct rows are measure-zero; `tests/test_cross_tail.py` covers the
duplicate-index case explicitly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOPE = 0.1  # LEAKY_RATE (nn/basic.py)


def _leaky(x):
    return jnp.where(x >= 0, x, _SLOPE * x)


def _dleaky(x):
    return jnp.where(x >= 0, 1.0, _SLOPE)


def _tile(S: int) -> int:
    for ts in (512, 256, 128, 64, 32, 16, 8):
        if S % ts == 0:
            return ts
    return S


def _fwd_kernel(K, rows_ref, base_ref, w_ref, b_ref, o_ref):
    j = pl.program_id(2)
    x0 = _leaky(rows_ref[0] + base_ref[0])                  # (ts, C)
    h = _leaky(
        lax.dot_general(
            x0, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0]
    )                                                       # (ts, C2)

    @pl.when(j == 0)
    def _init():
        o_ref[0] = h

    @pl.when(j > 0)
    def _acc():
        o_ref[0] = jnp.maximum(o_ref[0], h)


def _bwd_kernel(K, rows_ref, base_ref, w_ref, b_ref, o_ref, do_ref,
                drows_ref, dbase_ref, dw_ref, db_ref, claimed):
    g, s, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    pre0 = rows_ref[0] + base_ref[0]
    x0 = _leaky(pre0)
    pre1 = (
        lax.dot_general(
            x0, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[0]
    )
    h = _leaky(pre1)

    @pl.when(j == 0)
    def _reset():
        claimed[:, :] = jnp.zeros_like(claimed)

    hit = (h == o_ref[0]) & (claimed[:, :] == 0.0)
    claimed[:, :] = jnp.where(hit, 1.0, claimed[:, :])
    dpre1 = jnp.where(hit, do_ref[0], 0.0) * _dleaky(pre1)  # (ts, C2)
    dx0 = (
        lax.dot_general(
            dpre1, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * _dleaky(pre0)
    )                                                       # (ts, C)
    drows_ref[0] = dx0
    dw_t = lax.dot_general(
        x0, dpre1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (C, C2)
    db_t = jnp.sum(dpre1, axis=0, keepdims=True)            # (1, C2)

    @pl.when(j == 0)
    def _init_base():
        dbase_ref[0] = dx0

    @pl.when(j > 0)
    def _acc_base():
        dbase_ref[0] = dbase_ref[0] + dx0

    first = (g == 0) & (s == 0) & (j == 0)

    @pl.when(first)
    def _init_w():
        dw_ref[:, :] = dw_t
        db_ref[:, :] = db_t

    @pl.when(jnp.logical_not(first))
    def _acc_w():
        dw_ref[:, :] = dw_ref[:, :] + dw_t
        db_ref[:, :] = db_ref[:, :] + db_t


def _specs(G, S, K, C, C2, ts):
    rows_spec = pl.BlockSpec(
        (1, ts, C), lambda g, s, j: (g, j * (S // ts) + s, 0),
        memory_space=pltpu.VMEM,
    )
    base_spec = pl.BlockSpec(
        (1, ts, C), lambda g, s, j: (g, s, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((C, C2), lambda g, s, j: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, C2), lambda g, s, j: (0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, ts, C2), lambda g, s, j: (g, s, 0),
                          memory_space=pltpu.VMEM)
    return rows_spec, base_spec, w_spec, b_spec, o_spec


@functools.partial(jax.jit, static_argnums=(4, 5))
def _cross_tail_fwd_call(rows, base, w, b, K, interpret):
    G, P, C = rows.shape
    S = P // K
    C2 = w.shape[1]
    ts = _tile(S)
    rows_spec, base_spec, w_spec, b_spec, o_spec = _specs(G, S, K, C, C2, ts)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, K),
        grid=(G, S // ts, K),
        in_specs=[rows_spec, base_spec, w_spec, b_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((G, S, C2), jnp.float32),
        interpret=interpret,
    )(rows, base, w, b[None, :])


@functools.partial(jax.jit, static_argnums=(6, 7))
def _cross_tail_bwd_call(rows, base, w, b, o, do, K, interpret):
    G, P, C = rows.shape
    S = P // K
    C2 = w.shape[1]
    ts = _tile(S)
    rows_spec, base_spec, w_spec, b_spec, o_spec = _specs(G, S, K, C, C2, ts)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, K),
        grid=(G, S // ts, K),
        in_specs=[rows_spec, base_spec, w_spec, b_spec, o_spec, o_spec],
        out_specs=[
            rows_spec,
            base_spec,
            pl.BlockSpec((C, C2), lambda g, s, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda g, s, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, P, C), jnp.float32),
            jax.ShapeDtypeStruct((G, S, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C2), jnp.float32),
            jax.ShapeDtypeStruct((1, C2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ts, C2), jnp.float32)],
        interpret=interpret,
    )(rows, base, w, b[None, :], o, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def cross_tail(rows, base, w, b, K: int, interpret: bool = False):
    """max_j leaky(leaky(rows_j + base) @ w + b): (G, K·S, C) k-major pair
    rows + (G, S, C) query base -> (G, S, C2).

    Semantics identical to the XLA chain
    ``jnp.max(leaky(dense(leaky(rows.reshape(G,K,S,C) + base[:,None])))
    , axis=1)`` (tie gradients: see module docstring)."""
    return _cross_tail_fwd_call(rows, base, w, b, K, interpret)


def _ct_fwd(rows, base, w, b, K, interpret):
    o = _cross_tail_fwd_call(rows, base, w, b, K, interpret)
    return o, (rows, base, w, b, o)


def _ct_bwd(K, interpret, res, do):
    rows, base, w, b, o = res
    drows, dbase, dw, db = _cross_tail_bwd_call(
        rows, base, w, b, o, do, K, interpret
    )
    return drows, dbase, dw, db[0]


cross_tail.defvjp(_ct_fwd, _ct_bwd)
