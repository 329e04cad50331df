"""Fused point-transformer tail: k-NN vector attention as streaming sweeps.

The refine head's ``PointTransformerBlock`` (``nn/transformer.py``, ref
``models/pointT_layer2.py:37-77``) builds five (B, N, k, D) pair tensors
between its gather and the attention sum (pos MLP, q−k+pos, gamma MLP,
per-channel softmax, weighted sum) — at the live shape (3B, 2048, k=16,
D=64) that is ~300 MB of HBM round-trips forward and twice that backward.
This op consumes the gathered ``[xyz | k | v]`` rows once per sweep:

  rel    = q_xyz − knn_xyz
  pos    = relu(rel·Wd1 + bd1)·Wd2 + bd2
  logit  = (relu((q − k_g + pos)·Wg1 + bg1)·Wg2 + bg2) / sqrt(D)
  out    = Σ_j softmax_j(logit) ⊙ (v_g + pos)        (softmax PER CHANNEL)

with the softmax ONLINE over the k-innermost grid axis (flash-style
running max / denominator / numerator, all VMEM scratch — exact up to fp
reassociation).  The backward is one sweep that recomputes each tile's
chain; the softmax VJP uses the saved outputs plus the final running
(m, l) statistics emitted by the forward:

  dlogit = a ⊙ (dout ⊙ w − dout ⊙ out) / sqrt(D),  a = exp(logit − m)/l

(`Σ_j a·(dout·w) = dout·out` — the per-channel softmax Jacobian).

fc1/w_qs/w_ks/w_vs/fc2 and the residual stay outside: they are plain
(N, D) matmuls XLA already runs well.  Pair rows arrive k-major so each
row tile is an aligned query range (same layout contract as
``cross_tail.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile(S: int) -> int:
    for ts in (512, 256, 128, 64, 32, 16, 8):
        if S % ts == 0:
            return ts
    return S


def _mm(a, w):
    return lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mmT(a, w):
    # a (ts, Cout) x w (Cin, Cout)^T -> (ts, Cin)
    return lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _chain(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2, D, scale):
    """Recompute the tile chain; returns the intermediates the VJP needs."""
    knn_xyz = rows[:, :3]
    k_g = rows[:, 3 : 3 + D]
    v_g = rows[:, 3 + D :]
    rel = xq - knn_xyz                                  # (ts, 3)
    h0 = _mm(rel, wd1) + bd1                            # (ts, D)
    r0 = jnp.maximum(h0, 0.0)
    pos = _mm(r0, wd2) + bd2                            # (ts, D)
    gvec = q - k_g + pos                                # (ts, D)
    h1 = _mm(gvec, wg1) + bg1
    r1 = jnp.maximum(h1, 0.0)
    logit = (_mm(r1, wg2) + bg2) * scale                # (ts, D)
    w = v_g + pos                                       # (ts, D)
    return rel, h0, r0, pos, gvec, h1, r1, logit, w, v_g


def _fwd_kernel(K, D, scale,
                rows_ref, xq_ref, q_ref,
                wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                wg1_ref, bg1_ref, wg2_ref, bg2_ref,
                out_ref, m_ref, l_ref,
                m_s, l_s, acc_s):
    j = pl.program_id(2)
    (_, _, _, _, _, _, _, logit, w, _) = _chain(
        rows_ref[0], xq_ref[0], q_ref[0],
        wd1_ref[:], bd1_ref[0], wd2_ref[:], bd2_ref[0],
        wg1_ref[:], bg1_ref[0], wg2_ref[:], bg2_ref[0], D, scale,
    )

    @pl.when(j == 0)
    def _init():
        m_s[:, :] = logit
        l_s[:, :] = jnp.ones_like(logit)
        acc_s[:, :] = w

    @pl.when(j > 0)
    def _acc():
        m_new = jnp.maximum(m_s[:, :], logit)
        c = jnp.exp(m_s[:, :] - m_new)
        e = jnp.exp(logit - m_new)
        l_s[:, :] = l_s[:, :] * c + e
        acc_s[:, :] = acc_s[:, :] * c + e * w
        m_s[:, :] = m_new

    @pl.when(j == K - 1)
    def _fin():
        out_ref[0] = acc_s[:, :] / l_s[:, :]
        m_ref[0] = m_s[:, :]
        l_ref[0] = l_s[:, :]


def _bwd_kernel(K, D, scale,
                rows_ref, xq_ref, q_ref,
                wd1_ref, bd1_ref, wd2_ref, bd2_ref,
                wg1_ref, bg1_ref, wg2_ref, bg2_ref,
                out_ref, m_ref, l_ref, dout_ref,
                drows_ref, dxq_ref, dq_ref,
                dwd1_ref, dbd1_ref, dwd2_ref, dbd2_ref,
                dwg1_ref, dbg1_ref, dwg2_ref, dbg2_ref):
    g, s, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    rel, h0, r0, pos, gvec, h1, r1, logit, w, v_g = _chain(
        rows_ref[0], xq_ref[0], q_ref[0],
        wd1_ref[:], bd1_ref[0], wd2_ref[:], bd2_ref[0],
        wg1_ref[:], bg1_ref[0], wg2_ref[:], bg2_ref[0], D, scale,
    )
    a = jnp.exp(logit - m_ref[0]) / l_ref[0]            # (ts, D)
    dout = dout_ref[0]
    dlogit = a * (dout * w - dout * out_ref[0])         # softmax VJP, scaled below
    dw = dout * a                                       # d(v_g + pos) from the sum
    dG2 = dlogit * scale
    dr1 = _mmT(dG2, wg2_ref[:])
    dh1 = jnp.where(h1 > 0, dr1, 0.0)
    dgvec = _mmT(dh1, wg1_ref[:])
    dpos = dgvec + dw
    dr0 = _mmT(dpos, wd2_ref[:])
    dh0 = jnp.where(h0 > 0, dr0, 0.0)
    drel = _mmT(dh0, wd1_ref[:])

    # rows gradient: [-drel | -dgvec | dw]
    drows_ref[0] = jnp.concatenate([-drel, -dgvec, dw], axis=1)

    dwd1_t = lax.dot_general(rel, dh0, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dbd1_t = jnp.sum(dh0, axis=0, keepdims=True)
    dwd2_t = lax.dot_general(r0, dpos, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dbd2_t = jnp.sum(dpos, axis=0, keepdims=True)
    dwg1_t = lax.dot_general(gvec, dh1, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dbg1_t = jnp.sum(dh1, axis=0, keepdims=True)
    dwg2_t = lax.dot_general(r1, dG2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dbg2_t = jnp.sum(dG2, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _init_qs():
        dxq_ref[0] = drel
        dq_ref[0] = dgvec

    @pl.when(j > 0)
    def _acc_qs():
        dxq_ref[0] = dxq_ref[0] + drel
        dq_ref[0] = dq_ref[0] + dgvec

    first = (g == 0) & (s == 0) & (j == 0)

    @pl.when(first)
    def _init_w():
        dwd1_ref[:, :] = dwd1_t
        dbd1_ref[:, :] = dbd1_t
        dwd2_ref[:, :] = dwd2_t
        dbd2_ref[:, :] = dbd2_t
        dwg1_ref[:, :] = dwg1_t
        dbg1_ref[:, :] = dbg1_t
        dwg2_ref[:, :] = dwg2_t
        dbg2_ref[:, :] = dbg2_t

    @pl.when(jnp.logical_not(first))
    def _acc_w():
        dwd1_ref[:, :] += dwd1_t
        dbd1_ref[:, :] += dbd1_t
        dwd2_ref[:, :] += dwd2_t
        dbd2_ref[:, :] += dbd2_t
        dwg1_ref[:, :] += dwg1_t
        dbg1_ref[:, :] += dbg1_t
        dwg2_ref[:, :] += dwg2_t
        dbg2_ref[:, :] += dbg2_t


def _row_spec(S, ts, C):
    return pl.BlockSpec((1, ts, C), lambda g, s, j: (g, j * (S // ts) + s, 0),
                        memory_space=pltpu.VMEM)


def _q_spec(ts, C):
    return pl.BlockSpec((1, ts, C), lambda g, s, j: (g, s, 0),
                        memory_space=pltpu.VMEM)


def _w_spec(ci, co):
    return pl.BlockSpec((ci, co), lambda g, s, j: (0, 0),
                        memory_space=pltpu.VMEM)


def _b_spec(co):
    return pl.BlockSpec((1, co), lambda g, s, j: (0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=(11, 12))
def _tt_fwd_call(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
                 K, interpret):
    G, P, C = rows.shape
    S = P // K
    D = q.shape[-1]
    ts = _tile(S)
    scale = 1.0 / (D ** 0.5)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K, D, scale),
        grid=(G, S // ts, K),
        in_specs=[
            _row_spec(S, ts, C), _q_spec(ts, 3), _q_spec(ts, D),
            _w_spec(3, D), _b_spec(D), _w_spec(D, D), _b_spec(D),
            _w_spec(D, D), _b_spec(D), _w_spec(D, D), _b_spec(D),
        ],
        out_specs=[_q_spec(ts, D), _q_spec(ts, D), _q_spec(ts, D)],
        out_shape=[jax.ShapeDtypeStruct((G, S, D), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((ts, D), jnp.float32)] * 3,
        interpret=interpret,
    )(rows, xq, q, wd1, bd1[None], wd2, bd2[None], wg1, bg1[None],
      wg2, bg2[None])
    return out


@functools.partial(jax.jit, static_argnums=(15, 16))
def _tt_bwd_call(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
                 o, m, l, do, K, interpret):
    G, P, C = rows.shape
    S = P // K
    D = q.shape[-1]
    ts = _tile(S)
    scale = 1.0 / (D ** 0.5)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, K, D, scale),
        grid=(G, S // ts, K),
        in_specs=[
            _row_spec(S, ts, C), _q_spec(ts, 3), _q_spec(ts, D),
            _w_spec(3, D), _b_spec(D), _w_spec(D, D), _b_spec(D),
            _w_spec(D, D), _b_spec(D), _w_spec(D, D), _b_spec(D),
            _q_spec(ts, D), _q_spec(ts, D), _q_spec(ts, D), _q_spec(ts, D),
        ],
        out_specs=[
            _row_spec(S, ts, C), _q_spec(ts, 3), _q_spec(ts, D),
            _w_spec(3, D), _b_spec(D), _w_spec(D, D), _b_spec(D),
            _w_spec(D, D), _b_spec(D), _w_spec(D, D), _b_spec(D),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, P, C), jnp.float32),
            jax.ShapeDtypeStruct((G, S, 3), jnp.float32),
            jax.ShapeDtypeStruct((G, S, D), jnp.float32),
            jax.ShapeDtypeStruct((3, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(rows, xq, q, wd1, bd1[None], wd2, bd2[None], wg1, bg1[None],
      wg2, bg2[None], o, m, l, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def transformer_tail(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
                     K: int, interpret: bool = False):
    """k-NN vector attention over k-major pair rows.

    rows: (G, K·S, 3+2D) = gathered ``[xyz | k | v]``; xq: (G, S, 3) query
    positions; q: (G, S, D) query projections; four Dense layers' params.
    Returns (G, S, D) — the attention sum (fc2/residual applied by the
    caller)."""
    o, _, _ = _tt_fwd_call(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1,
                           wg2, bg2, K, interpret)
    return o


def _tt_fwd(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2, K, interpret):
    o, m, l = _tt_fwd_call(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1,
                           wg2, bg2, K, interpret)
    return o, (rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2, o, m, l)


def _tt_bwd(K, interpret, res, do):
    (rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2, o, m, l) = res
    outs = _tt_bwd_call(rows, xq, q, wd1, bd1, wd2, bd2, wg1, bg1, wg2, bg2,
                        o, m, l, do, K, interpret)
    (drows, dxq, dq, dwd1, dbd1, dwd2, dbd2, dwg1, dbg1, dwg2, dbg2) = outs
    return (drows, dxq, dq, dwd1, dbd1[0], dwd2, dbd2[0],
            dwg1, dbg1[0], dwg2, dbg2[0])


transformer_tail.defvjp(_tt_fwd, _tt_bwd)
