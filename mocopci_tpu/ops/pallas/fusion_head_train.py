"""Fused TRAIN-path fusion-head MLP with batch-norm statistics (custom VJP).

The reference fusion head scores every (query, neighbour) pair with a 3-layer
MLP (4 -> 64 -> 64 -> 128), each layer followed by train-mode BatchNorm
(per-frame-group batch statistics, eps 1e-3) and ReLU, then a max over
channels (ref ``fusion``, ``mocopci.py:798-819``; the per-frame statistics
come from the reference calling fusion once per frame).  Train-mode BN makes
the eval-path BN-folding impossible, and the XLA program materializes every
(G, C, P) activation in HBM for itself and its backward — ~40 ms fwd+bwd of
the B=2 train step at P = N·2k = 524288 pairs.

Here the head runs as a sequence of streaming Pallas sweeps that keep every
activation tile in VMEM and RECOMPUTE the layer chain instead of storing it
(one full recompute is ~20 GFLOP of MXU work — far cheaper than the HBM
round-trips it replaces):

  forward:  3 stats sweeps (layer k's batch sums need layers <k normalized,
            so sweep k recomputes layers 1..k-1 from x) + 1 output sweep
            -> o = max_c h3 and the per-layer (mean, var).
  backward: BN backward needs two global reductions per layer (Σ d_ẑ and
            Σ d_ẑ·ẑ over each frame group), and layer k's reductions need
            layer k+1's complete gradient — 3 reduction sweeps + 1 gradient
            sweep, each recomputing forward in VMEM.  Max-over-channel ties
            split evenly (matching XLA's reduce-max gradient) and
            relu'(0) = 0 (matching jax.nn.relu).

Layout: pair axis on lanes ((C, R) tiles), channels on sublanes — the same
transposed lane-dense planes as the eval kernel (ops/pallas/fusion_head.py).
Per-frame statistic sums accumulate across grid steps into (F, 2, C) blocks
(consecutive-revisit accumulation; the group axis is frame-major so all Bg
members of a frame are adjacent in the grid); weight/γ/β gradients accumulate
into single resident blocks.

TPU-only dispatch happens in ``models/mocopci.py`` (the plain XLA program
remains the CPU twin); unit tests compare both in interpret mode
(``tests/test_fusion_head_train.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 2048  # pair-axis tile width (lanes)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matT(W_ref, h):
    # W: (Cin, Cout); h: (Cin, R) -> (Cout, R)
    return lax.dot_general(
        W_ref[:], h,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mat(W_ref, g):
    # W: (Cin, Cout); g: (Cout, R) -> (Cin, R)
    return lax.dot_general(
        W_ref[:], g,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chain(x, wbs, stats, upto):
    """Recompute the layer chain: z_i = W_iᵀh + b_i for i < upto, with BN+ReLU
    applied for every i with stats available.

    wbs[i] = (W_ref, b_ref, gamma_ref, beta_ref); b/γ/β blocks are (C, 1).
    stats[i] = (mean_ref, rstd_ref), blocks (1, C, 1) for the current frame.
    Returns (zs, zhs, pres): raw, normalized, and pre-activation (γẑ+β).
    """
    h = x
    zs, zhs, pres = [], [], []
    for i in range(upto):
        W, b, gam, bet = wbs[i]
        z = _matT(W, h) + b[:]
        zs.append(z)
        if i < len(stats):
            mean, rstd = stats[i]
            zh = (z - mean[0]) * rstd[0]
            pre = gam[:] * zh + bet[:]
            zhs.append(zh)
            pres.append(pre)
            h = jnp.maximum(pre, 0.0)
    return zs, zhs, pres, h


def _col_mask(t, P, rows):
    cols = t * R + lax.broadcasted_iota(jnp.int32, (rows, R), 1)
    return cols < P


# ---------------------------------------------------------------- forward

def _stats_kernel(n_layer, Bg, P, x_ref, *refs):
    """Accumulate (Σz, Σz²) of layer ``n_layer`` into a (1, 2, C) out block."""
    g = pl.program_id(0)
    t = pl.program_id(1)
    wbs = [tuple(refs[4 * i + j] for j in range(4)) for i in range(3)]
    stats = [(refs[12 + 2 * i], refs[12 + 2 * i + 1]) for i in range(n_layer)]
    out = refs[12 + 2 * n_layer]

    @pl.when(jnp.logical_and(g % Bg == 0, t == 0))
    def _init():
        out[...] = jnp.zeros_like(out)

    zs, _, _, _ = _chain(x_ref[0], wbs, stats, n_layer + 1)
    z = jnp.where(_col_mask(t, P, zs[n_layer].shape[0]), zs[n_layer], 0.0)
    out[0, 0, :] += jnp.sum(z, axis=1)
    out[0, 1, :] += jnp.sum(z * z, axis=1)


def _out_kernel(x_ref, *refs):
    """Final forward sweep: o = max_c h3 (padded cols sliced off outside)."""
    wbs = [tuple(refs[4 * i + j] for j in range(4)) for i in range(3)]
    stats = [(refs[12 + 2 * i], refs[12 + 2 * i + 1]) for i in range(3)]
    out = refs[18]
    _, _, _, h = _chain(x_ref[0], wbs, stats, 3)
    out[0] = jnp.max(h, axis=0, keepdims=True)


# ---------------------------------------------------------------- backward

def _bwd_kernel(level, Bg, P, x_ref, do_ref, *refs):
    """One backward sweep.

    level 3: accumulate (Σ d_ẑ3, Σ d_ẑ3·ẑ3) per frame + (dγ3, dβ3).
    level 2: consumes S3; accumulates S2 sums + dW3/db3 + (dγ2, dβ2).
    level 1: consumes S3, S2; accumulates S1 sums + dW2/db2 + (dγ1, dβ1).
    level 0: consumes all S; writes the dx tile + dW1/db1.
    """
    g = pl.program_id(0)
    t = pl.program_id(1)
    wbs = [tuple(refs[4 * i + j] for j in range(4)) for i in range(3)]
    stats = [(refs[12 + 2 * i], refs[12 + 2 * i + 1]) for i in range(3)]
    rest = list(refs[18:])
    S = Bg * P  # statistic-set size per frame group

    zs, zhs, pres, h3 = _chain(x_ref[0], wbs, stats, 3)
    o = jnp.max(h3, axis=0, keepdims=True)
    eq = (h3 == o).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=0, keepdims=True)
    dh3 = do_ref[0] * eq / cnt                       # ties split like XLA
    dpre3 = jnp.where(pres[2] > 0, dh3, 0.0)         # relu'(0) = 0
    dzh3 = dpre3 * wbs[2][2][:]
    m3 = _col_mask(t, P, dzh3.shape[0])
    dzh3 = jnp.where(m3, dzh3, 0.0)
    dpre3 = jnp.where(m3, dpre3, 0.0)

    first_of_group = jnp.logical_and(g % Bg == 0, t == 0)
    first_step = jnp.logical_and(g == 0, t == 0)

    if level == 3:
        Ssum3, dgb3 = rest

        @pl.when(first_of_group)
        def _i():
            Ssum3[...] = jnp.zeros_like(Ssum3)

        @pl.when(first_step)
        def _i2():
            dgb3[...] = jnp.zeros_like(dgb3)

        Ssum3[0, 0, :] += jnp.sum(dzh3, axis=1)
        Ssum3[0, 1, :] += jnp.sum(dzh3 * zhs[2], axis=1)
        dgb3[0, :] += jnp.sum(dpre3 * zhs[2], axis=1)
        dgb3[1, :] += jnp.sum(dpre3, axis=1)
        return

    def bn_bwd(dzh, zh, rstd_ref, Ssum_ref, mask):
        Sa = Ssum_ref[0, 0, :][:, None]
        Sb = Ssum_ref[0, 1, :][:, None]
        dz = rstd_ref[0] * (dzh - (Sa + zh * Sb) * (1.0 / S))
        return jnp.where(mask, dz, 0.0)

    dz3 = bn_bwd(dzh3, zhs[2], stats[2][1], rest[0], m3)
    dh2 = _mat(wbs[2][0], dz3)
    dpre2 = jnp.where(pres[1] > 0, dh2, 0.0)
    dzh2 = dpre2 * wbs[1][2][:]
    m2 = _col_mask(t, P, dzh2.shape[0])
    dzh2 = jnp.where(m2, dzh2, 0.0)
    dpre2 = jnp.where(m2, dpre2, 0.0)

    if level == 2:
        _, Ssum2, dW3, db3, dgb2 = rest

        @pl.when(first_of_group)
        def _i():
            Ssum2[...] = jnp.zeros_like(Ssum2)

        @pl.when(first_step)
        def _i2():
            dW3[...] = jnp.zeros_like(dW3)
            db3[...] = jnp.zeros_like(db3)
            dgb2[...] = jnp.zeros_like(dgb2)

        Ssum2[0, 0, :] += jnp.sum(dzh2, axis=1)
        Ssum2[0, 1, :] += jnp.sum(dzh2 * zhs[1], axis=1)
        h2 = jnp.maximum(pres[1], 0.0)
        dW3[...] += lax.dot_general(             # (C2, C3) += h2 @ dz3ᵀ
            h2, dz3, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db3[0, :] += jnp.sum(dz3, axis=1)
        dgb2[0, :] += jnp.sum(dpre2 * zhs[1], axis=1)
        dgb2[1, :] += jnp.sum(dpre2, axis=1)
        return

    dz2 = bn_bwd(dzh2, zhs[1], stats[1][1], rest[1], m2)
    dh1 = _mat(wbs[1][0], dz2)
    dpre1 = jnp.where(pres[0] > 0, dh1, 0.0)
    dzh1 = dpre1 * wbs[0][2][:]
    m1 = _col_mask(t, P, dzh1.shape[0])
    dzh1 = jnp.where(m1, dzh1, 0.0)
    dpre1 = jnp.where(m1, dpre1, 0.0)

    if level == 1:
        _, _, Ssum1, dW2, db2, dgb1 = rest

        @pl.when(first_of_group)
        def _i():
            Ssum1[...] = jnp.zeros_like(Ssum1)

        @pl.when(first_step)
        def _i2():
            dW2[...] = jnp.zeros_like(dW2)
            db2[...] = jnp.zeros_like(db2)
            dgb1[...] = jnp.zeros_like(dgb1)

        Ssum1[0, 0, :] += jnp.sum(dzh1, axis=1)
        Ssum1[0, 1, :] += jnp.sum(dzh1 * zhs[0], axis=1)
        h1 = jnp.maximum(pres[0], 0.0)
        dW2[...] += lax.dot_general(
            h1, dz2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db2[0, :] += jnp.sum(dz2, axis=1)
        dgb1[0, :] += jnp.sum(dpre1 * zhs[0], axis=1)
        dgb1[1, :] += jnp.sum(dpre1, axis=1)
        return

    # level 0: dx + dW1/db1
    _, _, S1ref, dx, dW1, db1 = rest
    dz1 = bn_bwd(dzh1, zhs[0], stats[0][1], S1ref, m1)
    dx[0] = _mat(wbs[0][0], dz1)

    @pl.when(first_step)
    def _i():
        dW1[...] = jnp.zeros_like(dW1)
        db1[...] = jnp.zeros_like(db1)

    dW1[...] += lax.dot_general(
        x_ref[0], dz1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1[0, :] += jnp.sum(dz1, axis=1)


# ---------------------------------------------------------------- driver

def _pad_cols(x, P):
    ppad = _round_up(P, R)
    return jnp.pad(x, ((0, 0), (0, 0), (0, ppad - P))), ppad


def _full_spec(*s):
    return pl.BlockSpec(s, lambda g, t, _n=len(s): (0,) * _n,
                        memory_space=pltpu.VMEM)


def _weight_specs(widths):
    specs = []
    cin = 4
    for c in widths:
        specs += [_full_spec(cin, c), _full_spec(c, 1),
                  _full_spec(c, 1), _full_spec(c, 1)]
        cin = c
    return specs


def _stat_spec(c, Bg):
    return pl.BlockSpec((1, c, 1), lambda g, t: (g // Bg, 0, 0),
                        memory_space=pltpu.VMEM)


def _ssum_spec(c, Bg):
    return pl.BlockSpec((1, 2, c), lambda g, t: (g // Bg, 0, 0),
                        memory_space=pltpu.VMEM)


def _x_spec():
    return pl.BlockSpec((1, 4, R), lambda g, t: (g, 0, t),
                        memory_space=pltpu.VMEM)


def _flatten_params(params):
    out = []
    for i, a in enumerate(params):
        out.append(a if a.ndim == 2 else a.reshape(-1, 1))
    return out


def _stats_to_mean_var_rstd(sums, Bg, P, eps):
    n = Bg * P
    mean = sums[:, 0] / n
    var = jnp.maximum(sums[:, 1] / n - mean * mean, 0.0)
    return mean, var, lax.rsqrt(var + eps)


def fusion_head_train(x, params, n_groups, eps=1e-3, interpret=False):
    """Train-path fusion head: (o (G, P), per-layer (mean, var) stats).

    Args:
      x: (G, 4, P) f32 pair planes, G = n_groups·Bg frame-major.
      params: 12 arrays (W1, b1, γ1, β1, W2, b2, γ2, β2, W3, b3, γ3, β3);
        Wi is (Cin, Cout).
      n_groups: number of BN statistic groups (frames).
    Returns:
      o: (G, P) f32 — max-over-channels head output (differentiable).
      stats: tuple of 3 (mean (F,C), biased_var (F,C)) — for the EMA
        running-stat update (treat as stop-gradient).
    """
    return _fht(x, tuple(params), n_groups, float(eps), bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fht(x, params, n_groups, eps, interpret):
    out, _ = _fht_fwd(x, params, n_groups, eps, interpret)
    return out


def _fht_fwd(x, params, n_groups, eps, interpret):
    G, _, P = x.shape
    F = n_groups
    Bg = G // F
    assert F * Bg == G, (G, F)
    widths = [params[0].shape[1], params[4].shape[1], params[8].shape[1]]
    wb = _flatten_params(params)
    xp, ppad = _pad_cols(x, P)
    grid = (G, ppad // R)

    stats_in = []
    stat_specs = []
    means, vars_, rstds = [], [], []
    for i in range(3):
        c = widths[i]
        sums = pl.pallas_call(
            functools.partial(_stats_kernel, i, Bg, P),
            grid=grid,
            in_specs=[_x_spec()] + _weight_specs(widths) + stat_specs,
            out_specs=_ssum_spec(c, Bg),
            out_shape=jax.ShapeDtypeStruct((F, 2, c), jnp.float32),
            interpret=interpret,
        )(xp, *wb, *stats_in)
        mean, var, rstd = _stats_to_mean_var_rstd(sums, Bg, P, eps)
        means.append(mean)
        vars_.append(var)
        rstds.append(rstd)
        stats_in += [mean[:, :, None], rstd[:, :, None]]
        stat_specs += [_stat_spec(c, Bg), _stat_spec(c, Bg)]

    o = pl.pallas_call(
        _out_kernel,
        grid=grid,
        in_specs=[_x_spec()] + _weight_specs(widths) + stat_specs,
        out_specs=pl.BlockSpec((1, 1, R), lambda g, t: (g, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 1, ppad), jnp.float32),
        interpret=interpret,
    )(xp, *wb, *stats_in)
    o = o[:, 0, :P]
    out = (o, ((means[0], vars_[0]), (means[1], vars_[1]), (means[2], vars_[2])))
    return out, (x, params, means, rstds)


def _fht_bwd(n_groups, eps, interpret, res, ct):
    x, params, means, rstds = res
    d_o = ct[0]
    G, _, P = x.shape
    F = n_groups
    Bg = G // F
    widths = [params[0].shape[1], params[4].shape[1], params[8].shape[1]]
    c1, c2, c3 = widths
    wb = _flatten_params(params)
    xp, ppad = _pad_cols(x, P)
    grid = (G, ppad // R)
    dop = jnp.pad(d_o[:, None, :].astype(jnp.float32),
                  ((0, 0), (0, 0), (0, ppad - P)))
    do_spec = pl.BlockSpec((1, 1, R), lambda g, t: (g, 0, t),
                           memory_space=pltpu.VMEM)
    stats_in = []
    stat_specs = []
    for i in range(3):
        stats_in += [means[i][:, :, None], rstds[i][:, :, None]]
        stat_specs += [_stat_spec(widths[i], Bg), _stat_spec(widths[i], Bg)]
    base_specs = [_x_spec(), do_spec] + _weight_specs(widths) + stat_specs

    def call(level, extra, extra_specs, out_specs, out_shapes):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, level, Bg, P),
            grid=grid,
            in_specs=base_specs + extra_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(xp, dop, *wb, *stats_in, *extra)

    f32 = jnp.float32
    S3, dgb3 = call(
        3, [], [],
        [_ssum_spec(c3, Bg), _full_spec(2, c3)],
        [jax.ShapeDtypeStruct((F, 2, c3), f32),
         jax.ShapeDtypeStruct((2, c3), f32)],
    )
    S2, dW3, db3, dgb2 = call(
        2, [S3], [_ssum_spec(c3, Bg)],
        [_ssum_spec(c2, Bg), _full_spec(c2, c3), _full_spec(1, c3),
         _full_spec(2, c2)],
        [jax.ShapeDtypeStruct((F, 2, c2), f32),
         jax.ShapeDtypeStruct((c2, c3), f32),
         jax.ShapeDtypeStruct((1, c3), f32),
         jax.ShapeDtypeStruct((2, c2), f32)],
    )
    S1, dW2, db2, dgb1 = call(
        1, [S3, S2], [_ssum_spec(c3, Bg), _ssum_spec(c2, Bg)],
        [_ssum_spec(c1, Bg), _full_spec(c1, c2), _full_spec(1, c2),
         _full_spec(2, c1)],
        [jax.ShapeDtypeStruct((F, 2, c1), f32),
         jax.ShapeDtypeStruct((c1, c2), f32),
         jax.ShapeDtypeStruct((1, c2), f32),
         jax.ShapeDtypeStruct((2, c1), f32)],
    )
    dx, dW1, db1 = call(
        0, [S3, S2, S1],
        [_ssum_spec(c3, Bg), _ssum_spec(c2, Bg), _ssum_spec(c1, Bg)],
        [pl.BlockSpec((1, 4, R), lambda g, t: (g, 0, t),
                      memory_space=pltpu.VMEM),
         _full_spec(4, c1), _full_spec(1, c1)],
        [jax.ShapeDtypeStruct((G, 4, ppad), f32),
         jax.ShapeDtypeStruct((4, c1), f32),
         jax.ShapeDtypeStruct((1, c1), f32)],
    )
    d_params = (
        dW1, db1[0], dgb1[0], dgb1[1],
        dW2, db2[0], dgb2[0], dgb2[1],
        dW3, db3[0], dgb3[0], dgb3[1],
    )
    return dx[:, :, :P], d_params


_fht.defvjp(_fht_fwd, _fht_bwd)
