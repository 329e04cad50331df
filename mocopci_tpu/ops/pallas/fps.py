"""Farthest point sampling as a Pallas TPU kernel.

Semantics match the reference CUDA kernel (``pointnet2/src/sampling_gpu.cu:93-253``):
seed index 0, running min-distance buffer initialised to 1e10, greedy argmax.
The CUDA version runs one thread-block per batch element with a shared-memory
tree reduction per step; here one grid program processes up to 8 batch
elements at once — the (8, N) min-distance field lives on VPU sublanes, so the
2048-step selection loop costs the same for 8 clouds as for one (the folded
3-frame refine head relies on this).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 8  # batch rows per grid cell (= f32 sublane count)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_level(xv, yv, zv, n_real: int, npoint: int, opad: int,
               collect: bool):
    """One FPS level entirely in registers/VMEM.

    xv/yv/zv: (TB, Npad) coordinate planes.  Returns the (TB, opad) int32
    index row and, when ``collect`` is set, the selected coordinate planes
    ((TB, opad) each) so a following level can run directly on the sampled
    subset without leaving the kernel (``_fps_pyramid_kernel``).
    """
    npad = xv.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (_TB, npad), dimension=1)
    full0 = jnp.full((_TB, npad), 1e10, jnp.float32)
    mind0 = full0 if n_real == npad else jnp.where(lane < n_real, full0, -1.0)
    out_col = lax.broadcasted_iota(jnp.int32, (_TB, opad), dimension=1)

    def _argmax_carry(mind):
        """Fused argmax that carries (idx, x, y, z) through ONE tree reduction.

        The serial loop is VPU-throughput-bound: a separate argmax plus three
        full-width one-hot coordinate extractions cost ~670 vector ops per
        step at N=8192; halving a (value, idx, x, y, z) tuple down to one
        128-lane vreg and doing the one-hot only there costs ~420.  Strict
        ``>`` keeps the LEFT half on exact float ties, which matches
        ``jnp.argmax``'s first-index rule at every level except across lanes
        congruent mod 128 — indistinguishable on non-degenerate clouds (the
        CUDA kernel's thread-strided tree has its own tie order too).
        """
        carry5 = (mind, lane, xv, yv, zv)

        def _fold(t, lo, hi):
            take_r = t[0][:, lo:hi] > t[0][:, : hi - lo]
            return tuple(
                jnp.where(take_r, a[:, lo:hi], a[:, : hi - lo]) for a in t
            )

        w = npad
        while w > 128:
            h = w // 2
            if h % 128 == 0:
                carry5 = _fold(carry5, h, w)
                w = h
            else:
                # odd vreg count (e.g. w=384 for stress Ns): fold the trailing
                # 128-lane chunks into the first one, one compare each
                first = tuple(a[:, :128] for a in carry5)
                for c in range(1, w // 128):
                    take_r = carry5[0][:, c * 128:(c + 1) * 128] > first[0]
                    first = tuple(
                        jnp.where(take_r, a[:, c * 128:(c + 1) * 128], f)
                        for f, a in zip(first, carry5)
                    )
                carry5 = first
                w = 128
        v, ix, cx, cy, cz = carry5
        j = jnp.argmax(v, axis=1).astype(jnp.int32)        # (TB,)
        sel = lax.broadcasted_iota(jnp.int32, (_TB, w), 1) == j[:, None]
        pick = lambda a, zero: jnp.sum(
            jnp.where(sel, a, zero), axis=1, keepdims=True
        )
        return (pick(ix, 0), pick(cx, 0.0), pick(cy, 0.0), pick(cz, 0.0))

    def step(i, carry):
        # out accumulates via a one-hot column select: Mosaic has no dynamic
        # lane-indexed vector store, and this keeps the whole loop in registers
        mind, out, cacc, px, py, pz = carry  # px/py/pz: (TB, 1) last-picked
        d = (xv - px) ** 2 + (yv - py) ** 2 + (zv - pz) ** 2
        # no validity select needed: d >= 0 and invalid lanes carry mind = -1
        mind = jnp.minimum(mind, d)
        nxt, px, py, pz = _argmax_carry(mind)
        sel = out_col == i
        out = jnp.where(sel, nxt, out)
        if collect:
            cacc = tuple(
                jnp.where(sel, p, c) for c, p in zip(cacc, (px, py, pz))
            )
        return mind, out, cacc, px, py, pz

    # 2x unrolled selection loop (the ~2048 dependent iterations make loop
    # overhead visible: measured ~11% faster than unroll-1), odd tail eager
    def body(j, carry):
        carry = step(2 * j + 1, carry)
        return step(2 * j + 2, carry)

    out0 = jnp.zeros((_TB, opad), jnp.int32)
    p0 = (xv[:, 0:1], yv[:, 0:1], zv[:, 0:1])
    if collect:
        # seed (index 0) coords land in output column 0
        cacc0 = tuple(
            jnp.where(out_col == 0, p, 0.0).astype(jnp.float32) for p in p0
        )
    else:
        cacc0 = ()
    carry = (mind0, out0, cacc0, *p0)
    n_pairs = (npoint - 1) // 2
    carry = lax.fori_loop(0, n_pairs, body, carry)
    for i in range(2 * n_pairs + 1, npoint):
        carry = step(i, carry)
    _, out, cacc, _, _, _ = carry
    return out, cacc


def _fps_kernel(n_real: int, npoint: int, xyz_ref, out_ref):
    # xyz_ref: (3, TB, Npad) f32 in VMEM — x/y/z planes for TB batch rows.
    # out_ref: (TB, npoint_pad) int32 in VMEM.
    out, _ = _fps_level(
        xyz_ref[0], xyz_ref[1], xyz_ref[2],
        n_real, npoint, out_ref.shape[-1], False,
    )
    out_ref[:, :] = out


def _fps_level_split(xv, yv, zv, n_real: int, npoint: int, opad: int, s: int,
                     s_data: int | None = None, collect: bool = False):
    """FPS level with each cloud's points SPLIT across ``s`` sublane rows.

    The plain layout (one cloud per sublane row) idles ``TB - n_clouds``
    sublanes at the live call sites (2-4 clouds per launch): every vector op
    of the 2048-step selection loop then runs at 1/4 - 1/2 occupancy.  Here
    cloud c occupies rows ``c*s .. c*s+s-1``, row ``rw`` holding the
    contiguous chunk ``[rw*chunk, (rw+1)*chunk)`` of its points, so the
    distance/fold work per step shrinks by ``s``x.

    After the per-row lane fold (as in ``_fps_level``), a cross-row
    XOR-butterfly tournament of ``log2 s`` rounds makes EVERY row of a group
    hold the group winner: round ``shift`` pairs row ``r`` with row
    ``r ^ shift`` (within the s-aligned group by construction) via two
    sublane ``pltpu.roll``s and a row-parity select — pure VPU data
    movement, no MXU one-hots, so Mosaic compile time stays flat in
    ``npoint`` (the earlier per-step one-hot ``lax.dot`` formulation blew
    compile past 6 min at production sizes).  Comparisons are lexicographic
    on (min-distance, global index) so all rows converge to the identical
    winner even on exact distance ties (rows of one cloud must agree on the
    picked point or the running state diverges).  The winner row then feeds
    the next distance update directly; indices/coords are written on all
    rows and the wrapper keeps row 0 of each group.

    Tie semantics: within a row the fold keeps the LEFT half (as before);
    across rows the LOWEST global index wins — both match ``jnp.argmax``'s
    first-index rule except for lanes congruent mod 128 within one chunk,
    the same (benign) deviation the plain kernel has.

    ``s_data`` (default ``s``): the DATA split factor — row ``r`` holds
    chunk ``r % s_data`` of its cloud.  The pyramid uses ``s_data < s`` at
    deep levels whose width no longer supports an ``s``-way lane-aligned
    split; rows then hold duplicated chunks (identical results, tournament
    unaffected).  ``collect``: also accumulate the selected coordinate
    planes ((TB, opad) each, replicated across a group's rows) so a
    following pyramid level can run on them in-kernel.
    """
    if s_data is None:
        s_data = s
    chunk = xv.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (_TB, chunk), dimension=1)
    rw = lax.broadcasted_iota(jnp.int32, (_TB, chunk), dimension=0) % s_data
    gidx = (rw * chunk + lane).astype(jnp.float32)   # global point id, exact in f32
    full0 = jnp.full((_TB, chunk), 1e10, jnp.float32)
    mind0 = jnp.where(rw * chunk + lane < n_real, full0, -1.0)
    out_col = lax.broadcasted_iota(jnp.int32, (_TB, opad), dimension=1)
    shifts = [1 << i for i in range(s.bit_length() - 1)]
    row128 = lax.broadcasted_iota(jnp.int32, (_TB, 128), 0)

    def _argmax_group(mind):
        carry5 = (mind, gidx, xv, yv, zv)

        def _fold(t, lo, hi):
            take_r = t[0][:, lo:hi] > t[0][:, : hi - lo]
            return tuple(
                jnp.where(take_r, a[:, lo:hi], a[:, : hi - lo]) for a in t
            )

        w = chunk
        while w > 128:
            h = w // 2
            if h % 128 == 0:
                carry5 = _fold(carry5, h, w)
                w = h
            else:
                first = tuple(a[:, :128] for a in carry5)
                for c in range(1, w // 128):
                    take_r = carry5[0][:, c * 128:(c + 1) * 128] > first[0]
                    first = tuple(
                        jnp.where(take_r, a[:, c * 128:(c + 1) * 128], f)
                        for f, a in zip(first, carry5)
                    )
                carry5 = first
                w = 128
        # cross-row XOR butterfly: round ``shift`` pairs row r with row
        # r ^ shift — r+shift when the bit is clear (roll up), r-shift when
        # set (roll down); both partners stay inside the s-aligned group, so
        # sublane wraparound never crosses a group boundary.  After log2(s)
        # rounds every row of a group holds the group's lexicographic
        # winner columns.
        for shift in shifts:
            up = tuple(pltpu.roll(a, _TB - shift, 0) for a in carry5)
            dn = tuple(pltpu.roll(a, shift, 0) for a in carry5)
            take_up = (row128 & shift) == 0
            other = tuple(
                jnp.where(take_up, u, d) for u, d in zip(up, dn)
            )
            v_s, i_s = carry5[0], carry5[1]
            v_o, i_o = other[0], other[1]
            take_o = (v_o > v_s) | ((v_o == v_s) & (i_o < i_s))
            carry5 = tuple(
                jnp.where(take_o, o, a) for a, o in zip(carry5, other)
            )
        v, ix, cx, cy, cz = carry5
        j = jnp.argmax(v, axis=1).astype(jnp.int32)        # identical per group
        sel = lax.broadcasted_iota(jnp.int32, (_TB, 128), 1) == j[:, None]
        pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=1, keepdims=True)
        return pick(ix), pick(cx), pick(cy), pick(cz)

    def step(i, carry):
        mind, out, cacc, px, py, pz = carry                # px/py/pz: (TB, 1)
        d = (xv - px) ** 2 + (yv - py) ** 2 + (zv - pz) ** 2
        mind = jnp.minimum(mind, d)
        nxt, px, py, pz = _argmax_group(mind)
        sel = out_col == i
        out = jnp.where(sel, nxt.astype(jnp.int32), out)
        if collect:
            cacc = tuple(
                jnp.where(sel, p, c) for c, p in zip(cacc, (px, py, pz))
            )
        return mind, out, cacc, px, py, pz

    def body(j, carry):
        carry = step(2 * j + 1, carry)
        return step(2 * j + 2, carry)

    # seed: point 0 of each cloud = lane 0 of the group's FIRST row,
    # broadcast to every row of the group by a row-selector matmul
    r2 = lax.broadcasted_iota(jnp.int32, (_TB, _TB), 0)
    c2 = lax.broadcasted_iota(jnp.int32, (_TB, _TB), 1)
    S0 = jnp.where(c2 == (r2 // s) * s, 1.0, 0.0).astype(jnp.float32)
    p0 = tuple(
        jax.lax.dot(S0, p, precision=jax.lax.Precision.HIGHEST)
        for p in (xv[:, 0:1], yv[:, 0:1], zv[:, 0:1])
    )
    out0 = jnp.zeros((_TB, opad), jnp.int32)
    if collect:
        # seed (global index 0) coords land in output column 0 on every row
        cacc0 = tuple(
            jnp.where(out_col == 0, p, 0.0).astype(jnp.float32) for p in p0
        )
    else:
        cacc0 = ()
    carry = (mind0, out0, cacc0, *p0)
    n_pairs = (npoint - 1) // 2
    carry = lax.fori_loop(0, n_pairs, body, carry)
    for i in range(2 * n_pairs + 1, npoint):
        carry = step(i, carry)
    return carry[1], carry[2]


def _fps_kernel_split(n_real: int, npoint: int, s: int, xyz_ref, out_ref):
    # xyz_ref: (3, TB, chunk) f32 — split layout (s rows per cloud).
    out, _ = _fps_level_split(
        xyz_ref[0], xyz_ref[1], xyz_ref[2],
        n_real, npoint, out_ref.shape[-1], s,
    )
    out_ref[:, :] = out


def _fps_pyramid_kernel(n_real: int, npoints, xyz_ref, *out_refs):
    """Cascaded FPS pyramid in ONE kernel invocation.

    Level l samples ``npoints[l]`` points from the level-(l-1) subset; the
    selected coordinate planes flow between levels as register/VMEM values,
    so the XLA inter-level gathers, (…, 3)-minor relayouts, and kernel
    launches of the level-by-level composition never happen.  Indices are
    into the PREVIOUS level (gather-chain semantics identical to running
    ``farthest_point_sample`` + gather per level — the seed of level l is
    column 0 of level l-1's output, exactly the gathered cloud's row 0).
    """
    xv, yv, zv = xyz_ref[0], xyz_ref[1], xyz_ref[2]
    nr = n_real
    last = len(npoints) - 1
    for l, npt in enumerate(npoints):
        out, cacc = _fps_level(
            xv, yv, zv, nr, npt, out_refs[l].shape[-1], l < last
        )
        out_refs[l][:, :] = out
        if l < last:
            xv, yv, zv = cacc
            nr = npt


def _resplit(planes, s_data: int):
    """Re-split replicated coordinate planes for the next pyramid level.

    ``planes``: (TB, W) arrays where every row of a cloud group holds the
    SAME W selected coordinates (the collect output).  Returns (TB, W/s_data)
    chunks where row r holds chunk ``r % s_data``: one uniform lane roll per
    distinct chunk plus a row-parity select, then a lane slice.  (A single
    strided ``pltpu.roll`` would express this directly, but this Mosaic
    version silently IGNORES the stride on hardware — verified empirically;
    interpret mode honours it — so only uniform rolls are safe.)  Runs once
    per level transition, not per selection step: s_data-1 rolls of a
    (TB, W) plane are noise next to the level's npoint-step loop.
    """
    W = planes[0].shape[-1]
    chunk = W // s_data
    if s_data == 1:
        return planes
    rw = lax.broadcasted_iota(jnp.int32, (_TB, chunk), 0) % s_data
    outs = []
    for p in planes:
        acc = p[:, :chunk]                     # rows with rw == 0
        for m in range(1, s_data):
            rolled = pltpu.roll(p, W - m * chunk, 1)[:, :chunk]
            acc = jnp.where(rw == m, rolled, acc)
        outs.append(acc)
    return tuple(outs)


def _fps_pyramid_kernel_split(
    n_real: int, npoints, s: int, xyz_ref, *out_refs
):
    """Cascaded FPS pyramid, split layout (``s`` sublane rows per cloud).

    Level 0 runs on the wrapper's split input (row r holds chunk ``r % s``
    of its cloud).  The collect output replicates each level's selected
    coordinates across the group's rows, so the next level re-splits them
    in-register with one strided sublane roll (``_resplit``) — using
    ``s_data = min(s, W/128)`` once the level width W can no longer feed s
    lane-aligned chunks (rows then duplicate chunks; results identical).
    Index semantics match ``_fps_pyramid_kernel``: level l's indices address
    level l-1's sampled subset.
    """
    xv, yv, zv = xyz_ref[0], xyz_ref[1], xyz_ref[2]
    nr = n_real
    s_data = s
    last = len(npoints) - 1
    for l, npt in enumerate(npoints):
        out, cacc = _fps_level_split(
            xv, yv, zv, nr, npt, out_refs[l].shape[-1], s,
            s_data=s_data, collect=l < last,
        )
        out_refs[l][:, :] = out
        if l < last:
            W = out_refs[l].shape[-1]
            s_next = min(s, W // 128)
            while s_next & (s_next - 1):
                s_next -= 1          # largest power of two
            while s_next > 1 and (W // s_next) % 128:
                s_next //= 2         # keep chunks lane-aligned
            xv, yv, zv = _resplit(cacc, s_next)
            s_data = s_next
            nr = npt


# Split layout default: ON.  The round-3 one-hot-matmul tournament blew
# Mosaic compile past 6 min at production npoint and was parked opt-in; the
# round-4 sublane-roll butterfly compiles flat in npoint, so the split
# layout is now the default.  ``MOCOPCI_FPS_SPLIT=0`` is the escape hatch.
# Read ONCE at import (an env read inside the jitted wrapper would be
# baked into the trace per shape and silently ignore later toggles —
# round-3 advisor finding); tests flip it via ``set_fps_split``.
_SPLIT_ENABLED = os.environ.get("MOCOPCI_FPS_SPLIT", "1") != "0"
# minimum level-0 npoint for the split layout: below this the per-step
# cross-row tournament costs more than the s-fold distance-work saving
# (measured on v5e: wins at 2048, ~20% loss at 512).  Module constant so
# tests can engage split at interpret-friendly sizes.
_SPLIT_MIN_NPOINT = 1024


def set_fps_split(enabled: bool) -> None:
    """Toggle the split layout (tests/debugging).  Clears the jit caches so
    already-compiled shapes re-trace under the new setting."""
    global _SPLIT_ENABLED
    _SPLIT_ENABLED = bool(enabled)
    farthest_point_sample_pallas.clear_cache()
    farthest_point_sample_pyramid_pallas.clear_cache()


def _split_factor(B: int, N: int) -> int:
    """Largest power-of-two row split ``s`` such that the clouds still fit a
    grid cell (``B*s <= TB``) and the chunks stay lane-aligned.

    The split layout is oracle-exact (see ``tests/test_ops_sampling.py``)
    and cuts the selection loop's vector work by ``s``x at the live 2-4
    cloud call sites (refine head G=3, loss-pyramid downsampling)."""
    if not _SPLIT_ENABLED:
        return 1
    s = 1
    while B * (2 * s) <= _TB and N % (2 * s * 128) == 0 and N // (2 * s) >= 128:
        s *= 2
    return s


@functools.partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sample_pallas(
    xyz: jax.Array, npoint: int, interpret: bool = False
) -> jax.Array:
    """FPS: (B, N, 3) float -> (B, npoint) int32 indices."""
    B, N, _ = xyz.shape
    opad = _round_up(npoint, 128)
    s = _split_factor(B, N) if npoint >= _SPLIT_MIN_NPOINT else 1
    if s > 1:
        # split layout: cloud b -> s sublane rows of N/s contiguous points
        # each (full VPU occupancy at the live 2-4 cloud call sites)
        chunk = N // s
        xt = (
            xyz.astype(jnp.float32)
            .reshape(B * s, chunk, 3)
            .transpose(2, 0, 1)
        )                                                  # (3, B*s, chunk)
        bpad = _round_up(B * s, _TB)
        if bpad != B * s:
            xt = jnp.concatenate(
                [xt, jnp.zeros((3, bpad - B * s, chunk), jnp.float32)], axis=1
            )
        kernel = functools.partial(_fps_kernel_split, N, npoint, s)
        out = pl.pallas_call(
            kernel,
            grid=(bpad // _TB,),
            in_specs=[
                pl.BlockSpec(
                    (3, _TB, chunk), lambda b: (0, b, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (_TB, opad), lambda b: (b, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bpad, opad), jnp.int32),
            interpret=interpret,
        )(xt)
        return out[0 : B * s : s, :npoint]   # every row of a group agrees
    npad = _round_up(N, 128)
    bpad = _round_up(B, _TB)
    # (3, Bpad, Npad): coordinate planes, batch on sublanes, points on lanes.
    xt = jnp.zeros((3, bpad, npad), jnp.float32)
    xt = xt.at[:, :B, :N].set(xyz.astype(jnp.float32).transpose(2, 0, 1))

    kernel = functools.partial(_fps_kernel, N, npoint)
    out = pl.pallas_call(
        kernel,
        grid=(bpad // _TB,),
        in_specs=[
            pl.BlockSpec((3, _TB, npad), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_TB, opad), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, opad), jnp.int32),
        interpret=interpret,
    )(xt)
    return out[:B, :npoint]


@functools.partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sample_pyramid_pallas(
    xyz: jax.Array, npoints: tuple, interpret: bool = False
):
    """Cascaded FPS pyramid: (B, N, 3) -> tuple of (B, npoints[l]) int32.

    Level l's indices address level l-1's sampled subset (level 0 addresses
    the input cloud), matching ``fps; gather; fps; …`` exactly — but the
    whole cascade is ONE kernel launch and the intermediate clouds never
    leave VMEM (the encoder's level-by-level composition spent ~2x the level-0
    kernel time on XLA gathers and (…,3)-minor relayouts between levels).

    Split layout (default, ``_split_factor > 1``): each cloud's points
    spread over s sublane rows, cutting the dominant level-0 selection
    loop's vector work by s×; deeper levels re-split in-kernel
    (``_fps_pyramid_kernel_split``).
    """
    B, N, _ = xyz.shape
    opads = [_round_up(p, 128) for p in npoints]
    s = _split_factor(B, N) if npoints[0] >= _SPLIT_MIN_NPOINT else 1
    if s > 1:
        chunk = N // s
        xt = (
            xyz.astype(jnp.float32).reshape(B * s, chunk, 3).transpose(2, 0, 1)
        )                                                  # (3, B*s, chunk)
        bpad = _round_up(B * s, _TB)
        if bpad != B * s:
            xt = jnp.concatenate(
                [xt, jnp.zeros((3, bpad - B * s, chunk), jnp.float32)], axis=1
            )
        kernel = functools.partial(
            _fps_pyramid_kernel_split, N, tuple(npoints), s
        )
        outs = pl.pallas_call(
            kernel,
            grid=(bpad // _TB,),
            in_specs=[
                pl.BlockSpec(
                    (3, _TB, chunk), lambda b: (0, b, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=[
                pl.BlockSpec((_TB, op), lambda b: (b, 0), memory_space=pltpu.VMEM)
                for op in opads
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bpad, op), jnp.int32) for op in opads
            ],
            interpret=interpret,
        )(xt)
        # every row of a group agrees; keep the group's first row
        return tuple(o[0 : B * s : s, :p] for o, p in zip(outs, npoints))
    npad = _round_up(N, 128)
    bpad = _round_up(B, _TB)
    xt = jnp.zeros((3, bpad, npad), jnp.float32)
    xt = xt.at[:, :B, :N].set(xyz.astype(jnp.float32).transpose(2, 0, 1))

    kernel = functools.partial(_fps_pyramid_kernel, N, tuple(npoints))
    outs = pl.pallas_call(
        kernel,
        grid=(bpad // _TB,),
        in_specs=[
            pl.BlockSpec((3, _TB, npad), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((_TB, op), lambda b: (b, 0), memory_space=pltpu.VMEM)
            for op in opads
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bpad, op), jnp.int32) for op in opads
        ],
        interpret=interpret,
    )(xt)
    return tuple(o[:B, :p] for o, p in zip(outs, npoints))
