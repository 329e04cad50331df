"""Pallas build of the fusion-head pair planes from gathered neighbour rows.

The fusion head (ref ``fusion``, ``mocopci.py:798-819``) scores every
(query, neighbour) pair with an MLP over ``[resi, |resi|]`` features.  Our
head kernels (``fusion_head.py`` / ``fusion_head_train.py``) consume those
features as lane-dense ``(G, 4, P)`` planes (P = N·2k pairs, k-major).  The
XLA construction of the planes —

    rows (G, P, 3)  --transpose-->  (G, 3, P)  --sub/dist/concat-->  (G, 4, P)

— is the single most expensive non-matmul block of the B=2 train step: the
``(…, 3)``-minor tensors occupy 3 of 128 lanes, so the relayout and every
elementwise pass over them costs ~30-40× its bytes, and the backward replays
it all as ``transpose_jvp`` fusions (~19 ms forward + ~16 ms backward of the
69 ms fusion block, device-trace numbers in docs/DESIGN.md §3).

This kernel replaces the whole build with ONE streaming sweep (and one for
the backward):

  forward:  per (group, slot j, point chunk) read the ``(R, 3)`` neighbour
            row block, transpose it on the MXU (a K=3 ``dot_general`` with a
            constant identity — the 3-wide axis never touches the VPU as a
            lane axis), subtract the aligned ``(3, R)`` query plane slice,
            reduce the squared sum over 3 *sublanes* for the distance row,
            and write the finished ``(4, R)`` plane tile.
  backward: recompute resi/dist, form ``d_resi = dx[0:3] + dx[3] · resi/dist``,
            transpose back to a ``(R, 3)`` row-gradient block, and accumulate
            ``d_p1ᵗ -= Σ_j d_resi`` into a per-chunk plane block (slot axis
            innermost in the grid, so the accumulator block is revisited on
            consecutive grid steps).

The neighbour-row gather itself stays in XLA (``ops.gather`` — row gathers
run at hardware rate and its deterministic per-batch scatter-add VJP handles
d_points2); only the layout change and elementwise algebra move in here.

k-major pair order (p = j·N + n) is what makes the kernel this shape: a
``(R, 3)`` row block at pair offset j·N + t·R corresponds to the aligned
query slice ``p1ᵗ[:, t·R : t·R+R]``, so the query broadcast is a block reuse,
not a gather.

Dispatched in ``models/mocopci.py`` when running on TPU with N a multiple of
128; the plain XLA program remains the CPU twin and the fallback for tiny
shapes.  Interpret-mode parity tests: ``tests/test_fusion_planes.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-20  # under the sqrt: zero-distance pairs must not NaN the grad


def _block_r(n: int, cap: int = 8192) -> int:
    # largest 128-multiple divisor of N up to ``cap``: a (8192, 3) row block
    # is 4 MB of (lane-padded) VMEM, and one grid step per (group, slot)
    # keeps the step count at G·k2 instead of thousands of 2k-row steps.
    # The BACKWARD pass caps at 4096: it pipelines TWO (R, 3) row blocks
    # (nbr recompute + d_nbr output) plus the plane blocks, and at R=8192
    # the double-buffered working set (~16.5 MB) exceeds the 16 MB scoped
    # VMEM limit (observed compile OOM at FB=6 on v5e).
    if n % 128 != 0:
        raise ValueError(
            f"build_pair_planes needs N % 128 == 0, got N={n}; "
            "use the XLA plane build for tiny shapes"
        )
    for cand in range(min(n, cap), 0, -128):
        if n % cand == 0:
            return cand
    raise AssertionError(n)


def _eye(n: int):
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(jnp.float32)


def _rows_to_planes(rows):
    # (R, 3) -> (3, R) as a K=3 matmul: out[i, r] = Σ_c eye[i, c]·rows[r, c]
    return lax.dot_general(
        _eye(3), rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _planes_to_rows(planes):
    # (3, R) -> (R, 3): out[r, j] = Σ_c planes[c, r]·eye[c, j]
    return lax.dot_general(
        planes, _eye(3),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _resi_dist(nbr_ref, p1t_ref):
    resi = _rows_to_planes(nbr_ref[0]) - p1t_ref[0]        # (3, R)
    dist = jnp.sqrt(jnp.sum(resi * resi, axis=0, keepdims=True) + _EPS)
    return resi, dist


def _fwd_kernel(nbr_ref, p1t_ref, x_ref):
    resi, dist = _resi_dist(nbr_ref, p1t_ref)
    x_ref[0] = jnp.concatenate([resi, dist], axis=0)       # (4, R)


def _bwd_kernel(nbr_ref, p1t_ref, dx_ref, dnbr_ref, dp1t_ref):
    j = pl.program_id(2)
    resi, dist = _resi_dist(nbr_ref, p1t_ref)
    dx = dx_ref[0]                                         # (4, R)
    d_resi = dx[0:3] + dx[3:4] * (resi / dist)
    dnbr_ref[0] = _planes_to_rows(d_resi)

    @pl.when(j == 0)
    def _init():
        dp1t_ref[...] = jnp.zeros_like(dp1t_ref)

    dp1t_ref[0] -= d_resi


def _specs(G, N, P, R):
    NT = N // R
    nbr = pl.BlockSpec((1, R, 3), lambda g, t, j: (g, j * NT + t, 0),
                       memory_space=pltpu.VMEM)
    p1t = pl.BlockSpec((1, 3, R), lambda g, t, j: (g, 0, t),
                       memory_space=pltpu.VMEM)
    x = pl.BlockSpec((1, 4, R), lambda g, t, j: (g, 0, j * NT + t),
                     memory_space=pltpu.VMEM)
    return nbr, p1t, x, (G, NT, P // N)


def build_pair_planes(nbr, p1t, interpret: bool = False):
    """(G, P, 3) k-major neighbour rows + (G, 3, N) query planes ->
    (G, 4, P) ``[resi_xyz, dist]`` pair planes (differentiable)."""
    return _bpp(nbr, p1t, bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bpp(nbr, p1t, interpret):
    return _bpp_fwd(nbr, p1t, interpret)[0]


def _bpp_fwd(nbr, p1t, interpret):
    G, P, _ = nbr.shape
    N = p1t.shape[2]
    assert P % N == 0, (P, N)
    R = _block_r(N)
    nbr_s, p1t_s, x_s, grid = _specs(G, N, P, R)
    x = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[nbr_s, p1t_s],
        out_specs=x_s,
        out_shape=jax.ShapeDtypeStruct((G, 4, P), jnp.float32),
        interpret=interpret,
    )(nbr, p1t)
    return x, (nbr, p1t)


def _bpp_bwd(interpret, res, dx):
    nbr, p1t = res
    G, P, _ = nbr.shape
    N = p1t.shape[2]
    R = _block_r(N, cap=4096)
    nbr_s, p1t_s, x_s, grid = _specs(G, N, P, R)
    d_nbr, d_p1t = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[nbr_s, p1t_s, x_s],
        out_specs=[nbr_s, p1t_s],
        out_shape=[
            jax.ShapeDtypeStruct((G, P, 3), jnp.float32),
            jax.ShapeDtypeStruct((G, 3, N), jnp.float32),
        ],
        interpret=interpret,
    )(nbr, p1t, dx)
    return d_nbr, d_p1t


_bpp.defvjp(_bpp_fwd, _bpp_bwd)


def gather_pair_planes(points2, idx, p1t, interpret: bool = False):
    """Fused neighbour-gather + pair-plane build with an all-planes backward.

    Forward = ``ops.gather(points2, idx)`` (XLA row gather, hardware rate)
    feeding the ``_fwd_kernel`` sweep above.  The win is the BACKWARD: the
    split ops chain (``build_pair_planes`` VJP → row-layout ``d_nbr`` →
    gather VJP scatter) pays a (R, 3) row-block write sweep (3/128 lane
    occupancy), an (S, 3)-minor relayout, and the scatter; here the saved
    primal output ``x`` already holds resi/dist as LANE-DENSE planes, so

        d_resi = dx[:, 0:3] + dx[:, 3:4] · resi / dist

    is plain fused XLA elementwise over (G, 4, P) planes, ``d_p1t`` is an
    aligned slot-sum (k-major pair order), and ``d_points2`` goes straight
    through ``bucket_scatter_add_planes`` — no row-major tensor is ever
    touched in the backward.

    Args:
      points2: (G, N2, 3) f32 neighbour table (differentiable).
      idx:     (G, P) int32 flat k-major neighbour indices (non-diff).
      p1t:     (G, 3, N) f32 query planes (differentiable); P % N == 0.
    Returns:
      (G, 4, P) ``[resi_xyz, dist]`` pair planes.
    """
    return _gpp(points2, idx, p1t, bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gpp(points2, idx, p1t, interpret):
    return _gpp_fwd(points2, idx, p1t, interpret)[0]


def _gpp_fwd(points2, idx, p1t, interpret):
    import os

    from mocopci_tpu.ops.sampling import gather

    n2 = points2.shape[1]
    n = p1t.shape[2]
    p = idx.shape[1]
    if (
        not interpret
        and jax.default_backend() == "tpu"
        and n2 % 128 == 0
        and n % 128 == 0
        and p % n == 0
        and os.environ.get("MOCOPCI_GATHER_PLANES") != "rows"  # escape hatch
    ):
        # radix-factorized MXU gather+build — bit-identical to the row-gather
        # build and ~2× faster (gather_planes.py).  Assumes idx ∈ [0, n2)
        # (the kNN contract; the row-gather twin clips instead).
        from mocopci_tpu.ops.pallas.gather_planes import (
            bucket_gather_pair_planes,
        )

        x = bucket_gather_pair_planes(
            jax.lax.stop_gradient(points2), idx, jax.lax.stop_gradient(p1t)
        )
    else:
        nbr = gather(points2, idx)                         # (G, P, 3)
        x = _bpp_fwd(jax.lax.stop_gradient(nbr), jax.lax.stop_gradient(p1t),
                     interpret)[0]
    return x, (x, idx, n2, n)


def _gpp_bwd(interpret, res, dx):
    from mocopci_tpu.ops.pallas.scatter_bucket import bucket_scatter_add_planes

    x, idx, n2, n = res
    G, _, P = x.shape
    resi = x[:, 0:3]
    dist = x[:, 3:4]
    d_resi = dx[:, 0:3] + dx[:, 3:4] * (resi / dist)       # (G, 3, P) planes
    d_p2 = bucket_scatter_add_planes(d_resi, idx, n2, True, interpret)
    d_p2 = d_p2.astype(x.dtype)
    # d_p1t = -Σ_j d_resi over the k2 neighbour slots (k-major pair order:
    # each slot is an aligned (3, N) lane-dense block, so this is a plain
    # axis reduce — no strided interleave)
    d_p1t = -jnp.sum(d_resi.reshape(G, 3, P // n, n), axis=2)
    return d_p2, None, d_p1t


_gpp.defvjp(_gpp_fwd, _gpp_bwd)


def build_pair_planes_xla(nbr, p1t):
    """CPU/tiny-shape twin: the plain XLA plane build from the same inputs."""
    G, P, _ = nbr.shape
    k2 = P // p1t.shape[2]
    resi = nbr.transpose(0, 2, 1) - jnp.tile(p1t, (1, 1, k2))
    dist = jnp.sqrt(jnp.sum(resi * resi, axis=1, keepdims=True) + _EPS)
    return jnp.concatenate([resi, dist], axis=1)
