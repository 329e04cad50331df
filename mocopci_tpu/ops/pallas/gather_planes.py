"""Radix-factorized MXU gather: pair planes straight from the point table.

The forward twin of ``scatter_bucket.py``.  The fusion head's plane build
needs ``resi[c, p] = points2[c, idx[p]] − p1ᵗ[c, n(p)]`` for P = N·2k pairs;
the XLA row gather feeding it moves only ~38 MB but pays per-row descriptor
rate on 12-byte rows — measured 11.5 ms of the 11.75 ms plane build at the
B=2 train shape (``scripts/fusion_plane_experiments.py``), ~3.7 ns/row.

Radix-split the table index by lanes, ``idx = H·128 + L``.  Then

    gath[c, s] = tab[c, idx[s]]
               = Σ_H 1[idx[s]>>7 == H] · (Σ_L tab5[(c,H), L] · V[L, s])

with ``V[L, s] = 1[idx[s]&127 == L]`` and ``tab5`` simply ``tab`` reshaped
to (C·H, 128) — the inner sum is ONE MXU lane-contraction producing
``M[(c,H), s] = tab[c, H·128 + lo[s]]`` for every hi bucket at once, and the
outer sum is a 1-of-H sublane masked reduce on the VPU (H = M/128 = 64 at
production size, the cheap digit).  No (S, 3)-minor tensor, no per-row
descriptors: the O(C·H·128·S) multiply-adds ride the MXU.

Precision: the one-hot ``V`` is exact in bf16 and a one-hot matmul only
*selects*, so a THREE-term bf16 Dekker split of the table (8+8+8 mantissa
bits ≥ f32's 24; each residual subtraction is exact in f32) reconstructs the
f32 coordinates exactly — the planes are bit-identical to the XLA gather
build up to the final f32 subtract/sqrt, which is performed identically.
The three terms stack on sublanes into ONE (3·C·H, 128) operand so the
selection stays a single MXU pass per tile.

The kernel fuses the rest of the plane build: k-major pair tiles share an
aligned query-plane slice (pair p = j·N + n ⇒ an aligned (3, ts) block of
p1ᵗ), so resi/dist are computed in-register and written as finished
``(4, ts)`` plane tiles.  The combined op keeps the all-planes custom VJP of
``fusion_planes.gather_pair_planes`` (scatter-add via ``scatter_bucket``,
slot-sum for d_p1ᵗ).

Requires M % 128 == 0, ts | N, ts | P; indices must lie in [0, M) (kNN
output).  Interpret-mode parity tests: ``tests/test_gather_planes.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_EPS = 1e-20  # match fusion_planes._EPS


def _kernel(C: int, H: int, N: int, ts: int,
            tab3_ref, idx_ref, p1t_ref, x_ref):
    s = pl.program_id(1)
    n0 = pl.multiple_of((s * ts) % N, 128)         # aligned query offset

    idx = idx_ref[0]                               # (1, ts) int32
    hi = idx >> 7
    lo = idx & (_LANES - 1)

    sub = lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
    contract = (((1,), (0,)), ((), ()))            # (3·C·H, 128) × (128, ts)
    Vb = (lo == sub).astype(jnp.bfloat16)          # (128, ts) — exact in bf16
    CH = C * H
    m3 = lax.dot_general(tab3_ref[0], Vb, contract,
                         preferred_element_type=jnp.float32)
    m = m3[0:CH] + m3[CH : 2 * CH] + m3[2 * CH :]  # exact f32 reconstruction
    # m[(c, h), s] = tab[c, h·128 + lo[s]]; keep the row whose h == hi[s]
    h_iota = lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    sel = (hi[None] == h_iota).astype(jnp.float32)             # (1, H, ts)
    gath = jnp.sum(m.reshape(C, H, ts) * sel, axis=1)          # (C, ts)

    resi = gath - p1t_ref[0, :, pl.ds(n0, ts)]                 # (C, ts)
    dist = jnp.sqrt(jnp.sum(resi * resi, axis=0, keepdims=True) + _EPS)
    x_ref[0] = jnp.concatenate([resi, dist], axis=0)           # (4, ts)


def _tile(N: int, P: int) -> int:
    for ts in (4096, 2048, 1024, 512, 256, 128):
        if N % ts == 0 and P % ts == 0 and ts <= N:
            return ts
    raise ValueError((N, P))


@functools.partial(jax.jit, static_argnums=(3,))
def bucket_gather_pair_planes(
    points2: jax.Array, idx: jax.Array, p1t: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """(G, M, 3) table + (G, P) flat k-major indices + (G, 3, N) query planes
    -> (G, 4, P) ``[resi_xyz, dist]`` pair planes (forward only — the
    differentiable wrapper lives in ``fusion_planes.gather_pair_planes``)."""
    G, M, C = points2.shape
    _, P = idx.shape
    N = p1t.shape[2]
    assert M % _LANES == 0, M
    H = M // _LANES
    ts = _tile(N, P)

    # (G, 3·C·H, 128) bf16 three-term Dekker split of the table: each
    # residual subtraction is exact in f32 and 3×8 mantissa bits cover f32's
    # 24, so the in-kernel sum of the three selected terms is the exact f32
    # coordinate.
    tab5 = points2.astype(jnp.float32).transpose(0, 2, 1).reshape(G, C * H,
                                                                  _LANES)
    tabh = tab5.astype(jnp.bfloat16)
    r1 = tab5 - tabh.astype(jnp.float32)
    tabm = r1.astype(jnp.bfloat16)
    tabl = (r1 - tabm.astype(jnp.float32)).astype(jnp.bfloat16)
    tab3 = jnp.concatenate([tabh, tabm, tabl], axis=1)

    return pl.pallas_call(
        functools.partial(_kernel, C, H, N, ts),
        grid=(G, P // ts),
        in_specs=[
            pl.BlockSpec((1, 3 * C * H, _LANES), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts), lambda g, s: (g, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C + 1, ts), lambda g, s: (g, 0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, C + 1, P), jnp.float32),
        interpret=interpret,
    )(tab3, idx.astype(jnp.int32)[:, None, :], p1t.astype(jnp.float32))
