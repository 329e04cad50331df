"""Radix-factorized MXU scatter-add: the large-S row-gather backward.

``bucket_scatter_add`` computes ``out[n, c] = Σ_s v[s, c]·1[idx[s] == n]``
(the gradient of a row gather; ref semantics: the CUDA ``atomicAdd``
scatters of ``group_points_gpu.cu:24`` / ``sampling_gpu.cu:60``, here
deterministic) without ever materializing an (S, N) one-hot.

The trick: split the target index by lane radix, ``idx = H·128 + L``.  Then

    out[(H, c), L] = Σ_s  U[H, s] · v[c, s] · V[L, s]
                   = Σ_s  W[(H, c), s] · V[L, s]         (a matmul!)

with ``U[H, s] = 1[idx[s]>>7 == H]`` and ``V[L, s] = 1[idx[s]&127 == L]``.
``W = U ⊙ v`` is only (N/128·C, S) and ``V`` (128, S) — built on the VPU in
O(S·N/128·C) compare/selects — and the O(S·N·C) multiply-adds of the one-hot
contraction run on the MXU as a lane-contraction ``W Vᵀ`` with a resident
(N/128·C, 128) f32 VMEM accumulator.

Everything streams LANE-DENSE: values enter as (C, S) planes and indices as
(1, S) rows, with source position s on lanes throughout.  This matters more
than the math (measured on v5e, fusion-gather shape G=6, S=524288, N=8192,
C=3 — the B=2 train step's dominant backward):
  - XLA's scatter emitter: ~3.2 ms per group (serial read-modify-write),
    19.4 ms for the train step's six + a 4.9 ms (S, 3)-minor relayout;
  - the same kernel fed (ts, 3) row blocks: 12 ms of DMA alone (3/128 lane
    occupancy) + 3.5 ms of grid overhead at ts=1024;
  - this kernel, all six groups: **4.5 ms** (split) / 7.5 ms (f32-exact),
    including the (G, S, 3) → (G, 3, S) XLA transpose in the rows wrapper.

The matmuls run in SPLIT precision by default: ``W = W_hi + W_lo`` with two
bf16 single-pass products accumulated in f32 (~1.5e-5 relative error — the
one-hot ``V`` is exact in bf16) instead of the 6-pass f32 path (+3 ms).
``split=3`` adds the third Dekker term (8+8+8 mantissa bits ≥ f32's 24, each
residual subtraction exact in f32), reconstructing the f32 values to the
accumulation ulp at +1 single-pass matmul — used where the XLA twin's exact
gradients are the contract (the Chamfer VJP, ``chamfer_pair.py``).

Out-of-range targets (idx < 0 or >= N) match no radix digit pair and are
dropped — the ``mode="drop"`` semantics the gather VJP needs.  Requires
N % 128 == 0 (all production cloud sizes are powers of two).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_LANES = 128


def _kernel(C: int, H: int, split: bool, v_ref, idx_ref, out_ref):
    """Grid (G, S/ts), s innermost; out block (1, H*C, 128) revisited over s."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    vp = v_ref[0]                                  # (C, ts) value planes
    idx = idx_ref[0]                               # (1, ts) int32 targets
    hi = idx >> 7                                  # arithmetic shift: floor div
    lo = idx & (_LANES - 1)

    # W[r, s] = vp[r % C, s] where hi[s] == r // C, else 0   — (H*C, ts)
    # v_rep is a pure sublane replication (vp tiled H times): broadcast +
    # reshape, ONE pass — the former per-channel where-chain was O(C) passes
    # over the (H·C, ts) plane, which priced C=64 callers out of the kernel
    # (the gate below C ≤ 4 existed because of it).
    r_iota = lax.broadcasted_iota(jnp.int32, (H * C, 1), 0)
    h_of_r = r_iota // C
    v_rep = jnp.broadcast_to(vp[None], (H, C, vp.shape[-1])).reshape(
        H * C, vp.shape[-1]
    )
    W = jnp.where(hi == h_of_r, v_rep, 0.0)        # (H*C, ts)

    sub = lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
    contract = (((1,), (1,)), ((), ()))            # both operands: s on lanes
    if split:
        # bf16 Dekker split of W: the one-hot V only SELECTS, so each term's
        # product is exact; 2 terms ≈ 1.5e-5 relative, 3 terms (8+8+8
        # mantissa bits ≥ f32's 24; each residual subtraction exact in f32)
        # reconstruct the f32 values to the accumulation ulp.
        nterms = 2 if split is True else int(split)
        Vb = (lo == sub).astype(jnp.bfloat16)      # (128, ts) — exact in bf16
        p = jnp.zeros((W.shape[0], _LANES), jnp.float32)
        res = W
        for _ in range(nterms):
            Wt = res.astype(jnp.bfloat16)
            p = p + lax.dot_general(Wt, Vb, contract,
                                    preferred_element_type=jnp.float32)
            res = res - Wt.astype(jnp.float32)
    else:
        V = (lo == sub).astype(jnp.float32)
        p = lax.dot_general(W, V, contract, preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
    out_ref[0] += p                                # (H*C, 128)


def _tile(HC: int, S: int) -> int:
    # W is the VMEM governor: f32 (HC, ts) + two bf16 copies + V ≈ 2.5×.
    # Budget ~10 MB of the 16 MB scoped limit.
    for ts in (4096, 2048, 1024, 512, 256, 128):
        if HC * ts * 10 <= 10 * 2**20 and ts <= S:
            return ts
    return 128


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def bucket_scatter_add_planes(
    v: jax.Array, idx: jax.Array, n_rows: int,
    split = True, interpret: bool = False,
) -> jax.Array:
    """(G, C, S) value planes + (G, S) int32 targets -> (G, n_rows, C) sums.

    ``out[g, n, c] = Σ_s v[g, c, s]·1[idx[g, s] == n]``; out-of-range targets
    dropped.  n_rows % 128 == 0 required.  ``split``: False = f32 HIGHEST
    matmuls; True/2 = two bf16 Dekker terms (~1.5e-5 relative); 3 = exact
    three-term reconstruction (default for gradient-exactness-sensitive
    callers like the Chamfer VJP).
    """
    G, C, S = v.shape
    assert n_rows % _LANES == 0, n_rows
    H = n_rows // _LANES
    ts = _tile(H * C, S)
    if S % ts != 0:
        pad = ts - S % ts
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        S += pad
    out = pl.pallas_call(
        functools.partial(_kernel, C, H, split),
        grid=(G, S // ts),
        in_specs=[
            pl.BlockSpec((1, C, ts), lambda g, s: (g, 0, s)),
            pl.BlockSpec((1, 1, ts), lambda g, s: (g, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, H * C, _LANES), lambda g, s: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, H * C, _LANES), jnp.float32),
        interpret=interpret,
    )(v.astype(jnp.float32), idx.astype(jnp.int32)[:, None, :])
    # (G, H*C, 128) rows are (H, c) pairs; n = H*128 + L.
    return (
        out.reshape(G, H, C, _LANES).transpose(0, 1, 3, 2).reshape(G, n_rows, C)
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def bucket_scatter_add(
    v: jax.Array, idx: jax.Array, n_rows: int,
    split = True, interpret: bool = False,
) -> jax.Array:
    """(G, S, C) value rows + (G, S) int32 targets -> (G, n_rows, C) sums.

    Row-layout wrapper: one XLA transpose to planes (cheap next to a
    lane-padded (ts, C) block stream — see module docstring), then the
    plane kernel.
    """
    return bucket_scatter_add_planes(
        v.transpose(0, 2, 1), idx, n_rows, split, interpret
    )
