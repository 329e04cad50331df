"""Farthest point sampling as a Pallas TPU kernel.

Semantics match the reference CUDA kernel (``pointnet2/src/sampling_gpu.cu:93-253``):
seed index 0, running min-distance buffer initialised to 1e10, greedy argmax.
The CUDA version runs one thread-block per batch element with a shared-memory
tree reduction per step; here one grid program per batch element keeps the
whole (3, N) coordinate tile and the (1, N) min-distance field in VMEM and the
selection loop never touches HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(n_real: int, npoint: int, xyz_ref, out_ref):
    # xyz_ref: (1, 8, Npad) f32 in VMEM — rows 0..2 are x/y/z, rest padding.
    # out_ref: (1, 1, npoint) int32 in SMEM.
    npad = xyz_ref.shape[-1]
    xv = xyz_ref[0, 0:1, :]
    yv = xyz_ref[0, 1:2, :]
    zv = xyz_ref[0, 2:3, :]
    lane = lax.broadcasted_iota(jnp.int32, (1, npad), dimension=1)
    valid = lane < n_real
    mind0 = jnp.where(valid, jnp.full((1, npad), 1e10, jnp.float32), -1.0)

    out_ref[0, 0, 0] = 0

    def body(i, carry):
        # carry: (mind, last-selected point's coords as (1,1) scalars)
        mind, px, py, pz = carry
        d = (xv - px) ** 2 + (yv - py) ** 2 + (zv - pz) ** 2
        mind = jnp.minimum(mind, jnp.where(valid, d, -1.0))
        nxt = jnp.argmax(mind[0, :]).astype(jnp.int32)
        out_ref[0, 0, i] = nxt
        # masked reduction instead of dynamic gather (Mosaic-friendly)
        sel = lane == nxt
        px = jnp.sum(jnp.where(sel, xv, 0.0), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(sel, yv, 0.0), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(sel, zv, 0.0), axis=1, keepdims=True)
        return mind, px, py, pz

    p0 = (xv[:, 0:1], yv[:, 0:1], zv[:, 0:1])
    lax.fori_loop(1, npoint, body, (mind0, *p0))


@functools.partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sample_pallas(
    xyz: jax.Array, npoint: int, interpret: bool = False
) -> jax.Array:
    """FPS: (B, N, 3) float -> (B, npoint) int32 indices."""
    B, N, _ = xyz.shape
    npad = _round_up(N, 128)
    # (B, 8, Npad) layout: coords on sublanes, points on lanes.
    xt = jnp.zeros((B, 8, npad), jnp.float32)
    xt = xt.at[:, :3, :N].set(xyz.astype(jnp.float32).transpose(0, 2, 1))

    kernel = functools.partial(_fps_kernel, N, npoint)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, npad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        interpret=interpret,
    )(xt)
    return out[:, 0, :]
