"""Approximate Earth Mover's Distance (auction/annealing matching).

TPU-native re-derivation of the reference CUDA extension
(``models/EMD/cuda/emd_kernel.cu``):

  - ``approx_match``      ≙ ``approxmatch`` kernel (``emd_kernel.cu:30-162``):
    10 annealing iterations with temperature ``level = -4^j`` for
    ``j = 7..-1`` and ``level = 0`` for the final iteration
    (``emd_kernel.cu:50-54``), soft mass assignment with remaining-capacity
    bookkeeping on both sides.
  - ``match_cost``        ≙ ``matchcost`` kernel (``emd_kernel.cu:205-283``):
    ``cost_b = Σ_{k,l} match[l,k]·‖p1_k − p2_l‖²``.
  - custom VJP            ≙ ``matchcostgrad1/2`` (``emd_kernel.cu:291-402``):
    the match matrix is treated as a constant;
    ``∂cost/∂p1_k = Σ_l 2·match[l,k]·(p1_k − p2_l)`` and symmetrically for p2.

The CUDA kernel's shared-memory tiling disappears: each annealing step is two
(B,N,M)-shaped ``exp``-weighted matvecs plus one outer-product update, which
XLA maps straight onto the MXU/VPU.  The whole loop is a ``lax.scan`` over the
10 temperature levels.  Matches the integer-division capacity initialisation
(``multiL = m/n`` etc., ``emd_kernel.cu:33-39``).

``emd`` mirrors ``EMD`` (``models/utils.py:223-235``): mean over batch of
cost / point-count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mocopci_tpu.ops.distance import square_distance

_LEVELS = tuple(-(4.0 ** j) for j in range(7, -2, -1)) + (0.0,)


def approx_match(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Approximate bipartite match matrix.

    Args:
      xyz1: (B, N, 3)
      xyz2: (B, M, 3)
    Returns:
      match: (B, M, N) — same layout as the CUDA op (rows index xyz2).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    d = square_distance(xyz1, xyz2)  # (B, n, m)

    # integer-division capacity init, as in emd_kernel.cu:33-39
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0

    levels = jnp.asarray(_LEVELS, jnp.float32)

    def step(carry, level):
        match, remain_l, remain_r = carry
        kern = jnp.exp(level * d)  # (B, n, m)
        # A: per-xyz1 normaliser over remaining xyz2 capacity
        suml = jnp.einsum("bnm,bm->bn", kern, remain_r,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) + 1e-9
        ratio_l = remain_l / suml
        # B: per-xyz2 consumption
        sumr = jnp.einsum("bnm,bn->bm", kern, ratio_l,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # C: mass transfer
        w = kern * ratio_l[:, :, None] * ratio_r[:, None, :]  # (B, n, m)
        match = match + w.transpose(0, 2, 1)
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
        return (match, remain_l, remain_r), None

    init = (
        jnp.zeros((B, m, n), jnp.float32),
        jnp.full((B, n), multi_l, jnp.float32),
        jnp.full((B, m), multi_r, jnp.float32),
    )
    (match, _, _), _ = lax.scan(step, init, levels)
    return match


def match_cost(xyz1: jax.Array, xyz2: jax.Array, match: jax.Array) -> jax.Array:
    """Σ match·‖p1−p2‖² per batch element: (B,)."""
    d = square_distance(xyz1, xyz2)  # (B, n, m)
    return jnp.einsum("bmn,bnm->b", match, d, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


@jax.custom_vjp
def earth_mover_distance(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Approximate EMD cost per batch element (B,), gradient wrt both clouds."""
    match = approx_match(xyz1, xyz2)
    return match_cost(xyz1, xyz2, match)


def _emd_fwd(xyz1, xyz2):
    match = approx_match(xyz1, xyz2)
    cost = match_cost(xyz1, xyz2, match)
    return cost, (xyz1, xyz2, match)


def _emd_bwd(res, g):
    xyz1, xyz2, match = res
    # grad1[k] = 2 Σ_l match[l,k] (p1_k − p2_l) · g    (emd_kernel.cu:338-359)
    # grad2[l] = 2 Σ_k match[l,k] (p2_l − p1_k) · g    (emd_kernel.cu:291-331)
    mass1 = jnp.sum(match, axis=1)  # (B, n)
    mass2 = jnp.sum(match, axis=2)  # (B, m)
    mp2 = jnp.einsum("bmn,bmc->bnc", match, xyz2,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    mp1 = jnp.einsum("bmn,bnc->bmc", match, xyz1,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    grad1 = 2.0 * (mass1[..., None] * xyz1 - mp2) * g[:, None, None]
    grad2 = 2.0 * (mass2[..., None] * xyz2 - mp1) * g[:, None, None]
    return grad1, grad2


earth_mover_distance.defvjp(_emd_fwd, _emd_bwd)


@jax.jit
def emd(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Mean EMD normalised by point count — ref ``EMD`` (``models/utils.py:223-235``)."""
    cost = earth_mover_distance(pc1, pc2)
    return jnp.mean(cost) / pc1.shape[1]
