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

import os

import jax
import jax.numpy as jnp
from jax import lax

from mocopci_tpu.ops.distance import square_distance

_LEVELS = tuple(-(4.0 ** j) for j in range(7, -2, -1)) + (0.0,)

# Fast-exp mode (VERDICT r4 #8): the annealing loop evaluates exp(level·d)
# over every (n, m) pair at every level — 671M transcendentals at 8192²,
# the VPU floor of the eval-dominating EMD.  The fast mode replaces exp with
# a short exponent-construction sequence: split x·log2e into integer k and
# fraction f, build 2^k by assembling the f32 exponent field directly
# (bitcast), and take 2^f from a degree-3 polynomial (max rel err 1.9e-4 on
# f ∈ [−½, ½]) — ~8 single-cycle VPU ops instead of a transcendental.  The
# metric-level shift this induces is bounded by the tolerance test in
# tests/test_ops_losses.py (≲1e-4 relative, far inside the approximation
# error of the annealing itself).  Read at trace time — set before
# jit-tracing, like set_knn_mode.
_FAST_EXP = os.environ.get("MOCOPCI_EMD_FAST") == "1"


def set_emd_fast(enabled: bool) -> None:
    """Enable the fast-exp EMD kernel (trace-time switch)."""
    global _FAST_EXP
    _FAST_EXP = bool(enabled)


_LOG2E = 1.4426950408889634
# least-squares degree-3 fit of 2^f on [-0.5, 0.5] (scripts: see commit)
_EXP2_C0 = 0.99994823
_EXP2_C1 = 0.69312726
_EXP2_C2 = 0.24229463
_EXP2_C3 = 0.05587554


def _exp_kernel(x: jax.Array) -> jax.Array:
    """exp(x) for x <= 0 — exact jnp.exp, or the fast exp2-construction.

    Deeply-negative arguments (z < −126) flush to exactly 0.0 via the
    exponent-field clamp — same tail behaviour as expf underflow.
    """
    if not _FAST_EXP:
        return jnp.exp(x)
    z = jnp.maximum(x * _LOG2E, -200.0)                # keep int32-safe
    k = jnp.round(z)
    f = z - k
    p = _EXP2_C0 + f * (_EXP2_C1 + f * (_EXP2_C2 + f * _EXP2_C3))
    e = jnp.maximum(k.astype(jnp.int32) + 127, 0) << 23
    return lax.bitcast_convert_type(e, jnp.float32) * p


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
        kern = _exp_kernel(level * d)  # (B, n, m)
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


# ---------------------------------------------------------------------------
# Memory-bounded (blocked) EMD for stress sizes (SURVEY.md §7 hard-part 1).
#
# The dense path holds d (B,n,m), the exp kernel, and the match (B,m,n) live —
# ~1-4 GB/sample at 16k-32k points.  Observation: the annealing loop's mass
# transfer is SEPARABLE per level:
#     w_i[n,m] = exp(level_i·d[n,m]) · rl_i[n] · rr_i[m]
#     match    = Σ_i w_i
# so the entire match matrix is determined by the 10 (ratio_l, ratio_r) vector
# pairs, O(10·(n+m)) state.  Every quantity the algorithm needs — the three
# per-level matvecs of the annealing loop, the final cost, and both gradients
# (ref ``matchcostgrad1/2``, ``emd_kernel.cu:291-402``) — is a kernel matvec
#     out[n] = Σ_m exp(level·d[n,m]) [· d[n,m]] · v[m]
# evaluated here in query chunks with the distance tile recomputed on the fly
# (never materializing (B,n,m)).  This is also a large training-memory win:
# the VJP residuals shrink from the O(n·m) match matrix to the ratio vectors.
# ---------------------------------------------------------------------------

_EMD_DENSE_LIMIT = 1 << 24  # 16M entries (~64 MB fp32) per batch element
# per-chunk tile budget for the blocked matvecs: the (chunk, nb) distance
# tile is recomputed on the fly, so the chunk should be as wide as the
# budget allows — lax.map serialisation of narrow chunks cost ~30% at 8192²
# (28.5 ms at chunk 1024 vs 21.6 ms unchunked, v5e)
_EMD_TILE_ENTRIES = 1 << 26  # 64M entries (256 MB fp32) per tile
_EMD_CHUNK = 1024            # minimum chunk


def _chunk_for(nb: int, batch: int = 1) -> int:
    # budget covers the full (B, chunk, nb) tile — at B=1/8192² this keeps the
    # unchunked fast path; larger batches shrink the chunk so the transient
    # distance tile stays at _EMD_TILE_ENTRIES
    per_b = _EMD_TILE_ENTRIES // max(nb * batch, 1)
    return max(per_b // 1024 * 1024, _EMD_CHUNK)


def _kernel_matvec(level, xa, xb, v, vd=None):
    """Chunked kernel matvec.

    out[b,n,:] = Σ_m exp(level·d[b,n,m]) · v[b,m,:]
    outd[b,n,:] = Σ_m exp(level·d[b,n,m]) · d[b,n,m] · vd[b,m,:]  (if vd given)

    xa: (B,na,3), xb: (B,nb,3), v: (B,nb,C), vd: (B,nb,Cd) or None.
    Chunked over the query (na) axis; the (chunk, nb) tile is recomputed from
    xyz on the fly.
    """
    B, na, _ = xa.shape
    chunk = _chunk_for(xb.shape[1], B)

    def one(xa_c):
        d = square_distance(xa_c, xb)
        kern = _exp_kernel(level * d)
        out = jnp.einsum("bnm,bmc->bnc", kern, v,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        if vd is None:
            return (out,)
        outd = jnp.einsum("bnm,bmc->bnc", kern * d, vd,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return (out, outd)

    if na <= chunk:
        res = one(xa)
        return res if vd is not None else res[0]
    nc = -(-na // chunk)
    pad = nc * chunk - na
    xp = jnp.pad(xa, ((0, 0), (0, pad), (0, 0)))
    chunks = xp.reshape(B, nc, chunk, 3).transpose(1, 0, 2, 3)
    res = jax.lax.map(one, chunks)          # tuple of (nc, B, chunk, C)
    res = tuple(
        r.transpose(1, 0, 2, 3).reshape(B, nc * chunk, -1)[:, :na] for r in res
    )
    return res if vd is not None else res[0]


def _annealing_vectors(xyz1, xyz2):
    """Run the 10-level annealing loop with blockwise matvecs.

    Returns (rls (L,B,n), rrs (L,B,m), cost (B,)) — the separable match
    representation plus the match cost accumulated on the fly.
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0
    levels = jnp.asarray(_LEVELS, jnp.float32)

    def step(carry, level):
        remain_l, remain_r = carry
        suml = _kernel_matvec(level, xyz1, xyz2, remain_r[..., None])[..., 0] + 1e-9
        ratio_l = remain_l / suml
        sumr = (
            _kernel_matvec(level, xyz2, xyz1, ratio_l[..., None])[..., 0] * remain_r
        )
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # one sweep yields both Σ_m w (for remain_l) and the cost contribution
        kr, krd = _kernel_matvec(
            level, xyz1, xyz2, ratio_r[..., None], ratio_r[..., None]
        )
        sum_w = ratio_l * kr[..., 0]
        cost_i = jnp.sum(ratio_l * krd[..., 0], axis=1)
        remain_l = jnp.maximum(0.0, remain_l - sum_w)
        return (remain_l, remain_r), (ratio_l, ratio_r, cost_i)

    init = (
        jnp.full((B, n), multi_l, jnp.float32),
        jnp.full((B, m), multi_r, jnp.float32),
    )
    (_, _), (rls, rrs, costs) = lax.scan(step, init, levels)
    return rls, rrs, jnp.sum(costs, axis=0)


@jax.custom_vjp
def _emd_blocked(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    _, _, cost = _annealing_vectors(xyz1, xyz2)
    return cost


def _emd_blocked_fwd(xyz1, xyz2):
    rls, rrs, cost = _annealing_vectors(xyz1, xyz2)
    return cost, (xyz1, xyz2, rls, rrs)


def _emd_blocked_bwd(res, g):
    xyz1, xyz2, rls, rrs = res
    levels = jnp.asarray(_LEVELS, jnp.float32)

    def side(xa, xb, ra_all, rb_all):
        # mass[n] = Σ_i ra_i[n]·(K_i @ rb_i)[n];  mp[n] = Σ_i ra_i[n]·(K_i @ (rb_i·xb))[n]
        def level_term(carry, inp):
            mass, mp = carry
            level, ra, rb = inp
            rhs = jnp.concatenate([rb[..., None], rb[..., None] * xb], axis=-1)
            out = _kernel_matvec(level, xa, xb, rhs)       # (B,na,4)
            mass = mass + ra * out[..., 0]
            mp = mp + ra[..., None] * out[..., 1:]
            return (mass, mp), None

        B, na, _ = xa.shape
        init = (jnp.zeros((B, na), jnp.float32), jnp.zeros((B, na, 3), jnp.float32))
        (mass, mp), _ = lax.scan(level_term, init, (levels, ra_all, rb_all))
        return mass, mp

    mass1, mp2 = side(xyz1, xyz2, rls, rrs)
    mass2, mp1 = side(xyz2, xyz1, rrs, rls)
    grad1 = 2.0 * (mass1[..., None] * xyz1 - mp2) * g[:, None, None]
    grad2 = 2.0 * (mass2[..., None] * xyz2 - mp1) * g[:, None, None]
    return grad1, grad2


_emd_blocked.defvjp(_emd_blocked_fwd, _emd_blocked_bwd)


def earth_mover_distance_blocked(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Memory-bounded approx EMD; identical semantics to the dense path."""
    return _emd_blocked(xyz1, xyz2)


def earth_mover_distance_auto(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Per-sample EMD cost (B,), choosing the faster backend by size.

    Above the dense limit the separable-match path wins on both memory AND
    time: it never materializes the match matrix, whose 10 accumulation
    passes make the dense path HBM-bound (31.1 vs 21.6 ms at 8192² on v5e).
    The eval loop (``training/loop.py``) and the bench go through here.
    """
    if xyz1.shape[1] * xyz2.shape[1] > _EMD_DENSE_LIMIT:
        return earth_mover_distance_blocked(xyz1, xyz2)
    return earth_mover_distance(xyz1, xyz2)


@jax.jit
def emd(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Mean EMD normalised by point count — ref ``EMD`` (``models/utils.py:223-235``)."""
    return jnp.mean(earth_mover_distance_auto(pc1, pc2)) / pc1.shape[1]
