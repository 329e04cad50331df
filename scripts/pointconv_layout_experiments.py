"""TPU experiments: PointConv grouping layout / einsum variants.

The B=2 train-step device trace attributes ~3-4 ms to XLA layout copies
around the grouped-feature tensors (e.g. f32[4,8192,32,35]{1,2,3,0} ->
{3,2,1,0} at 1.0 ms each, plus bf16 twins): the flat row gather produces a
layout the aggregation einsum's dot_general does not want.  Candidates keep
the SAME math (PointConv core, mocopci.py:1303-1346) and vary only tensor
shaping, measured fwd and fwd+bwd at the L0 shape.
"""
import time, os, sys, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from mocopci_tpu import ops

def _sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
def _time(fn,*a,iters=8,warmup=3):
    out=fn(*a);_sync(out)
    for _ in range(warmup): out=fn(*a)
    _sync(out); t0=time.perf_counter()
    for _ in range(iters): out=fn(*a)
    _sync(out); return 1e3*(time.perf_counter()-t0)/iters

B, N, K, D, W = 4, 8192, 32, 32, 8
r = np.random.default_rng(0)
xyz = jnp.asarray(r.normal(size=(B,N,3)).astype(np.float32)*8)
feat = jnp.asarray(r.normal(size=(B,N,D)).astype(np.float32))
idx = jnp.asarray(r.integers(0, N, size=(B,N,K)).astype(np.int32))
wn_w = jnp.asarray(r.normal(size=(3,W)).astype(np.float32)*.1)   # 1-layer stand-in
lin = jnp.asarray(r.normal(size=((3+D)*W, 64)).astype(np.float32)*.05)

def core_a(xyz, feat):
    """current: group_multi rows -> einsum bskc,bskw->bscw."""
    gx, gf = ops.group_multi(idx, xyz, feat)
    rel = gx - xyz[:, :, None, :]
    npts = jnp.concatenate([rel, gf], axis=-1)                   # (B,N,K,3+D)
    wts = jax.nn.relu(rel @ wn_w)                                # (B,N,K,W)
    agg = jnp.einsum("bskc,bskw->bscw", npts, wts,
                     preferred_element_type=jnp.float32)
    return (agg.reshape(B, N, -1) @ lin)

def core_b(xyz, feat):
    """flat pair rows end to end: gather once, no 4D tensors until the dot;
    einsum contracts k with n as batch via reshape on the fly."""
    flat = idx.reshape(B, N*K)
    tab = jnp.concatenate([xyz, feat], axis=-1)                  # (B,N,3+D)
    rows = ops.gather(tab, flat)                                 # (B,N*K,3+D)
    rel = rows[..., :3].reshape(B, N, K, 3) - xyz[:, :, None, :]
    wts = jax.nn.relu(rel @ wn_w)
    npts = jnp.concatenate([rel, rows[..., 3:].reshape(B,N,K,D)], axis=-1)
    agg = jnp.einsum("bskc,bskw->bscw", npts, wts,
                     preferred_element_type=jnp.float32)
    return (agg.reshape(B, N, -1) @ lin)

def core_c(xyz, feat):
    """einsum output order flipped (bswc) then reshape."""
    gx, gf = ops.group_multi(idx, xyz, feat)
    rel = gx - xyz[:, :, None, :]
    npts = jnp.concatenate([rel, gf], axis=-1)
    wts = jax.nn.relu(rel @ wn_w)
    agg = jnp.einsum("bskc,bskw->bswc", npts, wts,
                     preferred_element_type=jnp.float32)
    return (agg.reshape(B, N, -1) @ (lin.reshape(3+D, W, 64).transpose(1,0,2).reshape(-1,64)))

def core_d(xyz, feat):
    """fold K into the Linear: out = sum_k (npts_k @ lin_k-ish) — express the
    whole aggregation+linear as ONE dot over (k,c) pairs:
    out[b,s,d] = sum_{k,c,w} npts[b,s,k,c] wts[b,s,k,w] lin[(c,w),d].
    Do (npts ⊗ wts) contraction via two chained dots instead of the 4D
    einsum: first z[b,s,(k),(c w)] needs the outer product — skip; instead
    contract c first: t[b,s,k,w,d?] too big.  Use w-loop (W=8 small)."""
    gx, gf = ops.group_multi(idx, xyz, feat)
    rel = gx - xyz[:, :, None, :]
    npts = jnp.concatenate([rel, gf], axis=-1)
    wts = jax.nn.relu(rel @ wn_w)
    lin3 = lin.reshape(3+D, W, 64)
    out = 0.
    for w in range(W):
        m = npts * wts[..., w:w+1]                               # (B,N,K,C)
        out = out + jnp.einsum("bskc,cd->bsd", m, lin3[:, w],
                               preferred_element_type=jnp.float32)
    return out

def core_e(xyz, feat):
    """k-outer grouping: gather (B, K*N, C) in k-major order, einsum with k
    as the leading grouped axis — probes whether XLA's gather layout then
    matches the dot without a relayout copy."""
    flat = idx.transpose(0, 2, 1).reshape(B, K * N)              # k-major
    tab = jnp.concatenate([xyz, feat], axis=-1)
    rows = ops.gather(tab, flat).reshape(B, K, N, 3 + D)
    rel = rows[..., :3] - xyz[:, None, :, :]
    wts = jax.nn.relu(rel @ wn_w)                                # (B,K,N,W)
    npts = jnp.concatenate([rel, rows[..., 3:]], axis=-1)
    agg = jnp.einsum("bksc,bksw->bscw", npts, wts,
                     preferred_element_type=jnp.float32)
    return (agg.reshape(B, N, -1) @ lin)

def core_f(xyz, feat):
    """same-k-outer but contract with dot_general batch on (b,s):
    split the einsum into W slices to avoid the 5D intermediate."""
    flat = idx.transpose(0, 2, 1).reshape(B, K * N)
    tab = jnp.concatenate([xyz, feat], axis=-1)
    rows = ops.gather(tab, flat).reshape(B, K, N, 3 + D)
    rel = rows[..., :3] - xyz[:, None, :, :]
    wts = jax.nn.relu(rel @ wn_w)
    npts = jnp.concatenate([rel, rows[..., 3:]], axis=-1)
    lin3 = lin.reshape(3 + D, W, 64)
    out = 0.
    for w in range(W):
        m = npts * wts[..., w:w + 1]
        out = out + jnp.einsum("bksc,cd->bsd", m, lin3[:, w],
                               preferred_element_type=jnp.float32)
    return out

def core_h(xyz, feat):
    """round-4: k-sum BEFORE the per-w dot.  lin does not depend on k, so
    Σ_k (X ⊙ W_w) can reduce the (B,S,K,C) tensor to (B,S,C) on the VPU
    first — the per-w MXU dot then contracts K× fewer rows."""
    flat = idx.reshape(B, N * K)
    tab = jnp.concatenate([xyz, feat], axis=-1)
    rows = ops.gather(tab, flat)                             # (B,N*K,3+D)
    rel = rows[..., :3].reshape(B, N, K, 3) - xyz[:, :, None, :]
    wts = jax.nn.relu(rel @ wn_w)
    qpad = jnp.pad(xyz, ((0, 0), (0, 0), (0, D)))
    npts = rows.reshape(B, N, K, 3 + D) - qpad[:, :, None, :]
    lin3 = lin.reshape(3 + D, W, 64)
    out = 0.
    for w in range(W):
        m = (npts * wts[..., w:w + 1]).sum(axis=2)           # (B,N,C)
        out = out + jnp.einsum("bsc,cd->bsd", m, lin3[:, w],
                               preferred_element_type=jnp.float32)
    return out

def core_g(xyz, feat):
    """round-4: channels-on-sublanes planes.  Gather k-major rows, ONE
    transpose to (B, C, K, N) — every later op is lane-dense over N:
    WeightNet as (h,c)x(c, K·N) sublane contractions, k-sum a sublane-
    strided reduce, per-w dot a (C→d) sublane contraction with N on lanes.
    Output transposed back once."""
    flat = idx.transpose(0, 2, 1).reshape(B, K * N)          # k-major
    tab = jnp.concatenate([xyz, feat], axis=-1)
    rows = ops.gather(tab, flat)                             # (B,K*N,C)
    Xt = rows.transpose(0, 2, 1).reshape(B, 3 + D, K, N)     # (B,C,K,N)
    qt = xyz.transpose(0, 2, 1)                              # (B,3,N)
    rel = Xt[:, :3] - qt[:, :, None, :]                      # (B,3,K,N)
    wts = jax.nn.relu(jnp.einsum("ch,bckn->bhkn", wn_w, rel,
                                 preferred_element_type=jnp.float32))
    qpad = jnp.concatenate([qt, jnp.zeros((B, D, N), qt.dtype)], axis=1)
    Xsub = Xt - qpad[:, :, None, :]                          # (B,C,K,N)
    lin3 = lin.reshape(3 + D, W, 64)
    out_t = 0.
    for w in range(W):
        m = (Xsub * wts[:, w:w + 1]).sum(axis=2)             # (B,C,N)
        out_t = out_t + jnp.einsum("bcn,cd->bdn", m, lin3[:, w],
                                   preferred_element_type=jnp.float32)
    return out_t.transpose(0, 2, 1)

CANDS = [("a_current", core_a), ("b_flat_rows", core_b),
         ("c_flip_out", core_c), ("d_wloop", core_d)]
import sys as _sys
if "--late" in _sys.argv:
    CANDS = [("a_current", core_a), ("e_kouter", core_e), ("f_kouter_wloop", core_f)]
if "--r4" in _sys.argv:
    CANDS = [("d_wloop", core_d), ("h_ksum_first", core_h), ("g_planes", core_g)]
for name, f in CANDS:
    try:
        jf = jax.jit(lambda a,b,f=f: jnp.sum(f(a,b)))
        t_f = _time(jf, xyz, feat)
        jg = jax.jit(jax.grad(lambda a,b,f=f: jnp.sum(jnp.cos(f(a,b))), argnums=(0,1)))
        t_g = _time(jg, xyz, feat)
        print(f"{name}: fwd {t_f:.2f} ms   fwd+bwd {t_g:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

