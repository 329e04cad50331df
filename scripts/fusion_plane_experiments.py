"""Measure candidate constructions of the fusion-head pair planes on TPU.

The fusion head consumes (G, 4, P) resi/dist planes (P = N·2k, k-major).
Today they are built as: flat row gather (G,P,3) -> transpose to (G,3,P)
-> tiled query subtract -> dist.  The B=2 train-step trace attributes
~19 ms forward + ~16 ms transpose_jvp backward to these passes.  Candidates:

  a. current: group (rows) + transpose + tile-sub + dist
  b. rows-only: flat row gather, NO transpose (isolate the relayout cost)
  c. lane-gather: take_along_axis on (G, 3, M) planes along lanes
  d. planes via one-hot? (skipped - O(N*M) build)

Each is timed fwd and fwd+bwd (grad wrt points2 and points1).
"""
import time, os, functools, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax import lax

def _sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
def _time(fn,*a,iters=8,warmup=3):
    out=fn(*a);_sync(out)
    for _ in range(warmup): out=fn(*a)
    _sync(out); t0=time.perf_counter()
    for _ in range(iters): out=fn(*a)
    _sync(out); return 1e3*(time.perf_counter()-t0)/iters

G, N, K2 = 6, 8192, 64          # B=2 train shapes (FB = 3*B)
P = N * K2
r = np.random.default_rng(0)
points1 = jnp.asarray(r.normal(size=(G,N,3)).astype(np.float32)*8)
points2 = jnp.asarray(r.normal(size=(G,N,3)).astype(np.float32)*8)
idx = jnp.asarray(r.integers(0, N, size=(G,N,K2)).astype(np.int32))

from mocopci_tpu import ops

def planes_a(p1, p2):
    idx_t = idx.transpose(0,2,1)                    # (G,K2,N)
    nbr = ops.group(p2, idx_t)                      # (G,K2,N,3)
    n_t = nbr.transpose(0,3,1,2).reshape(G,3,P)
    p1_t = p1.transpose(0,2,1)
    resi = n_t - jnp.tile(p1_t,(1,1,K2))
    dist = jnp.sqrt(jnp.sum(resi*resi,axis=1,keepdims=True)+1e-20)
    return jnp.concatenate([resi,dist],axis=1)

def rows_b(p1, p2):
    idx_t = idx.transpose(0,2,1)
    nbr = ops.group(p2, idx_t)                      # (G,K2,N,3) rows
    return nbr

def planes_c(p1, p2):
    p2_t = p2.transpose(0,2,1)                      # (G,3,M)
    flat = idx.transpose(0,2,1).reshape(G,1,P)      # k-major pair order
    n_t = jnp.take_along_axis(p2_t, jnp.broadcast_to(flat,(G,3,P)), axis=2)
    p1_t = p1.transpose(0,2,1)
    resi = n_t - jnp.tile(p1_t,(1,1,K2))
    dist = jnp.sqrt(jnp.sum(resi*resi,axis=1,keepdims=True)+1e-20)
    return jnp.concatenate([resi,dist],axis=1)

def planes_d(p1, p2):
    """Row gather + Pallas plane-build kernel (ops/pallas/fusion_planes.py)."""
    from mocopci_tpu.ops.pallas.fusion_planes import build_pair_planes
    flat = idx.transpose(0,2,1).reshape(G, P)
    nbr = ops.gather(p2, flat)                      # (G,P,3) k-major rows
    p1_t = p1.transpose(0,2,1)
    return build_pair_planes(nbr, p1_t)

def planes_e(p1, p2):
    """ONE element gather from the flattened cloud straight into planes."""
    flat = idx.transpose(0,2,1).reshape(G,1,P)      # k-major pair order
    ei = flat*3 + jnp.arange(3, dtype=jnp.int32)[None,:,None]   # (G,3,P)
    n_t = jnp.take_along_axis(
        jnp.broadcast_to(p2.reshape(G,1,N*3),(G,3,N*3)), ei, axis=2)
    p1_t = p1.transpose(0,2,1)
    resi = n_t - jnp.tile(p1_t,(1,1,K2))
    dist = jnp.sqrt(jnp.sum(resi*resi,axis=1,keepdims=True)+1e-20)
    return jnp.concatenate([resi,dist],axis=1)

for name, f in [("a_current",planes_a), ("b_rows_only",rows_b),
                ("c_lane_gather",planes_c), ("d_pallas_kernel",planes_d),
                ("e_flat_elem_gather",planes_e)]:
    try:
        jf = jax.jit(lambda p1,p2,f=f: jnp.sum(f(p1,p2)))
        t_f = _time(jf, points1, points2)
        jg = jax.jit(jax.grad(lambda p1,p2,f=f: jnp.sum(f(p1,p2)*jnp.cos(f(p1,p2))), argnums=(0,1)))
        t_g = _time(jg, points1, points2)
        print(f"{name}: fwd {t_f:.2f} ms   fwd+bwd {t_g:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

def planes_f(p1, p2):
    """Radix-factorized MXU gather+build (ops/pallas/gather_planes.py)."""
    from mocopci_tpu.ops.pallas.gather_planes import bucket_gather_pair_planes
    flat = idx.transpose(0,2,1).reshape(G, P)
    return bucket_gather_pair_planes(p2, flat, p1.transpose(0,2,1))

jf = jax.jit(lambda p1,p2: jnp.sum(planes_f(p1,p2)))
print(f"f_bucket_radix (fwd-only op): fwd {_time(jf, points1, points2):.2f} ms", flush=True)
