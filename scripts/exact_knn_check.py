import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mocopci_tpu.ops.pallas.knn import exact_knn_pallas
from mocopci_tpu.ops import distance as D

rng = np.random.default_rng(0)
B, N, M, k = 1, 8192, 8192, 32
q = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 10)
r = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32) * 10)

got = np.asarray(exact_knn_pallas(q, r, k))

# oracle 1: matmul-form distances (what D.square_distance computes)
d1 = D.square_distance(q, r)
_, w1 = jax.lax.top_k(-d1, k)
w1 = np.asarray(w1)

# oracle 2: the kernel's own formula — explicit sum of squared diffs
@jax.jit
def diff2(q, r):
    d = jnp.zeros((B, N, M), jnp.float32)
    for c in range(3):
        df = q[:, :, c:c+1] - r[:, None, :, c]
        d = d + df * df
    return d
d2 = diff2(q, r)
_, w2 = jax.lax.top_k(-d2, k)
w2 = np.asarray(w2)

for name, w in [("matmul-form", w1), ("diff2-form", w2)]:
    row_eq = (got == w).all(-1)
    set_eq = sum(set(got[0, n]) == set(w[0, n]) for n in range(N))
    print(f"vs {name}: rows order-equal {row_eq.sum()}/{N}, rows set-equal {set_eq}/{N}")
# how different are the two oracles from each other?
row_eq = (w1 == w2).all(-1)
print(f"oracle vs oracle: rows order-equal {row_eq.sum()}/{N}")
