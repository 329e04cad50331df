"""Quick forward-latency check: approx vs exact kNN mode (TPU)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mocopci_tpu import ops
from mocopci_tpu.config import ModelConfig
from mocopci_tpu.data import SyntheticInterpolationDataset
from mocopci_tpu.models import MoCoPCI

cfg = ModelConfig()
model = MoCoPCI(cfg)
rng = jax.random.PRNGKey(0)
ds = SyntheticInterpolationDataset(length=1, num_points=cfg.npoints, seed=0)
s = ds[0]
x1 = jnp.asarray(s[0][1][None]); x2 = jnp.asarray(s[0][2][None])
variables = jax.jit(lambda a, b: model.init({"params": rng, "dropout": rng}, a, b, train=False))(x1, x2)

def forward(v, a, b):
    return jnp.sum(model.apply(v, a, b, train=False, deterministic=True)["out"])

def timeit(fn, iters=10):
    o = fn(variables, x1, x2); np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(variables, x1, x2)
    np.asarray(o)
    return (time.perf_counter() - t0) / iters * 1e3

ms_approx = timeit(jax.jit(forward))
ops.set_knn_mode("exact")
ms_exact = timeit(jax.jit(lambda v, a, b: forward(v, a, b)))
ops.set_knn_mode("approx")
print(f"forward_ms_b1 approx={ms_approx:.1f} exact={ms_exact:.1f}")
