"""Microbench: fused FPS pyramid kernel vs per-level composition (TPU)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mocopci_tpu import ops
from mocopci_tpu.config import ModelConfig
from mocopci_tpu.ops.pallas.fps import (
    farthest_point_sample_pallas,
    farthest_point_sample_pyramid_pallas,
)


def _sync(x):
    # block_until_ready does NOT reliably block through the axon tunnel;
    # force a scalar device->host transfer instead (see eval_headroom.py)
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _time(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*args)
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return 1e3 * (time.perf_counter() - t0) / iters


def main():
    cfg = ModelConfig()
    r = np.random.default_rng(0)
    B = 2
    x = jnp.asarray(r.normal(size=(B, cfg.npoints, 3)).astype(np.float32))

    @jax.jit
    def seq(x):
        idxs = []
        pc = x
        for n in cfg.pyramid:
            i = farthest_point_sample_pallas(pc, n)
            pc = ops.gather(pc, i)
            idxs.append(i)
        return idxs

    @jax.jit
    def fused(x):
        return farthest_point_sample_pyramid_pallas(x, tuple(cfg.pyramid))

    @jax.jit
    def level1_only(x):
        return farthest_point_sample_pallas(x, cfg.pyramid[0])

    t_seq = _time(seq, x)
    t_fused = _time(fused, x)
    t_l1 = _time(level1_only, x)
    # parity on real chip
    a = [np.asarray(v) for v in seq(x)]
    b = [np.asarray(v) for v in fused(x)]
    match = all((u == v).all() for u, v in zip(a, b))
    print({"seq_ms": round(t_seq, 3), "fused_ms": round(t_fused, 3),
           "level1_ms": round(t_l1, 3), "match": bool(match)})


if __name__ == "__main__":
    main()
