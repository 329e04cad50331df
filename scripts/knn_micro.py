"""Micro-benchmark of the fused kNN kernel at fusion-head shapes.

Times fused_knn_pallas on the fusion workload (B=6 clouds, 8192 queries x
8192 refs, k=32) across tile sizes and k, to locate where kernel time goes
(streaming distance phase vs final top-k extraction scales with k).
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mocopci_tpu.ops.pallas.knn import fused_knn_pallas


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    B, N, M = 6, 8192, 8192
    q = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 10)
    r = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32) * 10)

    # correctness spot check at the alternate tiles (vs production tiles)
    base = np.asarray(fused_knn_pallas(q, r, 32))
    alt = np.asarray(fused_knn_pallas(q, r, 32, tq=512))
    agree = np.mean([
        len(np.intersect1d(base[b, i], alt[b, i])) / 32
        for b in range(B) for i in range(0, N, 997)
    ])
    print(f"tq=512 vs tq=256 neighbour-set agreement: {agree:.4f}")

    for k in (1, 32):
        for tq, tr in ((256, 1024), (512, 1024), (256, 2048)):
            f = functools.partial(fused_knn_pallas, k=k, tq=tq, tr=tr)
            ms = timeit(f, q, r)
            print(f"k={k:3d} tq={tq:5d} tr={tr:5d}: {ms:7.3f} ms "
                  f"({ms / B:.3f} ms/cloud)")


if __name__ == "__main__":
    main()
