"""Exact-vs-approx kNN kernel timing at production shapes (TPU).

Round-5 measurements (v5e, axon):
  k=16: exact 5.00 ms  approx 3.17 ms
  k=32: exact 9.76 ms  approx 3.69 ms   (old chunked-XLA exact: 25.88 ms)
  cosine 2x2048x2048 C=64 k=16: exact 3.54 ms, bit-equal to lax.top_k
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp

from mocopci_tpu.ops.pallas.knn import exact_knn_pallas, fused_knn_pallas
from mocopci_tpu.ops import distance as D


def timeit(fn, *args, iters=30):
    out = fn(*args); np.asarray(out)  # force through axon tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    B, N, M = 1, 8192, 8192
    q = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 10)
    r = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32) * 10)

    for k in (16, 32):
        d = D.square_distance(q, r)
        _, want = jax.lax.top_k(-d, k)
        got = exact_knn_pallas(q, r, k)
        seteq = all(set(np.asarray(got)[0, n]) == set(np.asarray(want)[0, n])
                    for n in range(0, N, 64))
        ms_exact = timeit(lambda a, b: exact_knn_pallas(a, b, k), q, r)
        ms_approx = timeit(lambda a, b: fused_knn_pallas(a, b, k), q, r)
        print(f"k={k} set_equal(sampled)={seteq} exact={ms_exact:.2f}ms "
              f"approx={ms_approx:.2f}ms")

    D.set_knn_mode("exact")
    ms_old = timeit(jax.jit(lambda a, b: D._select_blocked(
        D.square_distance, 32, b, a)), q, r)
    print(f"old XLA chunked exact k=32: {ms_old:.2f}ms")
    D.set_knn_mode("approx")

    fq = jnp.asarray(rng.normal(size=(2, 2048, 64)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(2, 2048, 64)).astype(np.float32))
    fqn = fq / jnp.linalg.norm(fq, axis=-1, keepdims=True)
    frn = fr / jnp.linalg.norm(fr, axis=-1, keepdims=True)
    dd = D.cosine_distance(fqn, frn)
    _, want = jax.lax.top_k(-dd, 16)
    got = exact_knn_pallas(fqn, frn, 16, "cosine")
    eq = np.array_equal(np.asarray(got), np.asarray(want))
    ms = timeit(lambda a, b: exact_knn_pallas(a, b, 16, "cosine"), fqn, frn)
    print(f"cosine 2x2048x2048 C=64 k=16 oracle_equal={eq} exact={ms:.2f}ms")


if __name__ == "__main__":
    main()
