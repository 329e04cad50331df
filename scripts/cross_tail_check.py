"""TPU check for the fused cross tail: fused-vs-XLA numerics at the live
shapes, and fwd / fwd+bwd timing of both paths (isolated _cross_core-style
chain, gather included)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mocopci_tpu import ops
from mocopci_tpu.ops.pallas.cross_tail import cross_tail


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _time(fn, *args, iters=10, warmup=3):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return 1e3 * (time.perf_counter() - t0) / iters


def main():
    r = np.random.default_rng(0)
    # live shapes: up_1 (G=6, S=2048, C=64), up_2 (6, 512, 128), cross3 (2, 256, 256)
    for G, S, C, M in [(6, 2048, 64, 2048), (6, 512, 128, 512), (2, 256, 256, 256)]:
        K = 32
        tab = jnp.asarray(r.normal(size=(G, M, C)).astype(np.float32))
        base = jnp.asarray(r.normal(size=(G, S, C)).astype(np.float32))
        w = jnp.asarray((r.normal(size=(C, C)) * 0.1).astype(np.float32))
        b = jnp.asarray((r.normal(size=(C,)) * 0.1).astype(np.float32))
        idx = jnp.asarray(r.integers(0, M, size=(G, S, K)).astype(np.int32))
        idx_km = idx.transpose(0, 2, 1).reshape(G, -1)

        def fused(tab, base):
            rows = ops.gather(tab, idx_km)
            return cross_tail(rows, base, w, b, K)

        def xla(tab, base):
            (tg,) = ops.group_multi(idx, tab)
            x = jnp.where(tg + base[:, :, None, :] >= 0,
                          tg + base[:, :, None, :],
                          0.1 * (tg + base[:, :, None, :]))
            h = x @ w + b
            h = jnp.where(h >= 0, h, 0.1 * h)
            return jnp.max(h, axis=2)

        o1 = np.asarray(jax.jit(fused)(tab, base))
        o2 = np.asarray(jax.jit(xla)(tab, base))
        fdiff = np.abs(o1 - o2).max() / max(np.abs(o2).max(), 1e-9)

        gf = jax.jit(jax.grad(lambda t, bb: jnp.sum(jnp.cos(fused(t, bb))),
                              argnums=(0, 1)))
        gx = jax.jit(jax.grad(lambda t, bb: jnp.sum(jnp.cos(xla(t, bb))),
                              argnums=(0, 1)))
        g1 = [np.asarray(a) for a in gf(tab, base)]
        g2 = [np.asarray(a) for a in gx(tab, base)]
        gdiff = max(
            np.abs(a - c).max() / max(np.abs(c).max(), 1e-9)
            for a, c in zip(g1, g2)
        )
        tf_f = _time(jax.jit(fused), tab, base)
        tx_f = _time(jax.jit(xla), tab, base)
        tf_g = _time(gf, tab, base)
        tx_g = _time(gx, tab, base)
        print(
            f"G={G} S={S} C={C}: rel fwd diff {fdiff:.2e} grad {gdiff:.2e} | "
            f"fwd fused {tf_f:.2f} xla {tx_f:.2f} ms | "
            f"fwd+bwd fused {tf_g:.2f} xla {tx_g:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
