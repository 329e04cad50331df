"""Decompose the eval refine head (G=3 clouds @ 8192, ~6 ms of the B=1
forward) into stage costs on the TPU.

Stages: rlevel0 dense, refine_level1 (FPS + kNN + grouped PointConv),
shape1 point-transformer @2048, upsample 2048->8192, pred MLP.
Usage: python scripts/refine_headroom.py [G]
"""
import json
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
from mocopci_tpu.models import MoCoPCI


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _time(fn, *args, iters=10, warmup=3):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        fn(*args)
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return 1e3 * (time.perf_counter() - t0) / iters


def main(G=3):
    cfg = ModelConfig()
    model = MoCoPCI(cfg)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    N = cfg.npoints
    x1 = jnp.asarray(r.normal(size=(1, N, 3)).astype(np.float32))
    x2 = jnp.asarray(x1 + 0.05 * r.normal(size=(1, N, 3)).astype(np.float32))
    variables = jax.jit(
        lambda a, b: model.init({"params": rng, "dropout": rng}, a, b, train=True)
    )(x1, x2)
    v = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    out = {}

    c0 = cfg.enc_channels[0]
    feat0 = jnp.asarray(r.normal(size=(G, N, c0)).astype(np.float32))
    base = jnp.asarray(r.normal(size=(G, N, 3)).astype(np.float32))
    flows = jnp.asarray(0.05 * r.normal(size=(G, N, 3)).astype(np.float32))

    def refine(m, f, b, fl):
        return m.estimator._refine(f, b, fl, False)

    full = jax.jit(lambda v, f, b, fl: model.apply(v, f, b, fl, method=refine))
    out["refine_ms"] = round(_time(full, v, feat0, base, flows), 2)
    print("refine_ms:", out["refine_ms"], flush=True)

    # stage: FPS alone
    fps = jax.jit(lambda b: ops.farthest_point_sample(b, cfg.refine_npoint))
    out["fps_ms"] = round(_time(fps, base), 2)
    print("fps_ms:", out["fps_ms"], flush=True)

    # stage: kNN for the downsampling conv (query 2048, ref 8192)
    q = jnp.asarray(r.normal(size=(G, cfg.refine_npoint, 3)).astype(np.float32))
    knn_d = jax.jit(lambda a, b: ops.knn(cfg.feat_nei, a, b))
    out["knn_down_ms"] = round(_time(knn_d, base, q), 2)
    print("knn_down_ms:", out["knn_down_ms"], flush=True)

    # stage: transformer @2048 (kNN 2048^2 + grouping + attention math)
    c1 = cfg.enc_channels[1]
    df = jnp.asarray(r.normal(size=(G, cfg.refine_npoint, c1)).astype(np.float32))

    def shape1(m, f, x):
        return m.estimator.shape1(f, x)

    tr = jax.jit(lambda v, f, x: model.apply(v, f, x, method=shape1))
    out["transformer_ms"] = round(_time(tr, v, df, q), 2)
    print("transformer_ms:", out["transformer_ms"], flush=True)

    # stage: upsample 2048 -> 8192
    up = jax.jit(lambda a, b, f: ops.upsample(a, b, f))
    out["upsample_ms"] = round(_time(up, base, q, df), 2)
    print("upsample_ms:", out["upsample_ms"], flush=True)

    # stage: refine_level1 grouped conv complete (FPS+kNN+gather+agg)
    def lvl1(m, b, f):
        return m.estimator.refine_level1(b, f)

    wf = jnp.asarray(r.normal(size=(G, N, c1)).astype(np.float32))
    l1 = jax.jit(lambda v, b, f: model.apply(v, b, f, method=lvl1)[1])
    out["refine_level1_ms"] = round(_time(l1, v, base, wf), 2)
    print("refine_level1_ms:", out["refine_level1_ms"], flush=True)

    out["G"] = G
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
