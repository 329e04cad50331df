"""Decompose the eval forward (B=1, 8192 pts) into stage costs on the TPU.

Times encoder, EI fusion, L3 cost volume + synthesis, the two decoder stages,
refine head, and the fusion head — the map for pushing forward_ms_b1 below
30 ms (VERDICT r2 #7).
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


def main(B=1):
    cfg = ModelConfig()
    model = MoCoPCI(cfg)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    N = cfg.npoints
    x1 = jnp.asarray(r.normal(size=(B, N, 3)).astype(np.float32))
    x2 = jnp.asarray(x1 + 0.05 * r.normal(size=(B, N, 3)).astype(np.float32))
    variables = jax.jit(
        lambda a, b: model.init({"params": rng, "dropout": rng}, a, b, train=True)
    )(x1, x2)
    v = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    out = {}

    full = jax.jit(lambda v, a, b: model.apply(
        v, a, b, train=False, deterministic=True)["out"])
    out["forward_ms"] = round(_time(full, v, x1, x2), 2)
    print("forward_ms:", out["forward_ms"], flush=True)

    enc = jax.jit(lambda v, a: model.apply(
        v, a, method=lambda m, a: m.encoder(a)))
    xcat = jnp.concatenate([x1, x2], axis=0)
    out["encoder_fwd_ms"] = round(_time(enc, v, xcat), 2)
    print("encoder_fwd_ms:", out["encoder_fwd_ms"], flush=True)

    # FPS alone at every level (batched both clouds)
    def fps_all(a):
        idx = []
        pc = a
        for n in cfg.pyramid:
            i = ops.farthest_point_sample(pc, n)
            pc = ops.gather(pc, i)
            idx.append(i)
        return idx

    out["fps_pyramid_ms"] = round(_time(jax.jit(fps_all), xcat), 2)
    print("fps_pyramid_ms:", out["fps_pyramid_ms"], flush=True)

    # estimator with precomputed encoder outputs
    pcs, feats = jax.tree_util.tree_map(jnp.asarray, enc(v, xcat))

    def estim(v, pcs, feats):
        def run(m, pcs, feats):
            pc1s = [p[:B] for p in pcs]
            pc2s = [p[B:] for p in pcs]
            f1 = [f[:B] for f in feats]
            f2 = [f[B:] for f in feats]
            return m.estimator(pc1s, pc2s, f1, f2, False, True)["out"]
        return model.apply(v, pcs, feats, method=run)

    out["estimator_fwd_ms"] = round(_time(jax.jit(estim), v, pcs, feats), 2)
    print("estimator_fwd_ms:", out["estimator_fwd_ms"], flush=True)

    # fusion head eval at FB=3B (from train_headroom: ~13.4 ms at B=1)
    p1 = jnp.asarray(r.normal(size=(3 * B, N, 3)).astype(np.float32))
    p2 = jnp.asarray(p1 + 0.02 * r.normal(size=(3 * B, N, 3)).astype(np.float32))
    fus = jax.jit(lambda v, a, b: model.apply(
        v, a, b, method=lambda m, a, b: m.estimator._fusion(a, b, 3, False)))
    out["fusion_eval_ms"] = round(_time(fus, v, p1, p2), 2)
    print("fusion_eval_ms:", out["fusion_eval_ms"], flush=True)

    # its kNNs alone
    knns = jax.jit(lambda a, b: (
        ops.knn(cfg.fusion_k, a, a), ops.knn(cfg.fusion_k, b, a)))
    out["fusion_knns_ms"] = round(_time(knns, p1, p2), 2)
    print("fusion_knns_ms:", out["fusion_knns_ms"], flush=True)

    # refine head (base 3B x N)
    feat0 = jnp.asarray(r.normal(size=(3 * B, N, cfg.enc_channels[0])).astype(np.float32))
    flows = jnp.asarray(r.normal(size=(3 * B, N, 3)).astype(np.float32))
    ref = jax.jit(lambda v, f0, b, fl: model.apply(
        v, f0, b, fl, method=lambda m, f0, b, fl: m.estimator._refine(f0, b, fl, False)))
    out["refine_fwd_ms"] = round(_time(ref, v, feat0, p1, flows), 2)
    print("refine_fwd_ms:", out["refine_fwd_ms"], flush=True)

    out["B"] = B
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
