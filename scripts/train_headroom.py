"""Isolate the named train-step headroom components on the TPU (VERDICT r2 #4).

Times, at production size (N=8192, F·B groups):
  - full train step (B=1, B=2) — the bench numbers
  - fusion head TRAIN path fwd+bwd in isolation (kNNs + gather + MLP/BN +
    softmax blend + their backward incl. the scatter-add)
  - the gather/scatter-add backward alone (the 1.57M-row fusion gather)
  - fusion head EVAL path (Pallas, for reference)

Usage: python scripts/train_headroom.py [B]
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
from mocopci_tpu.config import ModelConfig, TrainConfig
from mocopci_tpu.models import MoCoPCI
from mocopci_tpu.training import create_train_state, train_step


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _timed(out, key, fn, *args, iters=5):
    out[key] = _time(fn, *args, iters=iters)
    print(f"{key}: {out[key]:.2f}", flush=True)


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


def main(B=2):
    cfg = ModelConfig()
    model = MoCoPCI(cfg)
    tcfg = TrainConfig()
    _, state = create_train_state(cfg, tcfg, steps_per_epoch=1)
    r = np.random.default_rng(0)
    N = cfg.npoints
    F = cfg.n_frames
    out = {}

    x1 = jnp.asarray(r.normal(size=(B, N, 3)).astype(np.float32))
    x2 = jnp.asarray(x1 + 0.05 * r.normal(size=(B, N, 3)).astype(np.float32))
    gt = jnp.asarray(r.normal(size=(B, F, N, 3)).astype(np.float32))
    batch = {"pc1": x1, "pc2": x2, "gt": gt}
    key = jax.random.PRNGKey(0)

    _timed(out, "train_step_ms",
           lambda s, b: train_step(s, b, key, cfg, tcfg)[1]["loss"],
           state, batch)

    # fusion head train path in isolation (FB = F*B groups like the model)
    p1 = jnp.asarray(r.normal(size=(F * B, N, 3)).astype(np.float32))
    p2 = jnp.asarray(p1 + 0.02 * r.normal(size=(F * B, N, 3)).astype(np.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fusion_train(m, a, b):
        return m.estimator._fusion(a, b, F, True)

    def fusion_loss(a, b):
        res, _ = model.apply(variables, a, b, method=fusion_train,
                             mutable=["batch_stats"])
        return jnp.sum(res)

    fus_grad = jax.jit(jax.grad(fusion_loss, argnums=(0, 1)))
    _timed(out, "fusion_train_fwdbwd_ms", fus_grad, p1, p2)
    fus_fwd = jax.jit(fusion_loss)
    _timed(out, "fusion_train_fwd_ms", fus_fwd, p1, p2)

    def fusion_eval(m, a, b):
        return m.estimator._fusion(a, b, F, False)

    fus_eval = jax.jit(
        lambda a, b: jnp.sum(model.apply(variables, a, b, method=fusion_eval))
    )
    _timed(out, "fusion_eval_fwd_ms", fus_eval, p1, p2)

    # the scatter-add backward alone: gradient of a 2k-wide grouping gather
    idx = jnp.asarray(
        r.integers(0, N, size=(F * B, N, 2 * cfg.fusion_k)).astype(np.int32)
    )
    ct = jnp.asarray(
        r.normal(size=(F * B, N, 2 * cfg.fusion_k, 3)).astype(np.float32)
    )
    scat = jax.jit(jax.grad(lambda p: jnp.sum(ops.group(p, idx) * ct)))
    _timed(out, "fusion_scatter_bwd_ms", scat, p2)

    # coarse decomposition of the rest of the step
    variables2 = {"params": state.params, "batch_stats": state.batch_stats}

    def enc_loss(v, a):
        pcs, feats = model.apply(v, a, method=lambda m, a: m.encoder(a))
        return sum(jnp.sum(f) for f in feats)

    _timed(out, "encoder_fwdbwd_ms", jax.jit(jax.grad(enc_loss)),
           variables2, jnp.concatenate([x1, x2], axis=0))

    def chamfer_loss_fn(a, b):
        return ops.chamfer_distance(a, b)

    _timed(out, "chamfer_fwdbwd_ms", jax.jit(jax.grad(chamfer_loss_fn)),
           x1, x2)

    out["B"] = B
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
