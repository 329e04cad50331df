"""Localize the bf16-activation training NaN (full size, one step).

Round-5 finding: --compute_dtype bfloat16 training NaNs from epoch 0 at
8192 points while the bf16 eval forward is finite.  This probe runs the
pieces separately on the TPU: train-mode forward outputs, loss terms, then
per-module gradient finiteness.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mocopci_tpu.config import ModelConfig, TrainConfig
from mocopci_tpu.data import SyntheticInterpolationDataset
from mocopci_tpu.models import MoCoPCI
from mocopci_tpu.nn import set_compute_dtype
from mocopci_tpu.training.loss import mocopci_loss


def main():
    set_compute_dtype("bfloat16")
    cfg = ModelConfig()
    tcfg = TrainConfig()
    model = MoCoPCI(cfg)
    ds = SyntheticInterpolationDataset(length=2, num_points=cfg.npoints, seed=0)
    s = ds[0]
    x1 = jnp.asarray(s[0][1][None])
    x2 = jnp.asarray(s[0][2][None])
    gt = jnp.asarray(np.stack(s[1])[None])
    rng = jax.random.PRNGKey(0)
    v = jax.jit(lambda a, b: model.init(
        {"params": rng, "dropout": rng}, a, b, train=True))(x1, x2)

    @jax.jit
    def fwd(v, a, b):
        return model.apply(v, a, b, train=True, deterministic=False,
                           rngs={"dropout": rng}, mutable=["batch_stats"])

    out, _ = fwd(v, x1, x2)
    for k, val in out.items():
        vals = val if isinstance(val, tuple) else (val,)
        print(k, [bool(np.isfinite(np.asarray(t)).all()) for t in vals],
              flush=True)

    @jax.jit
    def loss_terms(out, gt):
        return mocopci_loss(out, gt, cfg, tcfg)

    total, aux = loss_terms(out, gt)
    print("loss", float(total), {k: float(x) for k, x in aux.items()},
          flush=True)

    @jax.jit
    def grads(params, bs, a, b, gt):
        def f(p):
            result, _ = model.apply(
                {"params": p, "batch_stats": bs}, a, b, train=True,
                deterministic=False, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return mocopci_loss(result, gt, cfg, tcfg)[0]
        return jax.grad(f)(params)

    g = grads(v["params"], v.get("batch_stats", {}), x1, x2, gt)
    flat = jax.tree_util.tree_leaves_with_path(g)
    bad = [(jax.tree_util.keystr(p)) for p, leaf in flat
           if not np.isfinite(np.asarray(leaf)).all()]
    print(f"non-finite grad leaves: {len(bad)}/{len(flat)}", flush=True)
    for b in bad[:25]:
        print("  ", b)


if __name__ == "__main__":
    main()
