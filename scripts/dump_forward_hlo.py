"""Dump the optimized HLO of the B=1 eval forward for fusion attribution.

Usage: python scripts/dump_forward_hlo.py [out.txt]
Writes the optimized HLO text; grep it for the fusion names that show up in
scripts/profile_forward.py traces (e.g. `%fusion.26 `) to see what they
compute and which model op they belong to (op_name metadata).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mocopci_tpu.config import ModelConfig
from mocopci_tpu.models import MoCoPCI


def main(out_path="/tmp/forward_hlo.txt", B=1):
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

    fwd = jax.jit(lambda v, a, b: model.apply(
        v, a, b, train=False, deterministic=True)["out"])
    txt = fwd.lower(v, x1, x2).compile().as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/forward_hlo.txt")
