"""Capture a device trace of the encoder fwd+bwd (the train-step shape:
4 clouds at B=2) and print the top device ops.

Same trace parsing as profile_train.py.
Usage: python scripts/profile_encoder.py [G] [out_dir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mocopci_tpu.config import ModelConfig, TrainConfig
from mocopci_tpu.models import MoCoPCI
from mocopci_tpu.training import create_train_state


def main(G=4, out_dir="/tmp/enc_trace"):
    cfg = ModelConfig()
    tcfg = TrainConfig()
    model = MoCoPCI(cfg)
    _, state = create_train_state(cfg, tcfg, steps_per_epoch=1)
    r = np.random.default_rng(0)
    N = cfg.npoints
    x = jnp.asarray(r.normal(size=(G, N, 3)).astype(np.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def enc_loss(v, a):
        pcs, feats = model.apply(v, a, method=lambda m, a: m.encoder(a))
        return sum(jnp.sum(f) for f in feats)

    g = jax.jit(jax.grad(enc_loss))

    for _ in range(3):
        out = g(variables, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = g(variables, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace file found under", out_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    pids = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TensorCore" in n or "/device:" in n or "TPU" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            tot[name] += e.get("dur", 0.0)
            cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"device total: {total/3e3:.2f} ms/iter over 3 iters "
          f"({len(rows)} distinct ops)")
    for name, dur in rows[:60]:
        print(f"{dur/3e3:8.3f} ms  x{cnt[name]//3:<3d} {name[:110]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/enc_trace")
