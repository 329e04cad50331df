"""Capture a device trace of the B=2 train step and print the top device ops.

Same trace parsing as profile_forward.py; see that module.
Usage: python scripts/profile_train.py [B] [out_dir]
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
from mocopci_tpu.training import create_train_state, train_step


def main(B=2, out_dir="/tmp/train_trace"):
    cfg = ModelConfig()
    tcfg = TrainConfig()
    _, state = create_train_state(cfg, tcfg, steps_per_epoch=1)
    r = np.random.default_rng(0)
    N, F = cfg.npoints, cfg.n_frames
    x1 = jnp.asarray(r.normal(size=(B, N, 3)).astype(np.float32))
    x2 = jnp.asarray(x1 + 0.05 * r.normal(size=(B, N, 3)).astype(np.float32))
    gt = jnp.asarray(r.normal(size=(B, F, N, 3)).astype(np.float32))
    batch = {"pc1": x1, "pc2": x2, "gt": gt}
    key = jax.random.PRNGKey(0)

    def step(s, b):
        return train_step(s, b, key, cfg, tcfg)

    for _ in range(2):
        state2, aux = step(state, batch)
        np.asarray(aux["loss"])

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        state2, aux = step(state, batch)
    np.asarray(aux["loss"])
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
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2,
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_trace")
