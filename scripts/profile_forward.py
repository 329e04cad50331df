"""Capture a device trace of the eval forward and print the top device ops.

Usage: python scripts/profile_forward.py [B] [out_dir]
Writes the jax.profiler trace under out_dir (default /tmp/fwd_trace) and
prints a duration-sorted table of device ops parsed from the raw
trace.json.gz (no tensorboard needed).
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

from mocopci_tpu.config import ModelConfig
from mocopci_tpu.models import MoCoPCI


def main(B=1, out_dir="/tmp/fwd_trace"):
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
    full = jax.jit(lambda v, a, b: model.apply(
        v, a, b, train=False, deterministic=True)["out"])
    # warm
    np.asarray(full(v, x1, x2)).ravel()[0]
    np.asarray(full(v, x1, x2)).ravel()[0]

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = full(v, x1, x2)
    np.asarray(out).ravel()[0]
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace file found under", out_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    # device-side complete events: pick the process with TensorCore in name
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
          f"({len(rows)} distinct ops)  [pids: {sorted(pids.items())[:6]}]")
    for name, dur in rows[:40]:
        print(f"{dur/3e3:8.3f} ms  x{cnt[name]//3:<3d} {name[:110]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/fwd_trace")
