"""Attribute device-trace time to model scopes via HLO op_name metadata.

Captures a device trace of the B=1 eval forward or the B=2 train step,
dumps the SAME compiled program's optimized HLO, maps every executed
instruction to its `op_name` scope (e.g. MoCoPCI/estimator/multi_frame_up_1/
bid/...), and aggregates device time by scope prefix.  This is the global
"where do the milliseconds live" view the flat op ranking can't give —
11k-op programs hide half their time in a tail of sub-0.3 ms fusions.

Usage: python scripts/trace_attrib.py {forward|train} [B] [depth]
"""
import glob
import gzip
import json
import os
import re
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

OP_NAME_RE = re.compile(r"%(\S+?) = .*?metadata={op_name=\"([^\"]*)\"")


def build(kind, B):
    cfg = ModelConfig()
    tcfg = TrainConfig()
    r = np.random.default_rng(0)
    N, F = cfg.npoints, cfg.n_frames
    x1 = jnp.asarray(r.normal(size=(B, N, 3)).astype(np.float32))
    x2 = jnp.asarray(x1 + 0.05 * r.normal(size=(B, N, 3)).astype(np.float32))
    if kind == "train":
        _, state = create_train_state(cfg, tcfg, steps_per_epoch=1)
        gt = jnp.asarray(r.normal(size=(B, F, N, 3)).astype(np.float32))
        batch = {"pc1": x1, "pc2": x2, "gt": gt}
        key = jax.random.PRNGKey(0)
        # keep the WHOLE step live: returning only the loss lets XLA DCE the
        # backward + AdamW update and the trace silently becomes forward-only
        fn = jax.jit(lambda s, b: train_step(s, b, key, cfg, tcfg))
        args = (state, batch)
    else:
        model = MoCoPCI(cfg)
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(
            lambda a, b: model.init(
                {"params": rng, "dropout": rng}, a, b, train=True)
        )(x1, x2)
        v = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
        model_fn = lambda v, a, b: jnp.sum(model.apply(
            v, a, b, train=False, deterministic=True)["out"])
        fn = jax.jit(model_fn)
        args = (v, x1, x2)
    return fn, args


def main(kind="forward", B=None, depth=3):
    B = B or (2 if kind == "train" else 1)
    out_dir = f"/tmp/attrib_{kind}"
    fn, args = build(kind, B)

    lowered = fn.lower(*args)
    hlo = lowered.compile().as_text()
    name_to_scope = {}
    for m in OP_NAME_RE.finditer(hlo):
        name_to_scope[m.group(1)] = m.group(2)

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    for _ in range(2):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    pids = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TensorCore" in n or "/device:" in n}

    # module-level spans (jit_*) double-count their children; skip them
    agg = defaultdict(float)
    unattributed = defaultdict(float)
    total = 0.0
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        dur = e.get("dur", 0.0)
        total += dur
        scope = name_to_scope.get(name)
        if scope is None:
            # trace may strip the leading % or append suffixes
            scope = name_to_scope.get(name.split("(")[0])
        if scope is None:
            unattributed[name.split(".")[0]] += dur
            continue
        # strip jit wrapper prefixes, keep `depth` path components
        parts = [p for p in scope.split("/")
                 if not p.startswith("jit(") and p != "jvp" and p != "transpose"]
        agg["/".join(parts[:depth])] += dur

    print(f"device op total: {total/3e3:.2f} ms/iter  "
          f"(attributed {sum(agg.values())/3e3:.2f}, "
          f"unattributed {sum(unattributed.values())/3e3:.2f})")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    for scope, dur in rows[:40]:
        print(f"{dur/3e3:8.3f} ms  {scope}")
    urows = sorted(unattributed.items(), key=lambda kv: -kv[1])
    print("--- unattributed (by trace-name prefix) ---")
    for name, dur in urows[:15]:
        print(f"{dur/3e3:8.3f} ms  {name}")


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "forward"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else None
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    main(kind, B, depth)
