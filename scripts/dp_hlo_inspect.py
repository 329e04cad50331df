"""Inspect the 8-device DP train-step HLO: top all-gathers by payload.

Companion to scripts/dp_device_cost.py — prints the largest all-gather
instructions (size + full op_name metadata) of the compiled SPMD program so
replicated-compute regressions can be attributed to source ops.  Usage:
    [MOCOPCI_BATCHED_GATHER=1] python scripts/dp_hlo_inspect.py [npoints]
"""
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from mocopci_tpu.config import TrainConfig, tiny_model_config
from mocopci_tpu.parallel import make_mesh, replicated, shard_batch
from mocopci_tpu.training import create_train_state, train_step


def main(npoints: int = 256, n_data: int = 8):
    cfg = tiny_model_config(npoints)
    tcfg = TrainConfig(lr=1e-3)
    _, state0 = create_train_state(cfg, tcfg, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    mesh = make_mesh(n_data=n_data, n_model=1)
    B = n_data
    batch = shard_batch(mesh, {
        "pc1": rng.normal(size=(B, npoints, 3)).astype(np.float32),
        "pc2": rng.normal(size=(B, npoints, 3)).astype(np.float32),
        "gt": rng.normal(size=(B, 3, npoints, 3)).astype(np.float32),
    })
    state = jax.device_put(state0, replicated(mesh))
    txt = train_step.lower(
        state, batch, jax.random.PRNGKey(0), cfg, tcfg
    ).compile().as_text()
    dt = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}
    rows = []
    for line in txt.splitlines():
        if "all-gather(" not in line or "=" not in line:
            continue
        m = re.search(r"([a-z0-9]+)\[([\d,]*)\]", line.split("=", 1)[1])
        if not m:
            continue
        n = 1
        for d in filter(None, m.group(2).split(",")):
            n *= int(d)
        op = re.search(r'op_name="([^"]*)"', line)
        rows.append((n * dt.get(m.group(1), 4),
                     m.group(0), op.group(1) if op else "?"))
    rows.sort(reverse=True)
    for sz, shape, op in rows[:15]:
        print(f"{sz / 1e6:8.2f}MB  {shape:28s} {op}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
