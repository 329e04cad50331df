"""Per-device compiled-HLO cost of the DP train step (VERDICT r4 #9).

The virtual-mesh wall-time table (runs/dp_scaling.json) cannot show scaling —
8 virtual devices timeshare one core.  What CAN be shown without hardware is
the per-device *program*: with fixed per-device batch, XLA's SPMD partitioner
should emit a per-device executable whose FLOPs and HBM bytes are constant in
mesh size, plus collectives whose payload is the gradient size.  This script
compiles the tiny-model train step at n_data in {1,2,4,8} (per-device batch
1) and records compiled cost_analysis() flops/bytes and the collective
instruction census parsed from the optimized HLO.  Writes
runs/dp_device_cost.json.
"""
import json
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


_COLL = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute)\b"
)
_SHAPE = re.compile(r"\b([a-z]+\d+)\[([\d,]*)\]")


def _collective_census(hlo_text: str):
    """instruction count + payload bytes per collective kind (output shapes)."""
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
                "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}
    census = {}
    for line in hlo_text.splitlines():
        m = _COLL.search(line)
        if not m or "=" not in line:
            continue
        kind = m.group(1)
        lhs = line.split("=")[0]
        sm = _SHAPE.search(line.split("=", 1)[1])
        nbytes = 0
        if sm:
            dt, dims = sm.groups()
            n = 1
            for d in filter(None, dims.split(",")):
                n *= int(d)
            nbytes = n * dt_bytes.get(dt, 4)
        c = census.setdefault(kind, {"count": 0, "bytes": 0})
        c["count"] += 1
        c["bytes"] += nbytes
    return census


def main(out="runs/dp_device_cost.json", npoints=64, per_device_batch=1):
    npoints = int(npoints)
    per_device_batch = int(per_device_batch)
    sizes = tuple(
        int(s) for s in os.environ.get("MOCOPCI_DP_SIZES", "1,2,4,8").split(",")
    )
    cfg = tiny_model_config(npoints)
    tcfg = TrainConfig(lr=1e-3)
    _, state0 = create_train_state(cfg, tcfg, steps_per_epoch=1)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state0.params))
    rng = np.random.default_rng(0)
    rows = []
    for n_data in sizes:
        B = per_device_batch * n_data
        mesh = make_mesh(n_data=n_data, n_model=1)
        batch = shard_batch(mesh, {
            "pc1": rng.normal(size=(B, cfg.npoints, 3)).astype(np.float32),
            "pc2": rng.normal(size=(B, cfg.npoints, 3)).astype(np.float32),
            "gt": rng.normal(size=(B, 3, cfg.npoints, 3)).astype(np.float32),
        })
        state = jax.device_put(state0, replicated(mesh))
        compiled = train_step.lower(
            state, batch, jax.random.PRNGKey(0), cfg, tcfg
        ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        census = _collective_census(compiled.as_text())
        rows.append({
            "n_data": n_data,
            "global_batch": B,
            "flops_per_device": float(ca.get("flops", -1)),
            "bytes_per_device": float(ca.get("bytes accessed", -1)),
            "collectives": census,
        })
        print(rows[-1], flush=True)
    base = rows[0]["flops_per_device"]
    for r in rows[1:]:
        ratio = r["flops_per_device"] / base
        r["flops_ratio_vs_1dev"] = round(ratio, 4)
    result = {
        "what": "compiled per-device SPMD program cost at fixed per-device "
                "batch — constant flops/bytes per device IS the DP scaling "
                "evidence obtainable without multi-chip hardware",
        "n_params": int(n_params),
        "grad_allreduce_expected_bytes": int(n_params * 4),
        "per_device_batch": per_device_batch,
        "npoints": npoints,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:3])
