"""Measure decoder rematerialization at the 32k B=1 stress config.

Compiles the train step with and without cfg.remat on the TPU, records XLA
memory_analysis (temp/argument/output bytes) and — when MOCOPCI_REMAT_RUN=1 —
one executed step's wall time for each mode.  Writes runs/remat_32k.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mocopci_tpu.config import TrainConfig, stress_model_config
from mocopci_tpu.training import create_train_state
from mocopci_tpu.training.loop import train_step


def measure(npoints: int, remat: bool, run: bool):
    cfg = dataclasses.replace(stress_model_config(npoints), remat=remat)
    tcfg = TrainConfig(batch_size=1)
    t0 = time.perf_counter()
    _, state = create_train_state(cfg, tcfg, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    pc1 = jnp.asarray(rng.normal(size=(1, npoints, 3)).astype(np.float32))
    batch = {
        "pc1": pc1,
        "pc2": pc1 + 0.01,
        "gt": jnp.asarray(
            rng.normal(size=(1, 3, npoints, 3)).astype(np.float32)
        ),
    }
    lowered = train_step.lower(state, batch, jax.random.PRNGKey(0), cfg, tcfg)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    rec = {
        "remat": remat,
        "npoints": npoints,
        "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
        "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
        "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
        "compile_s": round(time.perf_counter() - t0, 1),
    }
    if run:
        out = compiled(state, batch, jax.random.PRNGKey(0))
        jax.tree_util.tree_map(np.asarray, out[1])  # sync via transfer
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = compiled(state, batch, jax.random.PRNGKey(0))
        jax.tree_util.tree_map(np.asarray, out[1])
        rec["step_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 1)
    return rec


def main():
    npoints = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    run = os.environ.get("MOCOPCI_REMAT_RUN", "1") == "1"
    out = {"device": str(jax.devices()[0]), "results": []}
    for remat in (False, True):
        try:
            rec = measure(npoints, remat, run)
        except Exception as e:  # noqa: BLE001 — record OOM etc. and continue
            msg = str(e)
            if "Ran out of memory" in msg or "RESOURCE_EXHAUSTED" in msg:
                import re

                m = re.search(r"Used ([0-9.]+[GM]) of ([0-9.]+[GM]) hbm", msg)
                rec = {"remat": remat, "npoints": npoints, "oom": True,
                       "hbm_needed": m.group(1) if m else None,
                       "hbm_capacity": m.group(2) if m else None}
            else:
                rec = {"remat": remat, "npoints": npoints,
                       "error": f"{type(e).__name__}: {msg[:300]}"}
        print(rec, flush=True)
        out["results"].append(rec)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", f"remat_{npoints//1024}k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
