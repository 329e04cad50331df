"""Quantify the approx-vs-exact kNN output delta on trained weights.

VERDICT r1 item 3: the headline bench runs approx-kNN while the parity proof
runs exact mode — this script measures, with the SAME converged checkpoint,
(a) the full-model Chamfer distance between the two modes' predictions,
(b) each mode's CD against ground truth, and (c) each mode's forward latency,
so the accuracy cost of the fast mode is a number, not a guess.

Usage:  python scripts/knn_mode_compare.py <ckpt_dir> [n_samples] [npoints]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/converge_r2/ckpt"
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    npoints = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

    from mocopci_tpu import ops
    from mocopci_tpu.config import ModelConfig, TrainConfig
    from mocopci_tpu.data import SyntheticInterpolationDataset
    from mocopci_tpu.models import MoCoPCI
    from mocopci_tpu.training import CheckpointManager, create_train_state

    cfg = ModelConfig(npoints=npoints)
    model = MoCoPCI(cfg)
    _, state = create_train_state(cfg, TrainConfig(), steps_per_epoch=1)
    state = CheckpointManager(os.path.abspath(ckpt_dir)).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ds = SyntheticInterpolationDataset(length=n_samples, num_points=npoints, seed=1)

    preds, lat = {}, {}
    for mode in ("approx", "exact"):
        ops.set_knn_mode(mode)           # read at trace time

        # a FRESH function object per mode: jax.jit's trace cache is keyed
        # on function identity GLOBALLY, so jit-ing the same `forward` again
        # after flipping the mode silently reuses the first mode's program
        # (caught round 4: the compare reported 0.0 between modes while the
        # kernel-level recall was 0.987)
        def forward(v, a, b, _mode=mode):
            return model.apply(v, a, b, train=False, deterministic=True)["out"]

        fwd = jax.jit(forward)
        outs, times = [], []
        for i in range(n_samples):
            inp, _ = ds[i]
            a = jnp.asarray(inp[1][None])
            b = jnp.asarray(inp[2][None])
            t0 = time.perf_counter()
            o = fwd(variables, a, b)
            o = np.asarray(o)
            times.append(time.perf_counter() - t0)
        # re-time warm (first call above includes compile)
            outs.append(o)
        preds[mode] = outs
        # NOTE: wall time per synchronous sample incl. host transfer through
        # the axon tunnel — NOT device latency (bench.py reports that)
        lat[mode] = float(np.median(times[1:]) * 1e3) if n_samples > 1 else float("nan")

    cd = jax.jit(ops.chamfer_distance)
    cross, vs_gt = {m: [] for m in preds}, {m: [] for m in preds}
    between = []
    for i in range(n_samples):
        _, gt = ds[i]
        for f in range(3):
            pa = jnp.asarray(preds["approx"][i][:, f])
            pe = jnp.asarray(preds["exact"][i][:, f])
            g = jnp.asarray(gt[f][None])
            between.append(float(cd(pa, pe)))
            vs_gt["approx"].append(float(cd(pa, g)))
            vs_gt["exact"].append(float(cd(pe, g)))

    cd_a = float(np.mean(vs_gt["approx"]))
    cd_e = float(np.mean(vs_gt["exact"]))
    print(json.dumps({
        "cd_between_modes_mean": float(np.mean(between)),
        "cd_between_modes_max": float(np.max(between)),
        "cd_vs_gt_approx": cd_a,
        "cd_vs_gt_exact": cd_e,
        "cd_rel_delta_pct": 100.0 * abs(cd_a - cd_e) / max(cd_e, 1e-12),
        "wall_ms_per_sample_approx": lat["approx"],
        "wall_ms_per_sample_exact": lat["exact"],
        "n_samples": n_samples,
        "npoints": npoints,
    }))


if __name__ == "__main__":
    main()
