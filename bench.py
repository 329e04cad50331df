"""Benchmark: interpolated frame-pairs/sec/chip (the BASELINE.json north star).

Runs the flagship model (8192 points, one-shot 3-frame interpolation) on the
available accelerator, measures steady-state end-to-end forward latency, and
prints ONE JSON line.

Baseline note: the reference publishes no absolute numbers (BASELINE.md — the
README carries only a relative "2× speedup" claim and the runtime-printed
latency was never recorded).  ``vs_baseline`` is therefore computed against a
documented proxy: 10 frame-pairs/sec, i.e. 2× the ~5 pairs/s implied by the
~200 ms/frame iterative GPU interpolators the reference claims to halve.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 10.0


def main() -> None:
    from mocopci_tpu.config import ModelConfig
    from mocopci_tpu.models import MoCoPCI
    from mocopci_tpu.data import SyntheticInterpolationDataset

    batch = 1
    cfg = ModelConfig()
    model = MoCoPCI(cfg)

    ds = SyntheticInterpolationDataset(length=batch, num_points=cfg.npoints, seed=0)
    inputs = [ds[i] for i in range(batch)]
    x1 = jnp.asarray(np.stack([s[0][1] for s in inputs]))
    x2 = jnp.asarray(np.stack([s[0][2] for s in inputs]))

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda a, b: model.init({"params": rng, "dropout": rng}, a, b, train=False)
    )(x1, x2)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), variables)
    init_s = time.perf_counter() - t0

    @jax.jit
    def forward(variables, x1, x2):
        out = model.apply(variables, x1, x2, train=False, deterministic=True)["out"]
        # scalar probe: forces full execution on sync without a bulk transfer
        # (block_until_ready does not reliably block through the axon tunnel)
        return out, jnp.sum(out)

    t0 = time.perf_counter()
    _, probe = forward(variables, x1, x2)
    np.asarray(probe)
    compile_s = time.perf_counter() - t0

    # warmup + timed runs
    for _ in range(3):
        np.asarray(forward(variables, x1, x2)[1])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        _, probe = forward(variables, x1, x2)
    np.asarray(probe)
    elapsed = (time.perf_counter() - t0) / iters

    pairs_per_sec = batch / elapsed
    print(
        f"device={jax.devices()[0]} init={init_s:.1f}s compile={compile_s:.1f}s "
        f"latency={elapsed * 1e3:.2f}ms batch={batch}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "frame_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
