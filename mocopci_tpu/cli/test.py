"""Evaluation entry point — flag-compatible with the reference ``test.py:16-35``.

Implements the *intended* semantics of the reference eval loop (SURVEY.md §3.2):
one forward per sample producing all 3 frames (the shipped ``test.py:84``
re-runs the network once per frame and passes ``train=True``), per-frame and
average CD/EMD means over the split.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Test")
    p.add_argument("--data_root", type=str, default="", help="Dataset path.")
    p.add_argument("--scene_list", type=str, default="")
    p.add_argument("--interval", type=int, default=4)
    p.add_argument("--npoints", type=int, default=8192)
    p.add_argument("--num_frames", type=int, default=4)
    p.add_argument("--t_begin", type=float, default=0.0)
    p.add_argument("--t_end", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--pretrain_model", type=str, default="",
                   help="checkpoint directory (Orbax)")
    # additions
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--no_emd", action="store_true", help="CD-only eval")
    p.add_argument("--knn_mode", type=str, default="approx",
                   choices=["approx", "exact"],
                   help="neighbour selection backend (see ops.set_knn_mode)")
    p.add_argument("--knn_recall", type=float, default=0.95)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation dtype for attention/grouped-MLP paths")
    p.add_argument("--emd_fast", action="store_true",
                   help="fast-exp EMD kernel (metric shift < 0.1%%, see "
                        "ops.set_emd_fast); measured NEUTRAL-to-slower on "
                        "v5e at 8192^2 — kept as an experiment flag")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from mocopci_tpu import ops
    from mocopci_tpu.config import ModelConfig, TrainConfig, timestamps, tiny_model_config
    from mocopci_tpu.data import NLDriveDataset, SyntheticInterpolationDataset, batches
    from mocopci_tpu.training import CheckpointManager, create_train_state, eval_step

    ops.set_knn_mode(args.knn_mode, args.knn_recall)
    if args.emd_fast:
        ops.set_emd_fast(True)
    from mocopci_tpu.nn import set_compute_dtype

    set_compute_dtype(args.compute_dtype)

    import dataclasses

    t_f, t_b = timestamps(args.t_begin, args.t_end, args.interval, args.num_frames)
    model_cfg = tiny_model_config(args.npoints) if args.tiny else ModelConfig(
        npoints=args.npoints
    )
    model_cfg = dataclasses.replace(model_cfg, t_forward=t_f, t_backward=t_b)

    if args.synthetic:
        dataset = SyntheticInterpolationDataset(
            length=args.synthetic, num_points=args.npoints, seed=1
        )
    else:
        assert args.data_root and args.scene_list, (
            "provide --data_root and --scene_list, or --synthetic N"
        )
        dataset = NLDriveDataset(
            args.data_root, args.scene_list, args.npoints, args.interval, args.num_frames
        )

    _, state = create_train_state(model_cfg, TrainConfig(), steps_per_epoch=1)
    if args.pretrain_model:
        ckpt = CheckpointManager(args.pretrain_model)
        state = ckpt.restore(state)
        ckpt.close()

    import jax.numpy as jnp

    # Throughput-first eval pipeline (VERDICT r2 #3): per-frame CD/EMD are
    # accumulated ON DEVICE across the whole split and transferred to the
    # host ONCE at the end — the round-2 loop forced a host sync + metric
    # transfer per batch, which at batch 1 through the TPU tunnel cost ~300
    # of 431 ms/sample.  With no per-batch sync, JAX async dispatch pipelines
    # batch k+1's host prep under batch k's device work; the input stream is
    # prefetched by the loader thread.
    F = 3
    compile_s = 0.0
    steady_s = 0.0
    steady_samples = 0
    total_samples = 0
    sums = None
    first_batch = None
    first_real = 0
    t1 = time.perf_counter()
    for i, batch in enumerate(batches(dataset, args.batch_size, shuffle=False, drop_last=False)):
        batch = {k: np.asarray(v) for k, v in batch.items()}
        real = batch["pc1"].shape[0]
        if real < args.batch_size:
            # pad the ragged tail batch to the compiled shape (a second jit
            # compile mid-run would otherwise poison the steady-state timing);
            # padded rows are excluded from the metric sums below
            pad = args.batch_size - real
            batch = {
                k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                for k, v in batch.items()
            }
        m = eval_step(state, batch, model_cfg, not args.no_emd)
        part = {k: jnp.sum(v[:real]) for k, v in m.items()}   # lazy, on device
        sums = part if sums is None else {
            k: sums[k] + part[k] for k in sums
        }
        total_samples += real
        if i == 0:
            jax.tree_util.tree_map(np.asarray, part)          # compile barrier
            compile_s = time.perf_counter() - t1
            first_batch = batch
            first_real = real          # padded rows must not inflate rates
            t1 = time.perf_counter()
        else:
            steady_samples += real
    sums = {k: float(v) for k, v in (sums or {}).items()}     # ONE final sync
    steady_s = time.perf_counter() - t1
    if steady_samples == 0 and first_batch is not None:
        # single-batch split: re-time the compiled program
        t1 = time.perf_counter()
        m = eval_step(state, first_batch, model_cfg, not args.no_emd)
        jax.tree_util.tree_map(np.asarray, m)
        steady_s = time.perf_counter() - t1
        steady_samples = first_real
    per_sample_ms = 1e3 * steady_s / max(steady_samples, 1)
    # two latency decompositions of the compiled program:
    #  - device_ms: 10 back-to-back async invocations, ONE terminal sync —
    #    the per-call host->device round-trip amortizes to 1/10th, so this
    #    converges on the device execution time per sample (slight upper
    #    bound: it still contains one round-trip share and host dispatch)
    #  - synced_roundtrip_ms: per-call full sync — device time PLUS one full
    #    host<->device round-trip per call (through the axon tunnel the
    #    round-trip dominates; this is NOT a device-time measurement)
    device_ms = 0.0
    synced_ms = 0.0
    if first_batch is not None:
        reps = 10
        t1 = time.perf_counter()
        for _ in range(reps):
            m = eval_step(state, first_batch, model_cfg, not args.no_emd)
        jax.tree_util.tree_map(np.asarray, m)
        device_ms = 1e3 * (time.perf_counter() - t1) / (reps * first_real)
        reps = 3
        t1 = time.perf_counter()
        for _ in range(reps):
            m = eval_step(state, first_batch, model_cfg, not args.no_emd)
            jax.tree_util.tree_map(np.asarray, m)
        synced_ms = 1e3 * (time.perf_counter() - t1) / (reps * first_real)
    print(f"inference+metrics: {per_sample_ms:.2f} ms/sample wall "
          f"(steady state over {steady_samples} samples; compile "
          f"{compile_s:.1f}s excluded; device est {device_ms:.2f} "
          f"ms/sample; synced incl. round-trip {synced_ms:.2f} ms/sample)")
    cd_lists = [[sums[f"cd_{j}"] / max(total_samples, 1)] for j in range(F)]
    emd_lists = [
        [sums.get(f"emd_{j}", 0.0) / max(total_samples, 1)] for j in range(F)
    ]

    result = {}
    for j in range(3):
        result[f"cd_frame{j + 1}"] = float(np.mean(cd_lists[j]))
        print(f"Frame{j + 1}: Mean chamfer distance: ", result[f"cd_frame{j + 1}"])
        if not args.no_emd:
            result[f"emd_frame{j + 1}"] = float(np.mean(emd_lists[j]))
            print(f"Frame{j + 1}: Mean earth mover's distance: ", result[f"emd_frame{j + 1}"])
    print("-------------------------------------------")
    result["cd_mean"] = float(np.mean([np.mean(c) for c in cd_lists]))
    print("Average: Mean chamfer distance: ", result["cd_mean"])
    if not args.no_emd:
        result["emd_mean"] = float(np.mean([np.mean(e) for e in emd_lists]))
        print("Average: Mean earth mover's distance: ", result["emd_mean"])
    result["wall_s"] = steady_s
    result["compile_s"] = compile_s
    result["per_sample_ms"] = per_sample_ms
    result["device_ms_per_sample"] = device_ms
    result["synced_roundtrip_ms_per_sample"] = synced_ms
    result["n_samples"] = total_samples
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
