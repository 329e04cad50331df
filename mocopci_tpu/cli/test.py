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
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from mocopci_tpu import ops
    from mocopci_tpu.config import ModelConfig, TrainConfig, tiny_model_config
    from mocopci_tpu.data import NLDriveDataset, SyntheticInterpolationDataset, batches
    from mocopci_tpu.training import CheckpointManager, create_train_state, eval_step

    ops.set_knn_mode(args.knn_mode, args.knn_recall)

    model_cfg = tiny_model_config(args.npoints) if args.tiny else ModelConfig(
        npoints=args.npoints
    )

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

    cd_lists = [[] for _ in range(3)]
    emd_lists = [[] for _ in range(3)]
    n_batches = 0
    t0 = time.time()
    for batch in batches(dataset, args.batch_size, shuffle=False, drop_last=False):
        m = eval_step(
            state,
            {k: np.asarray(v) for k, v in batch.items()},
            model_cfg,
            not args.no_emd,
        )
        for j in range(3):
            cd_lists[j].extend(np.asarray(m[f"cd_{j}"]).tolist())
            if not args.no_emd:
                emd_lists[j].extend(np.asarray(m[f"emd_{j}"]).tolist())
        n_batches += 1
    wall = time.time() - t0

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
    result["wall_s"] = wall
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
