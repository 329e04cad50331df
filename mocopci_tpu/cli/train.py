"""Training entry point — flag-compatible with the reference ``train.py:18-37``.

Additions over the reference: ``--synthetic`` (no-dataset smoke training),
``--tiny`` (small model for CI), proper ``--resume`` (latest checkpoint instead
of the reference's hard-coded path, ``train.py:89-96``), and data parallelism
over all visible devices via a (data, model) mesh instead of
``torch.nn.DataParallel``.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="MoCoPCI-TPU")
    # training setting (reference names)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--lr", type=float, default=0.001, help="Learning rate.")
    p.add_argument("--weight_decay", type=float, default=0.0001, help="Weight decay.")
    p.add_argument("--resume", action="store_true", help="continue from latest checkpoint")
    p.add_argument("--save_dir", type=str, default="outputs")
    # dataset setting (reference names)
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--scene_list", type=str, default="")
    p.add_argument("--interval", type=int, default=4)
    p.add_argument("--num_frames", type=int, default=4)
    p.add_argument("--npoints", type=int, default=8192)
    p.add_argument("--t_begin", type=float, default=0.0)
    p.add_argument("--t_end", type=float, default=1.0)
    # TPU-native additions
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic samples instead of NL-Drive")
    p.add_argument("--tiny", action="store_true", help="tiny model config (tests)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-epoch metrics to this CSV")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of steps 3-8 of epoch 1")
    p.add_argument("--tensorboard", type=str, default="",
                   help="write TensorBoard event files to this directory")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize decoder-stage activations in the "
                        "backward pass (jax.checkpoint) — cuts peak XLA "
                        "temporary memory at stress sizes for a step-time "
                        "cost (see runs/remat_32k.json)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each global batch into K sequential "
                        "micro-batches with mean-combined gradients — "
                        "reproduces the reference's global-batch recipe on "
                        "fewer chips than batch elements and bounds "
                        "activation memory at stress sizes")
    p.add_argument("--knn_mode", type=str, default="approx",
                   choices=["approx", "exact"])
    p.add_argument("--knn_recall", type=float, default=0.95)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation dtype for attention/grouped-MLP paths")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host training: jax.distributed.initialize() "
                        "over DCN (TPU pod slices); the (data, model) mesh "
                        "then spans all hosts' devices")
    p.add_argument("--dp_impl", type=str, default="auto",
                   choices=["auto", "shard_map", "spmd"],
                   help="data-parallel executor: 'shard_map' runs the "
                        "unmodified single-chip program per shard with "
                        "explicit grad/stat pmeans (correct scaling for the "
                        "Pallas kernels, which XLA's SPMD partitioner would "
                        "otherwise replicate); 'spmd' is the declarative "
                        "jit+sharding path; 'auto' = shard_map when the data "
                        "axis > 1")
    p.add_argument("--batch_policy", type=str, default="global",
                   choices=["global", "per_device"],
                   help="'global': --batch_size is the global batch "
                        "(reference contract; gcd-sized data axis may idle "
                        "chips). 'per_device': --batch_size is PER DEVICE and "
                        "the global batch scales to batch_size x n_devices — "
                        "keeps every chip busy; consider linear LR scaling "
                        "(--lr), see docs/DESIGN.md")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax

    # honour JAX_PLATFORMS even when a sitecustomize pre-registered a backend
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if args.multihost:
        # must run before any backend use; auto-detects the coordinator on
        # TPU pods (or takes JAX_COORDINATOR_ADDRESS / process env vars)
        jax.distributed.initialize()
    from mocopci_tpu import ops
    from mocopci_tpu.config import ModelConfig, TrainConfig, timestamps, tiny_model_config
    from mocopci_tpu.data import NLDriveDataset, SyntheticInterpolationDataset, batches
    from mocopci_tpu.parallel import make_mesh_for_batch, replicated, shard_batch
    from mocopci_tpu.parallel.mesh import host_batch_slice, scale_batch_to_mesh

    ops.set_knn_mode(args.knn_mode, args.knn_recall)
    from mocopci_tpu.nn import set_compute_dtype

    set_compute_dtype(args.compute_dtype)
    from mocopci_tpu.training import (
        CheckpointManager,
        create_train_state,
        train_step,
    )

    import dataclasses

    t_f, t_b = timestamps(args.t_begin, args.t_end, args.interval, args.num_frames)
    model_cfg = tiny_model_config(args.npoints) if args.tiny else ModelConfig(
        npoints=args.npoints
    )
    model_cfg = dataclasses.replace(
        model_cfg, t_forward=t_f, t_backward=t_b, remat=args.remat
    )
    if args.batch_policy == "per_device":
        global_batch, mesh = scale_batch_to_mesh(args.batch_size)
        print(
            f"batch policy per_device: global batch {global_batch} "
            f"({args.batch_size}/device x {mesh.shape['data']} data shards); "
            f"LR is NOT auto-scaled (--lr to adjust)"
        )
    else:
        global_batch = args.batch_size
        mesh = make_mesh_for_batch(global_batch)
    if global_batch % max(args.grad_accum, 1) != 0:
        raise SystemExit(
            f"--batch_size {global_batch} must be divisible by "
            f"--grad_accum {args.grad_accum}"
        )
    train_cfg = TrainConfig(
        batch_size=global_batch,
        epochs=args.epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        seed=args.seed,
        grad_accum=max(args.grad_accum, 1),
    )

    if args.synthetic:
        dataset = SyntheticInterpolationDataset(
            length=args.synthetic, num_points=args.npoints, seed=args.seed
        )
    else:
        assert args.data_root and args.scene_list, "--data_root/--scene_list or --synthetic"
        scene_list = args.scene_list
        if not scene_list.endswith(".txt"):
            scene_list = scene_list + "_list.txt"  # reference convention (train.py:61)
        dataset = NLDriveDataset(
            args.data_root, scene_list, args.npoints, args.interval, args.num_frames
        )

    steps_per_epoch = max(len(dataset) // train_cfg.batch_size, 1)
    _, state = create_train_state(model_cfg, train_cfg, steps_per_epoch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"the number of network parameters: {n_params}")

    state = jax.device_put(state, replicated(mesh))
    # multi-host: every host loads only its rows of each (identically
    # shuffled) global batch; shard_batch reassembles the global arrays
    hsl = host_batch_slice(train_cfg.batch_size, mesh) if args.multihost else None

    # data-parallel executor (see --dp_impl): shard_map keeps every Pallas
    # kernel and flat gather shard-local; the declarative spmd path leaves
    # partitioning to XLA (which replicates what it cannot partition —
    # docs/DESIGN.md §3g)
    use_shard_map = args.dp_impl == "shard_map" or (
        args.dp_impl == "auto" and mesh.shape["data"] > 1
    )
    if use_shard_map:
        from mocopci_tpu.training import make_sharded_train_step

        per_shard = train_cfg.batch_size // mesh.shape["data"]
        if per_shard % train_cfg.grad_accum != 0:
            raise SystemExit(
                f"under --dp_impl shard_map the PER-SHARD batch "
                f"({train_cfg.batch_size}/{mesh.shape['data']} = {per_shard}) "
                f"must be divisible by --grad_accum {train_cfg.grad_accum}"
            )
        step_fn = make_sharded_train_step(mesh, state.apply_fn, model_cfg, train_cfg)
        print(f"dp_impl: shard_map over {mesh.shape['data']} data shard(s)")
    else:
        def step_fn(s, b, r):
            return train_step(s, b, r, model_cfg, train_cfg)

    ckpt = CheckpointManager(os.path.join(args.save_dir, "ckpt"))
    start_epoch = 0
    if args.resume and ckpt.latest_epoch() is not None:
        state, saved_spe = ckpt.restore_with_meta(state)
        start_epoch = int(ckpt.latest_epoch()) + 1
        print(f"resumed from epoch {start_epoch - 1}")
        if saved_spe and saved_spe != steps_per_epoch:
            # the step-indexed StepLR derives epoch = step // steps_per_epoch;
            # a changed dataset size would silently shift the decay boundary —
            # keep the schedule pinned to the original cadence
            from mocopci_tpu.training.loop import make_optimizer

            print(
                f"warning: steps_per_epoch changed {saved_spe} -> {steps_per_epoch}; "
                "keeping the LR schedule on the original cadence"
            )
            state = state.replace(tx=make_optimizer(train_cfg, saved_spe))
            steps_per_epoch_lr = saved_spe
        else:
            steps_per_epoch_lr = steps_per_epoch
    else:
        steps_per_epoch_lr = steps_per_epoch

    tb = None
    if args.tensorboard:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(args.tensorboard)

    # preemption safety: SIGTERM/SIGINT trigger a checkpoint save at the next
    # epoch boundary (failure recovery; the reference has none — SURVEY.md §5.3)
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"signal {signum} received — will checkpoint and stop after this epoch")

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _request_stop)
        except ValueError:  # non-main thread
            pass

    rng = jax.random.PRNGKey(train_cfg.seed)
    best_loss_f = float("inf")
    for epoch in range(start_epoch, train_cfg.epochs):
        t0 = time.time()
        sums, count = {}, 0
        for batch in batches(dataset, train_cfg.batch_size, shuffle=True,
                             seed=epoch, host_slice=hsl):
            if args.profile_dir and epoch == start_epoch and count == 3:
                jax.profiler.start_trace(args.profile_dir)
            rng, sub = jax.random.split(rng)
            state, aux = step_fn(state, shard_batch(mesh, batch), sub)
            if args.profile_dir and epoch == start_epoch and count == 8:
                jax.tree_util.tree_map(np.asarray, aux)
                jax.profiler.stop_trace()
            count += 1
            if count % args.log_every == 0:
                aux = {k: float(v) for k, v in aux.items()}
                print(
                    f"Train Epoch:{epoch + 1}[{count}/{steps_per_epoch}]"
                    + "".join(f"\t{k}: {v:.6f}" for k, v in sorted(aux.items()))
                )
            for k, v in aux.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        means = {k: v / max(count, 1) for k, v in sums.items()}
        dt = time.time() - t0
        print(f"Epoch {epoch + 1} finished", json.dumps({**means, "epoch_time_s": dt}))
        if tb is not None:
            for k, v in means.items():
                tb.add_scalar(f"train/{k}", v, epoch)
            tb.add_scalar("train/epoch_time_s", dt, epoch)
        if args.metrics_csv:
            header = not os.path.exists(args.metrics_csv)
            with open(args.metrics_csv, "a") as f:
                if header:
                    f.write("epoch," + ",".join(sorted(means)) + "\n")
                f.write(f"{epoch}," + ",".join(f"{means[k]:.6f}" for k in sorted(means)) + "\n")
        # best-by-train-loss_f checkpoint policy (ref train.py:202-215)
        if means.get("loss_f", float("inf")) < best_loss_f:
            best_loss_f = means["loss_f"]
            ckpt.save(epoch, state, metrics=means, steps_per_epoch=steps_per_epoch_lr)
            print(f"Best train loss: {best_loss_f:.4f} (checkpoint saved)")
        if stop_requested["flag"]:
            if ckpt.latest_epoch() != epoch:
                ckpt.save(epoch, state, metrics=means, steps_per_epoch=steps_per_epoch_lr)
            print(f"stopped by signal after epoch {epoch + 1} (checkpoint saved)")
            break
    if tb is not None:
        tb.close()
    ckpt.close()


if __name__ == "__main__":
    main()
