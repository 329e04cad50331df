"""End-to-end CLI tests on synthetic data with the tiny model."""
import os
import sys
import subprocess

import pytest

# each test pays a fresh interpreter + jax import + (cached) compile; >60s
# apiece on this 1-CPU host
pytestmark = pytest.mark.slow


def _run(args, timeout=1200):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # reuse the test compile cache
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
        env=env,
    )


def test_train_cli_synthetic(tmp_path):
    r = _run(
        [
            "train.py",
            "--synthetic", "4",
            "--tiny",
            "--npoints", "64",
            "--batch_size", "2",
            "--epochs", "2",
            "--save_dir", str(tmp_path),
            "--log_every", "1",
            "--metrics_csv", str(tmp_path / "m.csv"),
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "network parameters" in r.stdout
    assert "Epoch 2 finished" in r.stdout
    assert (tmp_path / "m.csv").exists()
    assert os.path.isdir(str(tmp_path / "ckpt"))


def test_eval_cli_synthetic():
    r = _run(
        [
            "test.py",
            "--synthetic", "2",
            "--tiny",
            "--npoints", "64",
            "--batch_size", "1",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Average: Mean chamfer distance:" in r.stdout
    assert "Average: Mean earth mover's distance:" in r.stdout
    # latency hygiene: per-sample latency printed, compile excluded from wall_s
    assert "ms/sample" in r.stdout
    import json

    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["compile_s"] > 0
    assert 0 < summary["wall_s"] < summary["compile_s"]


def test_resume_with_changed_dataset_size_pins_lr_cadence(tmp_path):
    common = ["train.py", "--tiny", "--npoints", "64", "--batch_size", "2",
              "--save_dir", str(tmp_path), "--log_every", "100"]
    r = _run(common + ["--synthetic", "4", "--epochs", "1"])
    assert r.returncode == 0, r.stderr[-3000:]
    # resume with a different dataset size -> different steps_per_epoch
    r = _run(common + ["--synthetic", "8", "--epochs", "2", "--resume"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "resumed from epoch 0" in r.stdout
    assert "steps_per_epoch changed 2 -> 4" in r.stdout


def test_train_cli_round5_flags(tmp_path):
    """--grad_accum + --remat + --dp_impl shard_map compose end-to-end."""
    r = _run(
        [
            "train.py",
            "--synthetic", "16",
            "--tiny",
            "--npoints", "64",
            "--batch_size", "16",  # 8 shards x per-shard 2 -> micro-batches of 1
            "--grad_accum", "2",
            "--remat",
            "--dp_impl", "shard_map",
            "--epochs", "1",
            "--save_dir", str(tmp_path),
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dp_impl: shard_map" in r.stdout
    assert "Epoch 1 finished" in r.stdout


def test_eval_cli_emd_fast():
    r = _run(
        [
            "test.py",
            "--synthetic", "2",
            "--tiny",
            "--npoints", "64",
            "--emd_fast",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Average: Mean earth mover's distance" in r.stdout
