"""End-to-end CLI tests on synthetic data with the tiny model."""
import os
import sys
import subprocess


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
