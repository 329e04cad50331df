"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the JAX-native way to exercise mesh/pjit code without TPU hardware
(SURVEY.md §4); the real-chip path is exercised by bench.py / __graft_entry__.

Note: this environment registers a TPU ("axon") PJRT backend from
sitecustomize at interpreter startup, so setting JAX_PLATFORMS in the
environment is not enough — we must override the jax config before any backend
is initialised.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective" not in flags:
    # 8 virtual devices timeshare ONE physical core: inside a single fused
    # shard_map program their compute segments drift minutes apart before a
    # collective, and XLA:CPU's rendezvous (default ~30s) aborts the process
    # (observed on the 16k point-sharded forward).  Harmless on real meshes.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        " --xla_cpu_collective_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the model compiles are the dominant test cost on CPU.
# KNOWN INFRA FLAKE (round 5): this environment's XLA:CPU AOT loader warns on
# every cache hit that the cached executable's machine features don't match
# the host ("+prefer-no-scatter ... could lead to execution errors such as
# SIGILL"), and very occasionally that load SEGVs the process (observed once
# in ~10 full-suite runs, inside jax's compilation_cache.get_executable_and_time
# — not in package code; the same test passes on re-run).  If a suite run
# dies with exit 139 there, re-run or clear /root/repo/.jax_cache.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
