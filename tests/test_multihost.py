"""Multi-host data-parallel plumbing.

Fast tests cover the batch-to-mesh policy and the per-host loading contract;
the slow test runs a REAL 2-process ``jax.distributed`` group on localhost
(CPU backend) and checks that per-host shards assemble into the correct
global batch and that a jitted global reduction agrees across processes.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from mocopci_tpu.data import SyntheticInterpolationDataset, batches
from mocopci_tpu.parallel.mesh import host_batch_slice, scale_batch_to_mesh


def test_host_batch_slice_single_process():
    assert host_batch_slice(6) == slice(0, 6)


def test_host_batch_slice_mesh_aware_single_process():
    from mocopci_tpu.parallel.mesh import make_mesh

    # single process owns every mesh device -> the whole batch, for both the
    # full mesh and a prefix mesh (the device->rows map path)
    assert host_batch_slice(8, make_mesh(n_data=8)) == slice(0, 8)
    assert host_batch_slice(2, make_mesh(n_data=2)) == slice(0, 2)


def test_scale_batch_to_mesh_uses_all_devices():
    global_batch, mesh = scale_batch_to_mesh(2)
    n = len(jax.devices())
    assert mesh.shape["data"] == n
    assert global_batch == 2 * n


def test_batches_host_slice_rows_match_global():
    ds = SyntheticInterpolationDataset(length=8, num_points=16, seed=3)
    full = list(batches(ds, 4, shuffle=True, seed=7))
    part = list(batches(ds, 4, shuffle=True, seed=7, host_slice=slice(1, 3)))
    assert len(full) == len(part)
    for f, p in zip(full, part):
        assert p["pc1"].shape[0] == 2
        np.testing.assert_array_equal(p["pc1"], f["pc1"][1:3])
        np.testing.assert_array_equal(p["gt"], f["gt"][1:3])


_WORKER = r"""
import os, sys
import numpy as np
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2
assert len(jax.devices()) == 4          # 2 virtual CPU devices per process
import jax.numpy as jnp
from mocopci_tpu.parallel.mesh import host_batch_slice, make_mesh, shard_batch

mesh = make_mesh(n_data=4, n_model=1)
B = 8
rng = np.random.default_rng(0)          # same seed on both hosts
batch = {"x": rng.normal(size=(B, 4)).astype(np.float32)}
sl = host_batch_slice(B, mesh)
assert sl == slice(proc_id * 4, proc_id * 4 + 4), sl
local = {k: v[sl] for k, v in batch.items()}
sharded = shard_batch(mesh, local)
assert sharded["x"].shape == (B, 4)     # global shape from per-host shards

got = float(jax.jit(lambda t: jnp.sum(t["x"]))(sharded))
want = float(batch["x"].sum())
assert abs(got - want) < 1e-4 * max(abs(want), 1.0), (got, want)

# prefix mesh (reference global batch 2 on a 2-host slice): both mesh
# devices belong to process 0, so host 0 loads both rows and host 1 none —
# the device->rows map, NOT process-contiguous arithmetic
pmesh = make_mesh(n_data=2, n_model=1)
owners = {d.process_index for d in pmesh.devices.flat}
psl = host_batch_slice(2, pmesh)
if proc_id in owners:
    assert psl == slice(0, 2), psl
else:
    assert psl == slice(0, 0), psl
print(f"proc {proc_id} OK sum={got:.6f}")
"""


@pytest.mark.slow
def test_two_process_distributed_shard_batch(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
