"""Device mesh and sharding helpers.

The reference's entire distributed surface is single-process
``torch.nn.DataParallel`` (``train.py:75-78``).  TPU-native, data parallelism
is expressed declaratively: a 2-D ``("data", "model")`` mesh, batch sharded on
``data``, parameters replicated; XLA inserts the gradient all-reduce over ICI.
The ``model`` axis is a standing hook for point-dimension sharding at stress
sizes (SURVEY.md §5.7) — size 1 for the reference-scale model.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    devices = jax.devices()
    if n_data is not None and len(devices) < n_data * n_model:
        # the default platform is too small (e.g. one real TPU while the
        # caller wants a virtual multi-device CPU mesh) — fall back to CPU
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_data * n_model:
                devices = cpu
        except RuntimeError:
            pass
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def make_mesh_for_batch(batch_size: int, n_model: int = 1) -> Mesh:
    """Mesh whose data axis evenly divides the global batch."""
    import math

    avail = len(jax.devices()) // n_model
    n_data = math.gcd(batch_size, avail)
    return make_mesh(max(n_data, 1), n_model)


def scale_batch_to_mesh(per_device_batch: int, n_model: int = 1):
    """Batch-to-mesh scaling policy: keep every chip busy.

    The reference recipe is GLOBAL batch 2 (``train.py:58``) under
    DataParallel; ``make_mesh_for_batch`` reproduces that contract but on an
    8-chip slice it would use gcd(2, 8) = 2 chips and idle six.  This policy
    instead fixes the PER-DEVICE batch and scales the global batch with the
    data axis: ``global = per_device_batch * n_data`` over all visible
    devices.

    LR note: the reference schedule (AdamW 1e-3, StepLR 15/0.8) is tuned for
    global batch 2.  With K× the global batch, standard practice is linear LR
    scaling (lr × K) with warmup; this function does NOT silently rescale —
    pass ``--lr`` explicitly (documented in docs/DESIGN.md §DP-scaling).

    Returns:
      (global_batch, mesh)
    """
    avail = max(len(jax.devices()) // n_model, 1)
    mesh = make_mesh(avail, n_model)
    return per_device_batch * avail, mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_batch_slice(global_batch: int, mesh: Optional[Mesh] = None) -> slice:
    """The slice of the global batch THIS host must load (multi-host DP).

    With ``mesh`` given, ownership is computed from the ACTUAL batch
    sharding's device→index map, so prefix meshes (``make_mesh_for_batch``
    with a batch smaller than the slice, e.g. the reference's global batch 2
    on a 2-host × 4-chip slice) resolve correctly: a host whose devices hold
    no batch rows gets an empty slice instead of rows some other host's
    devices own.

    Without a mesh, falls back to the process-contiguous full-device layout
    (process i owns rows ``[i*B/p, (i+1)*B/p)``) — only valid when the mesh
    spans all devices and ``global_batch % process_count == 0``.
    Single-process: the whole batch either way.
    """
    p = jax.process_count()
    if p == 1:
        return slice(0, global_batch)
    if mesh is None:
        assert global_batch % p == 0, (global_batch, p)
        per = global_batch // p
        i = jax.process_index()
        return slice(i * per, (i + 1) * per)
    imap = batch_sharding(mesh).devices_indices_map((global_batch,))
    pid = jax.process_index()
    spans = sorted(
        {
            (idx[0].start or 0,
             global_batch if idx[0].stop is None else idx[0].stop)
            for d, idx in imap.items()
            if d.process_index == pid
        }
    )
    if not spans:
        return slice(0, 0)
    lo, hi = spans[0][0], spans[-1][1]
    cursor = lo
    for a, b in spans:  # make_array_from_process_local_data needs contiguity
        assert a <= cursor, (
            f"this process's batch rows are not contiguous: {spans}; "
            "reorder the mesh devices process-contiguously"
        )
        cursor = max(cursor, b)
    return slice(lo, hi)


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of batch arrays batch-sharded over the mesh.

    Single-process: ``tree`` holds the global batch; plain ``device_put``.

    Multi-host (``jax.distributed.initialize``, ``--multihost``): ``tree``
    holds only THIS host's rows (``host_batch_slice`` of the global batch —
    each host loads 1/p of the data instead of materialising the global
    batch) and the global arrays are assembled from the per-process shards
    without any cross-host copy.
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def put(x):
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)
