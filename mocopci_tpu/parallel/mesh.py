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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of (B, ...) arrays batch-sharded over the mesh.

    Multi-host (``jax.distributed.initialize``, ``--multihost``): every
    process holds the identical GLOBAL batch (the loaders shuffle with a
    per-epoch seed, so all hosts draw the same samples) and each host's
    devices pick out their shards via ``make_array_from_callback`` — the
    standard single-controller pattern; no per-host data partitioning code.
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)
