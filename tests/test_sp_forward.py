"""Whole-model point-sharded (SP) eval forward vs the unsharded forward.

The SP forward (parallel/sp_forward.py) runs the SAME flax modules with the
point axis sharded over the mesh 'model' axis and explicit all-gathers; with
identical parameters its output must match the dense forward up to
reduction-order rounding (neighbour sets are bit-identical: each kNN row is
computed from the same full reference set either way).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocopci_tpu.config import tiny_model_config, stress_model_config
from mocopci_tpu.models import MoCoPCI
from mocopci_tpu.parallel import make_mesh
from mocopci_tpu.parallel.sp_forward import eval_forward_sp


def _init_and_clouds(cfg, B, seed=0):
    model = MoCoPCI(cfg)
    rng = jax.random.PRNGKey(seed)
    r = np.random.default_rng(seed)
    x1 = jnp.asarray(r.normal(size=(B, cfg.npoints, 3)).astype(np.float32))
    x2 = jnp.asarray(
        x1 + 0.05 * r.normal(size=(B, cfg.npoints, 3)).astype(np.float32)
    )
    variables = jax.jit(
        lambda a, b: model.init({"params": rng, "dropout": rng}, a, b, train=True)
    )(x1, x2)
    return model, variables, x1, x2


@pytest.mark.slow  # ~10 min on the 1-core CPU-mesh host (two full compiles)
def test_sp_forward_matches_dense_tiny():
    cfg = tiny_model_config(128)
    model, variables, x1, x2 = _init_and_clouds(cfg, B=2)
    dense = np.asarray(
        model.apply(variables, x1, x2, train=False, deterministic=True)["out"]
    )
    mesh = make_mesh(n_data=2, n_model=4)
    sp = np.asarray(eval_forward_sp(mesh, cfg, variables, x1, x2))
    assert sp.shape == dense.shape == (2, 3, cfg.npoints, 3)
    scale = np.abs(dense).mean()
    diff = np.abs(sp - dense)
    assert diff.mean() < 1e-4 * scale, (diff.mean(), scale)
    assert diff.max() < 1e-2 * scale, (diff.max(), scale)


@pytest.mark.stress
def test_sp_forward_16k_stress():
    """BASELINE config 5: the full 16k-point SP eval forward on the virtual
    mesh matches the unsharded stress forward (opt-in: dense 16k forwards on
    the 1-CPU host take many minutes)."""
    cfg = stress_model_config(16384)
    model, variables, x1, x2 = _init_and_clouds(cfg, B=1)
    dense = np.asarray(
        model.apply(variables, x1, x2, train=False, deterministic=True)["out"]
    )
    mesh = make_mesh(n_data=1, n_model=8)
    sp = np.asarray(eval_forward_sp(mesh, cfg, variables, x1, x2))
    scale = np.abs(dense).mean()
    diff = np.abs(sp - dense)
    assert diff.mean() < 1e-4 * scale, (diff.mean(), scale)
    assert np.isfinite(sp).all()
