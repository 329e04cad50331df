"""Checkpoint-converter test against the *actual* reference module tree.

Instantiates the reference PyTorch MoCoPCI (constructors only — the CUDA
extensions and pytorch3d/timm/sklearn are stubbed since they are touched only
in forward), takes its genuine ``state_dict`` key/shape inventory, converts it,
and asserts the result matches this package's parameter pytree exactly
(structure, shapes, and value orientation on a probe weight).
"""
import os
import sys

import numpy as np
import pytest

import jax

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def reference_state_dict():
    pytest.importorskip("torch")
    from tests.ref_torch import install_reference_stubs

    install_reference_stubs()
    from models.m_models.mocopci import MoCoPCI as TorchMoCoPCI

    net = TorchMoCoPCI()
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}


def test_converted_tree_matches_model(reference_state_dict):
    from mocopci_tpu.config import ModelConfig
    from mocopci_tpu.models import MoCoPCI
    from mocopci_tpu.training.convert import convert_reference_state_dict

    params, batch_stats = convert_reference_state_dict(reference_state_dict)

    cfg = ModelConfig()
    model = MoCoPCI(cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    x = jnp.zeros((1, cfg.npoints, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, x, train=True)
    )

    flat_ours = jax.tree_util.tree_flatten_with_path(shapes["params"])[0]
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    missing, mismatched = [], []
    for path, leaf in flat_ours:
        if path not in flat_conv:
            missing.append(jax.tree_util.keystr(path))
        elif tuple(flat_conv[path].shape) != tuple(leaf.shape):
            mismatched.append(
                (jax.tree_util.keystr(path), flat_conv[path].shape, leaf.shape)
            )
    assert not missing, f"converter missing params: {missing[:10]}"
    assert not mismatched, f"shape mismatches: {mismatched[:10]}"
    # no extras either
    extra = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        if p not in dict(flat_ours)
    ]
    assert not extra, f"converter produced unknown params: {extra[:10]}"

    # batch_stats structure matches too
    flat_bs_ours = {
        p for p, _ in jax.tree_util.tree_flatten_with_path(shapes["batch_stats"])[0]
    }
    flat_bs_conv = {
        p for p, _ in jax.tree_util.tree_flatten_with_path(batch_stats)[0]
    }
    assert flat_bs_ours == flat_bs_conv

    # orientation probe: a Linear weight (out,in) must land transposed
    w_t = reference_state_dict["encoder.level0.linear.weight"]
    got = params["encoder"]["level0"]["linear"]["kernel"]
    np.testing.assert_array_equal(got, w_t.T)


def test_reference_dead_modules_are_dropped(reference_state_dict):
    """The dead-but-parameterised submodules (SURVEY.md §1) exist in the
    reference state dict and are deliberately not converted."""
    keys = set(reference_state_dict)
    assert any(k.startswith("multi_frame_inference.recurrent0.") for k in keys)
    assert any(k.startswith("multi_frame_inference.fusion_gru.") for k in keys)
    assert any(k.startswith("multi_frame_inference.rf_block0.") for k in keys)


@pytest.mark.slow
def test_converter_cli_roundtrip(reference_state_dict, tmp_path):
    """``python -m mocopci_tpu.training.convert ref.pth out`` writes an Orbax
    checkpoint that the eval CLI's CheckpointManager restores (VERDICT r2 #5)."""
    torch = pytest.importorskip("torch")

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in reference_state_dict.items()}
    pth = tmp_path / "ref.pth"
    torch.save({"net": sd, "epoch": 3}, str(pth))

    from mocopci_tpu.training import convert

    out = tmp_path / "orbax_ckpt"
    convert.main([str(pth), str(out)])

    from mocopci_tpu.config import ModelConfig, TrainConfig
    from mocopci_tpu.training import CheckpointManager, create_train_state

    _, state = create_train_state(ModelConfig(), TrainConfig(), steps_per_epoch=1)
    mgr = CheckpointManager(str(out))
    state = mgr.restore(state)
    mgr.close()
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["level0"]["linear"]["kernel"]),
        reference_state_dict["encoder.level0.linear.weight"].T,
    )


def test_load_reference_checkpoint_pth(reference_state_dict, tmp_path):
    """End-to-end: a torch-saved reference checkpoint file loads and converts."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in reference_state_dict.items()}
    path = tmp_path / "ckpt_best_0_0.0.pth"
    torch.save({"net": sd, "epoch": 0}, str(path))

    from mocopci_tpu.training.convert import load_reference_checkpoint

    params, batch_stats = load_reference_checkpoint(str(path))
    assert "encoder" in params and "estimator" in params
    w = params["encoder"]["level0"]["linear"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(w), reference_state_dict["encoder.level0.linear.weight"].T
    )
