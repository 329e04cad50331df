"""Checkpoint-converter test against the *actual* reference module tree.

Instantiates the reference PyTorch MoCoPCI (constructors only — the CUDA
extensions and pytorch3d/timm/sklearn are stubbed since they are touched only
in forward), takes its genuine ``state_dict`` key/shape inventory, converts it,
and asserts the result matches this package's parameter pytree exactly
(structure, shapes, and value orientation on a probe weight).
"""
import os
import sys
import types

import numpy as np
import pytest

import jax

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def reference_state_dict():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    # ---- stub native/unavailable deps (constructor-time only) ----
    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    timm = _stub("timm")
    timm_models = _stub("timm.models")
    _stub(
        "timm.models.layers",
        DropPath=DropPath,
        to_2tuple=to_2tuple,
        trunc_normal_=trunc_normal_,
    )
    timm.models = timm_models
    _stub("pointnet2_cuda")
    p3d = _stub("pytorch3d")
    p3d.ops = _stub("pytorch3d.ops", knn_points=lambda *a, **k: None)
    _stub("sklearn")
    _stub("sklearn.neighbors", KernelDensity=object)

    sys.path.insert(0, REF)
    try:
        from models.m_models.mocopci import MoCoPCI as TorchMoCoPCI

        net = TorchMoCoPCI()
        sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    finally:
        sys.path.remove(REF)
    return sd


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
