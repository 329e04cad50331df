"""PyTorch-reference checkpoint → flax params converter.

Maps the reference ``state_dict`` (``torch.save({'net': ...})``,
``train.py:206-215``) onto this package's parameter pytree so that reference
weights can be evaluated here for CD/EMD parity runs.

Orientation rules:
  - ``nn.Linear`` / 1x1 ``nn.Conv1d`` / 1x1 ``nn.Conv2d`` weight (out, in[,1,1])
    → Dense kernel (in, out): squeeze + transpose.
  - ``nn.LayerNorm``/``nn.BatchNorm*``: weight→scale, bias→bias;
    running_mean/var → batch_stats.
  - depthwise Conv1d(dim groups=dim, k=1) weight (C,1,1) → per-channel scale.
  - ``PointConv.linear`` consumes the (C·W)-flattened aggregation with C-major
    layout in both frameworks (torch ``.view(B,N,-1)`` of (...,C,W); here
    row-major reshape of (...,C,W)) → plain transpose works.

Keys deliberately dropped (dead on the live path — SURVEY.md §1):
``recurrent0.*``, ``rf_block0.*``, ``fusion_gru.*``, ``deconv1_0.*``,
``cross3.{pos2,mlp2,bias1,bias2,*.}`` third-pass weights, ``cross_block*.norm2``
(declared, never called in ``Cross_Frame_Att.forward``), and the ``bias``
parameters of the cross/bid/fe layers that are created but never added
(``pointconv_util.py:729,885,1118``).
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _dense(sd, key):
    """torch Linear/1x1-conv (out,in[,1,1]) -> {'kernel': (in,out), 'bias': (out,)}"""
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    w = w.reshape(w.shape[0], w.shape[1]).T
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return out


def _norm(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }


def _norm_stats(sd, key):
    return {
        "mean": np.asarray(sd[f"{key}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{key}.running_var"], np.float32),
    }


def _weightnet(sd, key):
    return {
        "conv0": _dense(sd, f"{key}.mlp_convs.0"),
        "conv1": _dense(sd, f"{key}.mlp_convs.1"),
        "conv_out": _dense(sd, f"{key}.mlp_convs.2"),
    }


def _pointconv(sd, key):
    return {"weightnet": _weightnet(sd, f"{key}.weightnet"), "linear": _dense(sd, f"{key}.linear")}


def _convlrelu(sd, key):
    """reference composed Conv1d module: {key}.composed_module.0"""
    return {"conv": _dense(sd, f"{key}.composed_module.0")}


def _cross_attention(sd, key):
    return {
        "q": _dense(sd, f"{key}.q"),
        "kv": _dense(sd, f"{key}.kv"),
        "proj": _dense(sd, f"{key}.proj"),
    }


def _ei(sd, key):
    return {
        "injector": {
            "query_norm": _norm(sd, f"{key}.injector.query_norm"),
            "feat_norm": _norm(sd, f"{key}.injector.feat_norm"),
            "attn": _cross_attention(sd, f"{key}.injector.attn"),
            "gamma": np.asarray(sd[f"{key}.injector.gamma"], np.float32),
        },
        "extractor": {
            "query_norm": _norm(sd, f"{key}.extractor.query_norm"),
            "feat_norm": _norm(sd, f"{key}.extractor.feat_norm"),
            "ffn_norm": _norm(sd, f"{key}.extractor.ffn_norm"),
            "attn": _cross_attention(sd, f"{key}.extractor.attn"),
            "ffn": {
                "fc1": _dense(sd, f"{key}.extractor.ffn.fc1"),
                "fc2": _dense(sd, f"{key}.extractor.ffn.fc2"),
            },
        },
        "pj": {"kernel": np.asarray(sd[f"{key}.pj.weight"], np.float32).T},
    }


def _easymlp(sd, key):
    return {
        "fc1": _dense(sd, f"{key}.fc1"),
        "fc2": _dense(sd, f"{key}.fc2"),
        "act": {"alpha": np.asarray(sd[f"{key}.act.weight"], np.float32).reshape(())},
    }


def _mlpt(sd, key):
    dw_w = np.asarray(sd[f"{key}.dwconv.dwconv.weight"], np.float32).reshape(-1)
    dw_b = np.asarray(sd[f"{key}.dwconv.dwconv.bias"], np.float32)
    out = _easymlp(sd, key)
    out["dw_scale"] = dw_w
    out["dw_bias"] = dw_b
    return out


def _cross_frame_block(sd, key):
    """Cross_Frame_Att -> CrossFrameBlock params (+ batch stats separately)."""
    return {
        "norm1": _norm(sd, f"{key}.norm1"),
        "attn_q": _dense(sd, f"{key}.attn_feats.q"),
        "attn_kv": _dense(sd, f"{key}.attn_feats.kv"),
        "attn_proj": _dense(sd, f"{key}.attn_feats.proj"),
        "trans_block_2": _easymlp(sd, f"{key}.trans_block_2"),
        "mapping_xyz": _dense(sd, f"{key}.mapping_xyz"),
    }


def _multi_frame_block(sd, key):
    return {
        "norm1": _norm(sd, f"{key}.norm1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "attn_q": _dense(sd, f"{key}.attn_feats.q"),
        "attn_kv": _dense(sd, f"{key}.attn_feats.kv"),
        "attn_proj": _dense(sd, f"{key}.attn_feats.proj"),
        "mlp": _mlpt(sd, f"{key}.mlp"),
        "trans_block": _mlpt(sd, f"{key}.trans_block"),
        "mapping_xyz": _dense(sd, f"{key}.mapping_xyz"),
    }


def _bid_like(sd, key, mlp_len):
    out = {
        "pos": _dense(sd, f"{key}.pos"),
        "cross_t11": _dense(sd, f"{key}.cross_t11"),
        "cross_t22": _dense(sd, f"{key}.cross_t22"),
    }
    for i in range(mlp_len):
        out[f"mlp_{i}"] = {"conv": _dense(sd, f"{key}.mlp.{i}.composed_module.0")}
    return out


def _fe(sd, key, mlp_len):
    out = {
        "pos": _dense(sd, f"{key}.pos"),
        "conv1": _dense(sd, f"{key}.conv1"),
        "conv2": _dense(sd, f"{key}.conv2"),
    }
    for i in range(mlp_len):
        out[f"mlp_{i}"] = {"conv": _dense(sd, f"{key}.mlp.{i}.composed_module.0")}
    return out


def _multiframe_attention(sd, key):
    return {
        "bid": _bid_like(sd, f"{key}.bid", 1),
        "fe": _fe(sd, f"{key}.fe", 1),
        "cross_block": _multi_frame_block(sd, f"{key}.cross_block"),
        "downsample": _convlrelu(sd, f"{key}.downsample"),
    }


def _point_transformer(sd, key):
    return {
        "fc1": _dense(sd, f"{key}.fc1"),
        "fc2": _dense(sd, f"{key}.fc2"),
        "fc_delta1": _dense(sd, f"{key}.fc_delta.0"),
        "fc_delta2": _dense(sd, f"{key}.fc_delta.2"),
        "fc_gamma1": _dense(sd, f"{key}.fc_gamma.0"),
        "fc_gamma2": _dense(sd, f"{key}.fc_gamma.2"),
        "w_qs": {"kernel": np.asarray(sd[f"{key}.w_qs.weight"], np.float32).T},
        "w_ks": {"kernel": np.asarray(sd[f"{key}.w_ks.weight"], np.float32).T},
        "w_vs": {"kernel": np.asarray(sd[f"{key}.w_vs.weight"], np.float32).T},
    }


def convert_reference_state_dict(
    sd: Mapping[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """Convert the reference ``checkpoint['net']`` state dict.

    Args:
      sd: flat mapping of torch parameter names to arrays (tensors or numpy).
    Returns:
      (params, batch_stats) pytrees matching ``MoCoPCI(ModelConfig())``.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc = {
        "level0_lift": _convlrelu(sd, "encoder.level0_lift"),
        "level0": _pointconv(sd, "encoder.level0"),
        "level0_1": _convlrelu(sd, "encoder.level0_1"),
        "level1": _pointconv(sd, "encoder.level1"),
        "level1_0": _convlrelu(sd, "encoder.level1_0"),
        "level1_1": _convlrelu(sd, "encoder.level1_1"),
        "level2": _pointconv(sd, "encoder.level2"),
        "level2_0": _convlrelu(sd, "encoder.level2_0"),
        "level2_1": _convlrelu(sd, "encoder.level2_1"),
        "level3": _pointconv(sd, "encoder.level3"),
        "level3_0": _convlrelu(sd, "encoder.level3_0"),
        "level3_1": _convlrelu(sd, "encoder.level3_1"),
        "level4": _pointconv(sd, "encoder.level4"),
    }
    e = "multi_frame_inference"
    est = {
        "ei1": _ei(sd, f"{e}.ei1"),
        "ei2": _ei(sd, f"{e}.ei2"),
        "ei3": _ei(sd, f"{e}.ei3"),
        "deconv4_3": _convlrelu(sd, f"{e}.deconv4_3"),
        "deconv3_2": _convlrelu(sd, f"{e}.deconv3_2"),
        "deconv2_1": _convlrelu(sd, f"{e}.deconv2_1"),
        "cross3": {
            "pos1": _dense(sd, f"{e}.cross3.pos1"),
            "cross_t11": _dense(sd, f"{e}.cross3.cross_t11"),
            "cross_t22": _dense(sd, f"{e}.cross3.cross_t22"),
            "cross_t1": _dense(sd, f"{e}.cross3.cross_t1"),
            "cross_t2": _dense(sd, f"{e}.cross3.cross_t2"),
            "mlp1_0": {"conv": _dense(sd, f"{e}.cross3.mlp1.0.composed_module.0")},
        },
        "cross_block3": _cross_frame_block(sd, f"{e}.cross_block3"),
        "multi_frame_up_2": _multiframe_attention(sd, f"{e}.multi_frame_up_2"),
        "multi_frame_up_1": _multiframe_attention(sd, f"{e}.multi_frame_up_1"),
        "fusion_conv0": _dense(sd, f"{e}.conv.0"),
        "fusion_conv1": _dense(sd, f"{e}.conv.3"),
        "fusion_conv2": _dense(sd, f"{e}.conv.6"),
        "fusion_bn0": _norm(sd, f"{e}.conv.1"),
        "fusion_bn1": _norm(sd, f"{e}.conv.4"),
        "fusion_bn2": _norm(sd, f"{e}.conv.7"),
        "rlevel0": _convlrelu(sd, f"{e}.rlevel0"),
        "refine_level1": _pointconv(sd, f"{e}.level1"),
        "shape1": _point_transformer(sd, f"{e}.shape1"),
        "pred1": _dense(sd, f"{e}.pred.0"),
        "pred2": _dense(sd, f"{e}.pred.2"),
    }
    params = {"encoder": enc, "estimator": est}

    def mfb_stats(key):
        return {
            "norm1": _norm_stats(sd, f"{key}.norm1"),
            "norm2": _norm_stats(sd, f"{key}.norm2"),
        }

    batch_stats = {
        "estimator": {
            "cross_block3": {"norm1": _norm_stats(sd, f"{e}.cross_block3.norm1")},
            "multi_frame_up_2": {"cross_block": mfb_stats(f"{e}.multi_frame_up_2.cross_block")},
            "multi_frame_up_1": {"cross_block": mfb_stats(f"{e}.multi_frame_up_1.cross_block")},
            "fusion_bn0": _norm_stats(sd, f"{e}.conv.1"),
            "fusion_bn1": _norm_stats(sd, f"{e}.conv.4"),
            "fusion_bn2": _norm_stats(sd, f"{e}.conv.7"),
        }
    }
    return params, batch_stats


def load_reference_checkpoint(path: str):
    """Load a reference ``.pth`` checkpoint (requires torch, CPU map)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("net", ckpt)
    return convert_reference_state_dict({k: v.numpy() for k, v in sd.items()})


def main(argv=None):
    """CLI: ``python -m mocopci_tpu.training.convert ref.pth out_dir``.

    Converts a reference torch checkpoint into an Orbax checkpoint directory
    directly loadable by ``test.py --pretrain_model out_dir`` (and usable as a
    warm start for ``train.py --resume``).  The optimizer state is freshly
    initialised — the torch Adam moments do not transfer across frameworks.
    """
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a reference MoCoPCI .pth checkpoint to Orbax."
    )
    p.add_argument("pth", help="reference checkpoint (torch.save {'net': ...})")
    p.add_argument("out_dir", help="Orbax checkpoint directory to create")
    p.add_argument("--npoints", type=int, default=8192)
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config instead of the full model")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mocopci_tpu.config import ModelConfig, TrainConfig, tiny_model_config
    from mocopci_tpu.training.checkpoint import CheckpointManager
    from mocopci_tpu.training.loop import create_train_state

    params, batch_stats = load_reference_checkpoint(args.pth)

    model_cfg = (
        tiny_model_config(args.npoints) if args.tiny
        else ModelConfig(npoints=args.npoints)
    )
    _, state = create_train_state(model_cfg, TrainConfig(), steps_per_epoch=1)

    # structural check: the converted tree must match the model's init tree
    # (same keys, same leaf shapes) before we overwrite anything
    def check(tmpl, got, name):
        t_flat = jax.tree_util.tree_leaves_with_path(tmpl)
        g_flat = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(got)}
        t_keys = {jax.tree_util.keystr(k) for k, _ in t_flat}
        missing = t_keys - set(g_flat)
        extra = set(g_flat) - t_keys
        if missing or extra:
            raise SystemExit(
                f"{name} tree mismatch.\n  missing: {sorted(missing)[:10]}\n"
                f"  extra: {sorted(extra)[:10]}"
            )
        for k, v in t_flat:
            ks = jax.tree_util.keystr(k)
            if tuple(v.shape) != tuple(g_flat[ks].shape):
                raise SystemExit(
                    f"{name}{ks}: shape {g_flat[ks].shape} != expected {v.shape}"
                )

    check(state.params, params, "params")
    check(state.batch_stats, batch_stats, "batch_stats")

    state = state.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, batch_stats),
    )
    mgr = CheckpointManager(args.out_dir)
    mgr.save(0, state, steps_per_epoch=1)
    mgr.close()
    n = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"wrote Orbax checkpoint to {args.out_dir} ({n:,} parameters)")


if __name__ == "__main__":
    main()
