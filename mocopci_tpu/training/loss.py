"""Training loss — exact reproduction of the reference loss assembly
(``train.py:135-160``), all Chamfer:

  loss_f   = Σ_frames CD(out[j], gt[j])                      (full-res outputs)
  loss_s_* = Σ_frames 0.5·CD(warped[j], gt[j]) + 0.5·CD(reverse-warped[j], gt[j])
  loss_m_* = Σ_frames Σ_l alpha[l+1]·CD(pyramid_l[j], gt_pyr[l+1][j]),
             alpha = [1.0, 0.8, 0.4, 0.2]
  total    = loss_f + (loss_s_f + loss_s_b)/2 + 0.25·(loss_m_f + loss_m_b)

The ground-truth pyramid is FPS-downsampled per frame (ref ``downsampling``,
``mocopci.py:1099-1104`` via ``mocopci.py:1079-1085``) to the model's pyramid
sizes (== N/4, N/16, N/32 for the reference config).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mocopci_tpu import ops
from mocopci_tpu.config import ModelConfig, TrainConfig


def gt_pyramid(gt: jax.Array, cfg: ModelConfig) -> Tuple[jax.Array, ...]:
    """gt: (B, F, N, 3) -> tuple of (B, F, n_l, 3) for n_l in [N, n1, n2, n3]."""
    B, F, N, _ = gt.shape
    flat = gt.reshape(B * F, N, 3)
    out = [gt]
    for n in cfg.pyramid[:3]:
        idx = ops.farthest_point_sample(flat, n)
        out.append(ops.gather(flat, idx).reshape(B, F, n, 3))
    return tuple(out)


def mocopci_loss(
    result: Dict[str, jax.Array],
    gt: jax.Array,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Args:
      result: model output dict with ``out`` (B,F,N,3) and ``frames_f``/``frames_b``
        5-tuples of (B,F,n_l,3): [warped, reverse-warped, L1, L2, L3].
      gt: (B, F, N, 3) ground-truth intermediate frames.
    Returns:
      (total loss, dict of components).
    """
    F = gt.shape[1]
    cd = ops.chamfer_distance
    alpha = train_cfg.alpha

    loss_f = sum(cd(result["out"][:, j], gt[:, j]) for j in range(F))

    pyr = gt_pyramid(gt, model_cfg)
    frames_f, frames_b = result["frames_f"], result["frames_b"]

    loss_s_f = loss_s_b = 0.0
    loss_m_f = loss_m_b = 0.0
    for j in range(F):
        loss_s_f += train_cfg.w_straight * (
            cd(frames_f[0][:, j], pyr[0][:, j]) + cd(frames_f[1][:, j], pyr[0][:, j])
        )
        loss_s_b += train_cfg.w_straight * (
            cd(frames_b[0][:, j], pyr[0][:, j]) + cd(frames_b[1][:, j], pyr[0][:, j])
        )
        for l in range(len(alpha) - 1):
            loss_m_f += alpha[l + 1] * cd(frames_f[l + 2][:, j], pyr[l + 1][:, j])
            loss_m_b += alpha[l + 1] * cd(frames_b[l + 2][:, j], pyr[l + 1][:, j])

    total = (
        loss_f
        + (loss_s_f + loss_s_b) / 2.0
        + train_cfg.w_multi * (loss_m_f + loss_m_b)
    )
    aux = {
        "loss": total,
        "loss_f": loss_f,
        "loss_s_f": loss_s_f,
        "loss_s_b": loss_s_b,
        "loss_m_f": loss_m_f,
        "loss_m_b": loss_m_b,
    }
    return total, aux
