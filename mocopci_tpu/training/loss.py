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
    """gt: (B, F, N, 3) -> tuple of (B, F, n_l, 3) for n_l in [N, n1, n2, n3].

    Greedy FPS is prefix-consistent — step i depends only on steps < i, so
    the first m picks of an n-point run ARE the m-point run.  All levels
    sample from the full-resolution cloud here, so ONE kernel launch at the
    largest level and index-prefix slices replace the three separate FPS
    launches (identical up to FPS tie-breaking on degenerate clouds: the
    max-npoint launch can engage the split layout, whose documented mod-128
    argmax tie-break can deviate from the plain layout on exactly-tied
    distances, e.g. duplicated points; the B=2 train trace spent 15 ms on the
    three-launch version's kernels + gathers)."""
    B, F, N, _ = gt.shape
    flat = gt.reshape(B * F, N, 3)
    idx = ops.farthest_point_sample(flat, max(cfg.pyramid[:3]))
    out = [gt]
    for n in cfg.pyramid[:3]:
        out.append(ops.gather(flat, idx[:, :n]).reshape(B, F, n, 3))
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
    B, F = gt.shape[:2]
    alpha = train_cfg.alpha

    pyr = gt_pyramid(gt, model_cfg)
    frames_f, frames_b = result["frames_f"], result["frames_b"]

    def fold(x):  # (B, F, n, 3) -> (B·F, n, 3)
        return x.reshape(B * F, x.shape[2], 3)

    # The reference sums per-frame batch-mean CDs; with equal-sized means,
    # Σ_j mean_B(·) = F · mean_{B·F}(·), so every per-frame python-loop call
    # folds into the batch axis, and all pairs of one cloud size share ONE
    # batched 1-NN launch (ops.chamfer_many) — 4 launches/step instead of 66.
    gt0 = fold(pyr[0])
    cd8k = ops.chamfer_many(
        [
            (fold(result["out"]), gt0),
            (fold(frames_f[0]), gt0),
            (fold(frames_f[1]), gt0),
            (fold(frames_b[0]), gt0),
            (fold(frames_b[1]), gt0),
        ]
    ) * F
    loss_f = cd8k[0]
    loss_s_f = train_cfg.w_straight * (cd8k[1] + cd8k[2])
    loss_s_b = train_cfg.w_straight * (cd8k[3] + cd8k[4])

    loss_m_f = loss_m_b = 0.0
    for l in range(len(alpha) - 1):
        cdl = ops.chamfer_many(
            [
                (fold(frames_f[l + 2]), fold(pyr[l + 1])),
                (fold(frames_b[l + 2]), fold(pyr[l + 1])),
            ]
        ) * F
        loss_m_f += alpha[l + 1] * cdl[0]
        loss_m_b += alpha[l + 1] * cdl[1]

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
