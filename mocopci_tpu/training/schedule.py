"""Learning-rate schedule: clipped StepLR.

Reference recipe (``train.py:58, 95-99, 106-110, 194``): AdamW base lr 1e-3,
StepLR(step_size=15 epochs, gamma=0.8), clamped below at 5e-5 — i.e.
``lr(epoch) = max(lr0 · 0.8^(epoch // 15), 5e-5)``.
"""
from __future__ import annotations

import jax.numpy as jnp

from mocopci_tpu.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Step-indexed schedule implementing the reference's epoch-level StepLR."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        lr = cfg.lr * jnp.power(cfg.lr_gamma, epoch // cfg.lr_step)
        return jnp.maximum(lr, cfg.lr_clip)

    return schedule
