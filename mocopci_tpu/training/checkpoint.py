"""Orbax checkpointing.

Replaces the reference's ``torch.save({'net','optimizer','scheduler','epoch'})``
best-by-train-loss policy (``train.py:202-227``) with preemption-safe Orbax
saves of the full train state; also keeps a ``latest`` step for proper resume
(the reference's ``--resume`` has a hard-coded path, ``train.py:89-96``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from mocopci_tpu.training.loop import TrainState


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = _abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        epoch: int,
        state: TrainState,
        metrics: Optional[Dict] = None,
        steps_per_epoch: int = 0,
    ):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            # the StepLR schedule derives epoch = step // steps_per_epoch;
            # persisting it lets resume detect a changed dataset size that
            # would silently shift the LR decay boundary
            "steps_per_epoch": jax.numpy.asarray(steps_per_epoch, jax.numpy.int32),
        }
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
            ),
            metrics=metrics,
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, epoch: Optional[int] = None) -> TrainState:
        state, _ = self.restore_with_meta(state, epoch)
        return state

    def restore_with_meta(self, state: TrainState, epoch: Optional[int] = None):
        """Returns (state, saved_steps_per_epoch). 0 = not recorded."""
        import jax.numpy as jnp

        epoch = self._mgr.latest_step() if epoch is None else epoch
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "steps_per_epoch": jnp.zeros((), jnp.int32),
        }
        try:
            restored = self._mgr.restore(
                epoch,
                args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
            )["state"]
        except (ValueError, KeyError) as e:
            raise RuntimeError(
                "checkpoint restore failed with a pytree-structure mismatch. "
                "Likely cause: the checkpoint was written before the "
                "optimizer state was flattened (optax.flatten, v0.3) — "
                "optimizer momenta cannot be carried across that change; "
                "restart training, or restore params only via "
                "training.convert tooling."
            ) from e
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return state, int(restored["steps_per_epoch"])

    def close(self):
        self._mgr.close()
