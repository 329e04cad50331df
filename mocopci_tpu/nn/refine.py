"""Occlusion-gated flow refiner.

Equivalent of the reference ``FlowRefineNet`` (``models/pointT_layer2.py:79-120``)
— constructed by the reference estimator (``mocopci.py:771``) but never called
on the live path; provided so the refinement stage can be re-enabled.

The reference's kernel-size-3 Conv1d layers convolve along the *point* axis
(an ordering-sensitive operation on an unordered set — we reproduce it
faithfully as a 1-D convolution over the point dimension).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FlowRefineNet(nn.Module):
    context_dim: int
    corr_dim: int
    c: int = 24
    iters: int = 1

    @nn.compact
    def __call__(self, fea0, fea1, cost, flow):
        """All inputs channels-last: fea* (B,N,ctx), cost (B,N,corr), flow (B,N,3)."""
        hidden = self.c

        def occl_gate(f0, f1):
            h = jnp.concatenate([f0, f1], axis=-1)
            h = nn.leaky_relu(nn.Dense(hidden, name="occl0")(h), 0.1)
            h = nn.leaky_relu(nn.Dense(hidden, name="occl1")(h), 0.1)
            return nn.sigmoid(nn.Dense(1, name="occl2")(h))

        motion_conv = nn.Conv(self.c, (3,), padding="SAME", name="motion")
        head0 = nn.Conv(hidden, (3,), padding="SAME", name="head0")
        head1 = nn.Conv(3, (3,), padding="SAME", name="head1")

        for _ in range(self.iters):
            occl = occl_gate(fea0, fea1)
            fea = fea0 * occl + fea1 * (1.0 - occl)
            motion = nn.leaky_relu(
                motion_conv(jnp.concatenate([cost, flow], axis=-1)), 0.1
            )
            inp = jnp.concatenate([fea, motion, flow], axis=-1)
            delta = head1(nn.leaky_relu(head0(inp), 0.1))
            flow = flow + delta
        return flow
