"""Basic building blocks (flax.linen, channels-last).

Replaces the reference's conv/MLP primitives.  All "Conv1d/Conv2d" modules in
the reference are 1×1 convolutions, i.e. plain channel mixes — here they are
``nn.Dense`` over the last axis, which XLA maps straight to the MXU regardless
of how many leading (batch/point/neighbour) axes there are.

  - ``ConvLReLU``   ≙ ``Conv1d``/``Conv2d`` composed modules (Dense +
    LeakyReLU(0.1), no BN since ``use_bn=False`` on the live path;
    ref ``mocopci.py:1111-1127``, ``mocopci.py:695-713``).
  - ``WeightNet``   ≙ ``WeightNet`` (ref ``mocopci.py:1269-1300``): MLP
    3→8→8→W on relative coordinates, ReLU after every layer.
  - ``Mlp``         ≙ timm-style ViT MLP with GELU (ref ``mocopci.py:20-55``).
  - ``EasyMlp``     ≙ ``EasyMlp`` (ref ``mocopci.py:1568-1592``).
  - ``MlpT``        ≙ ``Mlp_T`` with its depthwise 1×1 conv
    (ref ``mocopci.py:1539-1565``); a 1×1 depthwise conv is a per-channel
    affine scale+shift.
  - ``PReLU``       ≙ ``nn.PReLU`` single shared slope, init 0.25.
  - ``DropPath``    ≙ timm stochastic depth (per-sample).
  - ``FrameBatchNorm`` ≙ ``nn.BatchNorm1d`` as (ab)used by the frame-attention
    blocks: the reference loops over batch items in Python and calls BN on one
    item's (frames, C, N) tensor at a time (``mocopci.py:505-507, 555-556``),
    so in training mode every item is normalised by its *own* (frames × points)
    statistics.  We reproduce that exactly (vectorised, no Python loop) and
    keep EMA running stats for eval.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LEAKY_RATE = 0.1

# Mixed-precision compute dtype for the activation-heavy paths (attention,
# grouped MLPs, fusion head).  Parameters, optimizer state, geometry (xyz,
# flows, distances, kNN) and every xyz-emitting projection stay float32;
# setting bfloat16 halves HBM traffic on the fat intermediate tensors the
# profile names as the bottleneck (docs/DESIGN.md §3).  Read at trace time —
# set it before jit-tracing model functions (same pattern as ops.set_knn_mode).
_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    """dtype: 'float32' | 'bfloat16' (or the jnp dtypes)."""
    global _COMPUTE_DTYPE
    d = jnp.dtype(dtype)
    assert d in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)), d
    _COMPUTE_DTYPE = jnp.float32 if d == jnp.dtype(jnp.float32) else jnp.bfloat16


def compute_dtype():
    return _COMPUTE_DTYPE


class PReLU(nn.Module):
    """Single-parameter PReLU, torch default init 0.25."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k: jnp.asarray(0.25, jnp.float32))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class ConvLReLU(nn.Module):
    """Dense + LeakyReLU(0.1): the reference's composed Conv1d/Conv2d module."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=compute_dtype(), name="conv")(x)
        return nn.leaky_relu(x, LEAKY_RATE)


class WeightNet(nn.Module):
    """MLP on grouped relative xyz: (..., 3) -> (..., out). ReLU after each layer."""

    out_channel: int
    hidden: Sequence[int] = (8, 8)

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = nn.relu(nn.Dense(h, dtype=compute_dtype(), name=f"conv{i}")(x))
        return nn.relu(
            nn.Dense(self.out_channel, dtype=compute_dtype(), name="conv_out")(x)
        )


class Mlp(nn.Module):
    """ViT MLP (GELU), used by the EI extractor FFN (ref ``mocopci.py:20-55``)."""

    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=compute_dtype(), name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=compute_dtype(), name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


_TRUNC02 = nn.initializers.truncated_normal(stddev=0.02)


class EasyMlp(nn.Module):
    """Dense→PReLU→drop→Dense→drop (ref ``mocopci.py:1568-1592``)."""

    hidden: int
    out: int
    drop: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, kernel_init=_TRUNC02, dtype=compute_dtype(),
                     name="fc1")(x)
        x = PReLU(name="act")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, kernel_init=_TRUNC02, dtype=compute_dtype(),
                     name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class MlpT(nn.Module):
    """Mlp_T: Dense→depthwise-1×1→PReLU→drop→Dense→drop (ref ``mocopci.py:1539-1565``).

    The depthwise Conv1d has kernel size 1 and groups=dim, i.e. an elementwise
    per-channel scale and shift.
    """

    hidden: int
    out: int
    drop: float = 0.05

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, kernel_init=_TRUNC02, dtype=compute_dtype(),
                     name="fc1")(x)
        w = self.param("dw_scale", nn.initializers.ones, (self.hidden,))
        b = self.param("dw_bias", nn.initializers.zeros, (self.hidden,))
        x = x * w.astype(x.dtype) + b.astype(x.dtype)
        x = PReLU(name="act")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, kernel_init=_TRUNC02, dtype=compute_dtype(),
                     name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth over the leading ``sample_ndim`` axes.

    The reference applies timm DropPath inside a per-batch-item Python loop on
    (frames, N, C) tensors, so the sample axis is the frame axis; batched here
    that means masking over (batch, frames) jointly (``sample_ndim=2``).
    """

    rate: float
    sample_ndim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = x.shape[: self.sample_ndim] + (1,) * (x.ndim - self.sample_ndim)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class FrameBatchNorm(nn.Module):
    """BatchNorm over all-but-(leading, channel) axes, computed per batch item.

    Matches the reference's BatchNorm1d invoked once per batch item inside a
    Python loop (``mocopci.py:505-507, 555-562``): in train mode each item is
    normalised by its own statistics over (frames × points); running stats are
    EMA-updated (momentum 0.1, unbiased variance) for eval, averaging the
    per-item stats of the step.

    Input: (B, ..., C); statistics over all axes except 0 and -1.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, grouped_cf: bool = False,
                 ema_stats=None):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # BN statistics need f32 accumulation
        C = x.shape[2] if grouped_cf else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))

        if ema_stats is not None:
            # EMA-update-only mode for externally computed batch statistics
            # (the fused train-path fusion-head kernel computes them on
            # device): x is (F, C) per-group means (also the return value),
            # ema_stats = (mean (F, C), biased_var (F, C), n_elements).
            mean_g, var_g, n = ema_stats
            if not self.is_initializing():
                unbiased = var_g * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (
                    (1 - m) * ra_mean.value + m * jnp.mean(mean_g, axis=0)
                )
                ra_var.value = (
                    (1 - m) * ra_var.value + m * jnp.mean(unbiased, axis=0)
                )
            return x.astype(in_dtype)

        if grouped_cf:
            # Channels-FIRST twin for (G, B, C, P) planes: identical
            # statistics semantics (per leading group item, over (B, P) per
            # channel, same EMA updates) on the transposed lane-dense layout
            # the fusion head's train path uses — a (…, C)-minor layout puts
            # C=64 on lanes at half occupancy; (C, P) planes keep the huge
            # pair axis lane-dense.
            G, B, _, P = x.shape
            if train:
                mean = jnp.mean(x, axis=(1, 3))                # (G, C)
                var = jnp.mean((x - mean[:, None, :, None]) ** 2, axis=(1, 3))
                xn = (x - mean[:, None, :, None]) * jax.lax.rsqrt(
                    var[:, None, :, None] + self.eps
                )
                if not self.is_initializing():
                    n = B * P
                    unbiased = var * (n / max(n - 1, 1))
                    m = self.momentum
                    ra_mean.value = (
                        (1 - m) * ra_mean.value + m * jnp.mean(mean, axis=0)
                    )
                    ra_var.value = (
                        (1 - m) * ra_var.value + m * jnp.mean(unbiased, axis=0)
                    )
            else:
                xn = (x - ra_mean.value[:, None]) * jax.lax.rsqrt(
                    ra_var.value[:, None] + self.eps
                )
            return (xn * scale[:, None] + bias[:, None]).astype(in_dtype)

        if train:
            axes = tuple(range(1, x.ndim - 1))
            mean = jnp.mean(x, axis=axes)            # (B, C)
            var = jnp.mean(
                (x - mean.reshape((x.shape[0],) + (1,) * len(axes) + (C,))) ** 2,
                axis=axes,
            )
            bshape = (x.shape[0],) + (1,) * len(axes) + (C,)
            xn = (x - mean.reshape(bshape)) * jax.lax.rsqrt(var.reshape(bshape) + self.eps)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * jnp.mean(mean, axis=0)
                ra_var.value = (1 - m) * ra_var.value + m * jnp.mean(unbiased, axis=0)
        else:
            xn = (x - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.eps)
        return (xn * scale + bias).astype(in_dtype)


class BatchNorm(nn.Module):
    """Plain cross-batch BatchNorm over all-but-last axes (fusion head conv,
    ref ``mocopci.py:749-755``, eps=0.001)."""

    momentum: float = 0.1
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # BN statistics need f32 accumulation
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean((x - mean) ** 2, axis=axes)
            xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            xn = (x - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.eps)
        return (xn * scale + bias).astype(in_dtype)
