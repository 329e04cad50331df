"""Attention modules (flax, channels-last).

  - ``CrossAttention`` / ``Injector`` / ``Extractor`` / ``EICrossformer``
    ≙ the extrapolation+injection fusion (ref ``mocopci.py:58-151``).
  - ``CrossFrameBlock`` ≙ ``Cross_Frame_Att`` + ``CrossFrameAttentionInterpretation``
    (ref ``mocopci.py:475-522, 581-624``): the heads-as-frames one-shot frame
    synthesis at L3 — 4 attention heads of *full* dim whose outputs, summed
    over the two input frames, become 4 candidate frames; head 0 is dropped.
  - ``MultiFrameBlock`` ≙ ``Multi_Frame_Att`` + ``InterFrameAttentionInterpretation``
    (ref ``mocopci.py:525-575, 627-667``): per time-token attention against the
    time-reversed token sequence, residual + Mlp_T, projection to latent flow
    features + per-point 3D offsets; first/last tokens dropped.

The reference loops over batch items in Python (``mocopci.py:505, 555``),
serialising on GPU; here everything is a single batched einsum program — the
per-item BatchNorm semantics are preserved by ``FrameBatchNorm``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mocopci_tpu.nn.basic import (
    _TRUNC02,
    DropPath,
    EasyMlp,
    FrameBatchNorm,
    Mlp,
    MlpT,
    compute_dtype,
)


# Above this many attention entries per (batch, frame, head), the time-token
# attention switches to blockwise evaluation over query chunks (the dense
# matrix at the 32k stress config is 5·8·8192² fp32 ≈ 13 GB — more than HBM).
_DENSE_ATTN_LIMIT = 8 * 1024 * 1024


def _sdpa_train(q, k, v, scale, rate, seed):
    """Training-path attention with dropout on the softmax matrix.

    Flash-style Pallas forward + custom-VJP backward with the dropout mask
    regenerated in-kernel (ops/pallas/attention_train.py) — the dense program
    materializes the (B, F, H, N, M) logits, mask, and their backward in HBM.
    Layout matches ``_fused_sdpa``: (..., N, H, D).  The mask stream is a
    counter hash, statistically identical to flax Dropout but not bit-equal.
    """
    from mocopci_tpu.ops.pallas.attention_train import attention_train

    lead = q.shape[:-3]
    N, H, D = q.shape[-3:]
    M = k.shape[-3]

    def to_g(x, L):
        x = jnp.moveaxis(x, -2, -3)                    # (..., H, L, D)
        return x.reshape((-1, L, D))

    out = attention_train(
        to_g(q, N).astype(jnp.float32),
        to_g(k, M).astype(jnp.float32),
        to_g(v, M).astype(jnp.float32),
        seed, scale, rate,
    )
    out = out.reshape(lead + (H, N, D))
    return jnp.moveaxis(out, -3, -2)                   # (..., N, H, D)


def _dropout_seed(module, rate):
    """int32 seed for the in-kernel dropout stream (0 when unused)."""
    if rate <= 0.0:
        return jnp.zeros((), jnp.int32)
    return jax.random.randint(
        module.make_rng("dropout"), (), -(2 ** 31), 2 ** 31 - 1, jnp.int32
    )


def _use_fused_train_attention(m: int) -> bool:
    """Trace-time dispatch: the custom-VJP kernel needs a TPU backend."""
    from mocopci_tpu.ops.pallas.attention import MAX_SEQ

    return jax.default_backend() == "tpu" and m <= MAX_SEQ


def _fused_sdpa(q, k, v, scale):
    """Deterministic softmax attention, (..., N, H, D) layout.

    On TPU dispatches to the Pallas kernel with VMEM-resident logits tiles
    (the dense program materializes the (..., H, N, M) logits in HBM three
    times over — 671 MB at L1); elsewhere the dense einsum.  Numerics match
    the dense path (f32 MXU accumulation, f32 softmax).
    """
    from mocopci_tpu.ops.pallas.attention import fused_attention_pallas

    lead = q.shape[:-3]
    N, H, D = q.shape[-3:]
    M = k.shape[-3]

    def to_g(x, L):
        x = jnp.moveaxis(x, -2, -3)                    # (..., H, L, D)
        return x.reshape((-1, L, D))

    def tpu(q, k, v):
        out = fused_attention_pallas(to_g(q, N), to_g(k, M), to_g(v, M), scale)
        out = out.reshape(lead + (H, N, D))
        return jnp.moveaxis(out, -3, -2)               # (..., N, H, D)

    def default(q, k, v):
        attn = jax.nn.softmax(
            jnp.einsum("...nhd,...mhd->...hnm", q, k,
                       preferred_element_type=jnp.float32) * scale, axis=-1)
        return jnp.einsum("...hnm,...mhd->...nhd", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    return jax.lax.platform_dependent(q, k, v, tpu=tpu, default=default)


def _chunked_mha(q, k, v, scale):
    """Memory-bounded exact attention via lax.map over query chunks.

    q: (B, F, N, H, D); k, v: (B, F, M, H, D) -> (B, F, N, H, D).
    Used on the deterministic (eval) path at stress sizes; the dense path is
    kept for training (attention dropout needs the full matrix) and for
    reference-scale shapes where it is faster.
    """
    B, F, N, H, D = q.shape
    M = k.shape[2]
    chunk = max(_DENSE_ATTN_LIMIT // M, 128)
    if N <= chunk:
        attn = jax.nn.softmax(
            jnp.einsum("bfnhd,bfmhd->bfhnm", q, k,
                       preferred_element_type=jnp.float32) * scale, axis=-1
        )
        return jnp.einsum("bfhnm,bfmhd->bfnhd", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
    nb = -(-N // chunk)
    pad = nb * chunk - N
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    qc = qp.reshape(B, F, nb, chunk, H, D).transpose(2, 0, 1, 3, 4, 5)

    def one(qb):  # (B, F, chunk, H, D)
        attn = jax.nn.softmax(
            jnp.einsum("bfnhd,bfmhd->bfhnm", qb, k,
                       preferred_element_type=jnp.float32) * scale, axis=-1
        )
        return jnp.einsum("bfhnm,bfmhd->bfnhd", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(one, qc)                       # (nb, B, F, chunk, H, D)
    out = out.transpose(1, 2, 0, 3, 4, 5).reshape(B, F, nb * chunk, H, D)
    return out[:, :, :N]


def _chunked_mha_dropout(q, k, v, scale, rate, key):
    """Memory-bounded TRAIN attention: query chunks + per-chunk dropout.

    Same blockwise structure as ``_chunked_mha`` but with the softmax-matrix
    dropout applied inside each chunk from a key folded with the chunk index —
    statistically identical to flax ``nn.Dropout`` on the dense matrix, not
    bit-equal (same caveat as the Pallas train kernel's counter hash).  This
    is what makes stress-size (M > MAX_SEQ) *training* fit in HBM: the dense
    path materializes a (B, F, H, N, M) f32 matrix (10.7 GB at the 32k
    config's L1) three times over in the fwd+bwd program.
    """
    B, F, N, H, D = q.shape
    M = k.shape[2]
    chunk = max(_DENSE_ATTN_LIMIT // M, 128)
    keep = 1.0 - rate

    # jax.checkpoint: without it, autodiff of the lax.map saves each chunk's
    # (B, F, H, chunk, M) softmax matrix as a scan residual — re-materializing
    # the full dense matrix across chunks in the backward.  Recomputing the
    # chunk attention from (qb, k, v, key) is the point of this path.
    @jax.checkpoint
    def attend(qb, kb):  # (B, F, chunk, H, D), key
        attn = jax.nn.softmax(
            jnp.einsum("bfnhd,bfmhd->bfhnm", qb, k,
                       preferred_element_type=jnp.float32) * scale, axis=-1
        )
        if rate > 0.0:
            mask = jax.random.bernoulli(kb, keep, attn.shape)
            attn = jnp.where(mask, attn / keep, 0.0)
        return jnp.einsum("bfhnm,bfmhd->bfnhd", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    if N <= chunk:
        return attend(q, key)
    nb = -(-N // chunk)
    pad = nb * chunk - N
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    qc = qp.reshape(B, F, nb, chunk, H, D).transpose(2, 0, 1, 3, 4, 5)
    keys = jax.random.split(key, nb)
    out = jax.lax.map(lambda t: attend(*t), (qc, keys))
    out = out.transpose(1, 2, 0, 3, 4, 5).reshape(B, F, nb * chunk, H, D)
    return out[:, :, :N]


class CrossAttention(nn.Module):
    """Standard multi-head cross attention (ref ``mocopci.py:58-86``)."""

    dim: int
    num_heads: int = 8
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, c, deterministic: bool = True):
        # x (queries) and c (context) may have different point counts — the
        # point-sharded forward passes a local query shard with the full
        # gathered context (parallel/sp_forward.py).
        B, N, C = x.shape
        M = c.shape[1]
        H = self.num_heads
        hd = C // H
        kv = nn.Dense(2 * C, use_bias=False, dtype=compute_dtype(), name="kv")(c)
        q = nn.Dense(C, use_bias=False, dtype=compute_dtype(), name="q")(x)
        k, v = jnp.split(kv.reshape(B, M, 2, H, hd), 2, axis=2)
        k = k.squeeze(2)
        v = v.squeeze(2)
        q = q.reshape(B, N, H, hd)
        from mocopci_tpu.ops.pallas.attention import MAX_SEQ

        if deterministic and M <= MAX_SEQ:
            out = _fused_sdpa(q, k, v, hd ** -0.5).reshape(B, N, C)
        elif _use_fused_train_attention(M):
            out = _sdpa_train(
                q, k, v, hd ** -0.5, self.drop, _dropout_seed(self, self.drop)
            ).reshape(B, N, C)
        elif not deterministic and N * M > _DENSE_ATTN_LIMIT:
            out = _chunked_mha_dropout(
                q[:, None], k[:, None], v[:, None], hd ** -0.5, self.drop,
                self.make_rng("dropout"),
            )[:, 0].reshape(B, N, C)
        else:
            # logits accumulate in f32; softmax in f32; dropout needs the matrix
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * (hd ** -0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.drop, deterministic=deterministic)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32).reshape(B, N, C)
        out = nn.Dense(C, dtype=compute_dtype(), name="proj")(out)
        return nn.Dropout(self.drop, deterministic=deterministic)(out)


class Injector(nn.Module):
    """LayerNorm'd cross-attn scaled by learnable gamma, init 0 (ref ``mocopci.py:119-138``)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, query, feat, deterministic: bool = True):
        qn = nn.LayerNorm(epsilon=1e-6, name="query_norm")(query)
        fn = nn.LayerNorm(epsilon=1e-6, name="feat_norm")(feat)
        attn = CrossAttention(self.dim, self.num_heads, name="attn")(
            qn, fn, deterministic
        )
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        return gamma * attn.astype(jnp.float32)


class Extractor(nn.Module):
    """Cross-attn + ConvFFN; returns the FFN output only (ref ``mocopci.py:89-116``:
    the final assignment overwrites ``query`` with the ffn output)."""

    dim: int
    num_heads: int = 8
    cffn_ratio: float = 0.25

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        qn = nn.LayerNorm(epsilon=1e-6, name="query_norm")(x1)
        fn = nn.LayerNorm(epsilon=1e-6, name="feat_norm")(x2)
        attn = CrossAttention(self.dim, self.num_heads, name="attn")(
            qn, fn, deterministic
        )
        query = x1 + attn
        h = nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(query)
        return Mlp(int(self.dim * self.cffn_ratio), self.dim, name="ffn")(
            h, deterministic
        )


class EICrossformer(nn.Module):
    """Extrapolation+injection fusion producing one shared feature
    (ref ``mocopci.py:140-151``). Input/output (B, N, C)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True,
                 x1_full=None, x2_full=None):
        # x1_full/x2_full: all-gathered full-point contexts for the
        # point-sharded forward (x1/x2 are then local query shards); default
        # to x1/x2 for the unsharded path.
        res1 = Injector(self.dim, self.num_heads, name="injector")(
            x1, x2 if x2_full is None else x2_full, deterministic
        )
        res2 = Extractor(self.dim, self.num_heads, name="extractor")(
            x2, x1 if x1_full is None else x1_full, deterministic
        )
        cat = jnp.concatenate([res1.astype(compute_dtype()),
                               res2.astype(compute_dtype())], axis=-1)
        return nn.Dense(self.dim, use_bias=False, dtype=compute_dtype(),
                        name="pj")(cat)


class CrossFrameBlock(nn.Module):
    """L3 one-shot frame synthesis (ref ``Cross_Frame_Att``, ``mocopci.py:475-522``).

    Input: xs (B, F=2, N, C) — the two frames' cost-volume features.
    Output: feats (B, F_out=3, N, C), frames (B, 3, N, 3).
    """

    dim: int
    num_heads: int = 4
    mlp_ratio: float = 4.0
    drop: float = 0.05
    attn_drop: float = 0.05

    @nn.compact
    def __call__(self, xs, train: bool = False, deterministic: bool = True,
                 xs_kv=None):
        # xs_kv: all-gathered full-point tokens for the point-sharded forward
        # (xs is then a local query shard).  Eval-only there — the train-mode
        # FrameBatchNorm statistics and attention dropout are not SP-aware.
        assert xs_kv is None or (deterministic and not train)
        B, F, N, C = xs.shape
        H = self.num_heads
        norm1 = FrameBatchNorm(name="norm1")
        x = norm1(xs, train)
        x_rev = jnp.flip(norm1(xs_kv, train) if xs_kv is not None else x, axis=1)
        M = x_rev.shape[2]
        # full-dim heads: q -> (B, F, H, N, C), scale = C^-0.5 (mocopci.py:589-590)
        q = nn.Dense(C * H, use_bias=True, kernel_init=_TRUNC02,
                     dtype=compute_dtype(), name="attn_q")(x)
        kv = nn.Dense(C * 2 * H, use_bias=True, kernel_init=_TRUNC02,
                      dtype=compute_dtype(), name="attn_kv")(x_rev)
        q = q.reshape(B, F, N, H, C)
        k, v = jnp.split(kv.reshape(B, F, M, 2, H, C), 2, axis=3)
        k = k.squeeze(3)
        v = v.squeeze(3)
        from mocopci_tpu.ops.pallas.attention import MAX_SEQ

        if deterministic and M <= MAX_SEQ:
            out = _fused_sdpa(q, k, v, C ** -0.5)       # (B, F, N, H, C)
            out = jnp.sum(out, axis=1).transpose(0, 2, 1, 3)  # (B, H, N, C)
        elif not deterministic and _use_fused_train_attention(N):
            out = _sdpa_train(
                q, k, v, C ** -0.5, self.attn_drop,
                _dropout_seed(self, self.attn_drop),
            )                                           # (B, F, N, H, C)
            out = jnp.sum(out, axis=1).transpose(0, 2, 1, 3)  # (B, H, N, C)
        else:
            attn = jnp.einsum("bfnhc,bfmhc->bfhnm", q, k,
                              preferred_element_type=jnp.float32) * (C ** -0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            out = jnp.einsum("bfhnm,bfmhc->bfhnc", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            # heads-as-frames: sum the two frames' outputs (mocopci.py:621)
            out = jnp.sum(out, axis=1)                  # (B, H, N, C)
        out = nn.Dense(C, kernel_init=_TRUNC02, dtype=compute_dtype(),
                       name="attn_proj")(out)
        out = nn.Dropout(self.drop, deterministic=deterministic)(out)
        feats = EasyMlp(int(C * self.mlp_ratio), C, self.drop, name="trans_block_2")(
            out, deterministic
        )
        # xyz-emitting projection stays f32 (coordinate precision)
        frames = nn.Dense(3, kernel_init=_TRUNC02, name="mapping_xyz")(
            feats.astype(jnp.float32))
        # drop candidate frame 0 (mocopci.py:520-521)
        return feats[:, 1:], frames[:, 1:]


class MultiFrameBlock(nn.Module):
    """L2/L1 time-token decoder stage (ref ``Multi_Frame_Att``, ``mocopci.py:525-575``).

    Input: xs (B, F=5, N, C) — [feat1, fe_t1, fe_t2, fe_t3, feat2] time tokens
    with the sinusoidal time embedding already added.
    Output: feats (B, 3, N, latent), frames (B, 3, N, 3) for the middle tokens.
    """

    dim: int
    latent: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    drop: float = 0.05
    attn_drop: float = 0.05
    drop_path: float = 0.04

    @nn.compact
    def __call__(self, xs, train: bool = False, deterministic: bool = True,
                 xs_kv=None):
        # xs_kv: all-gathered full-point tokens for the point-sharded eval
        # forward (query shard = point shard); see CrossFrameBlock.
        assert xs_kv is None or (deterministic and not train)
        B, F, N, C = xs.shape
        H = self.num_heads
        hd = C // H
        norm1 = FrameBatchNorm(name="norm1")
        x_norm = norm1(xs, train)
        x_rev = jnp.flip(norm1(xs_kv, train) if xs_kv is not None else x_norm,
                         axis=1)
        M = x_rev.shape[2]
        q = nn.Dense(C, use_bias=True, kernel_init=_TRUNC02,
                     dtype=compute_dtype(), name="attn_q")(x_norm)
        kv = nn.Dense(2 * C, use_bias=True, kernel_init=_TRUNC02,
                      dtype=compute_dtype(), name="attn_kv")(x_rev)
        q = q.reshape(B, F, N, H, hd)
        k, v = jnp.split(kv.reshape(B, F, M, 2, H, hd), 2, axis=3)
        k = k.squeeze(3)
        v = v.squeeze(3)
        from mocopci_tpu.ops.pallas.attention import MAX_SEQ

        if deterministic and M <= MAX_SEQ:
            out = _fused_sdpa(q, k, v, hd ** -0.5).reshape(B, F, N, C)
        elif deterministic and N * M > _DENSE_ATTN_LIMIT:
            out = _chunked_mha(q, k, v, hd ** -0.5).reshape(B, F, N, C)
        elif not deterministic and _use_fused_train_attention(N):
            out = _sdpa_train(
                q, k, v, hd ** -0.5, self.attn_drop,
                _dropout_seed(self, self.attn_drop),
            ).reshape(B, F, N, C)
        elif not deterministic and N * M > _DENSE_ATTN_LIMIT:
            # stress-size training off-TPU or beyond the kernel's MAX_SEQ:
            # blockwise with per-chunk dropout — the dense matrix would be
            # 10.7 GB at the 32k config's L1
            out = _chunked_mha_dropout(
                q, k, v, hd ** -0.5, self.attn_drop,
                self.make_rng("dropout"),
            ).reshape(B, F, N, C)
        else:
            attn = jnp.einsum("bfnhd,bfmhd->bfhnm", q, k,
                              preferred_element_type=jnp.float32) * (hd ** -0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            out = jnp.einsum("bfhnm,bfmhd->bfnhd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32).reshape(B, F, N, C)
        out = nn.Dense(C, kernel_init=_TRUNC02, dtype=compute_dtype(),
                       name="attn_proj")(out)
        out = nn.Dropout(self.drop, deterministic=deterministic)(out)

        dp = DropPath(self.drop_path, sample_ndim=2, name="drop_path")
        x_norm = x_norm + dp(out, deterministic)
        x_back = FrameBatchNorm(name="norm2")(x_norm, train)
        x_back = dp(
            MlpT(int(C * self.mlp_ratio), C, self.drop, name="mlp")(
                x_back, deterministic
            ),
            deterministic,
        )
        x = xs + x_back                                  # residual on raw input
        x_f = MlpT(int(C * self.mlp_ratio), self.latent, self.drop, name="trans_block")(
            x, deterministic
        )
        # xyz-emitting projection stays f32 (coordinate precision)
        frames = nn.Dense(3, kernel_init=_TRUNC02, name="mapping_xyz")(
            x_f.astype(jnp.float32))
        # drop the first/last (input-frame) tokens (mocopci.py:573-574)
        return x_f[:, 1:-1], frames[:, 1:-1]
