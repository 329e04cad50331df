"""MoCoPCI — one-shot multi-frame LiDAR point-cloud interpolation, TPU-native.

Re-architecture of the reference model (``models/m_models/mocopci.py``):
  - ``PointConvEncoder``     ≙ ref ``mocopci.py:415-468``
  - ``MultiframeAttention``  ≙ ref ``Multiframe_Attention``, ``mocopci.py:154-212``
  - ``MultiFrameEstimator``  ≙ ref ``MultiFrameEstimatier``, ``mocopci.py:741-1059``
  - ``MoCoPCI``              ≙ ref ``mocopci.py:1062-1097``

Everything is channels-last (B, N, C), static-shaped, and a single XLA program
per step — no host round trips (the reference rebuilds its sinusoidal time
embedding on CPU every forward, ``mocopci.py:172-206``; here it is a traced
constant since the timestamps are hard-coded, ``mocopci.py:824-825``).

Deliberately omitted dead weight from the reference (documented for checkpoint
conversion, SURVEY.md §1): ``recurrent0``, ``rf_block0``, ``fusion_gru``
(constructed, never called), ``deconv1_0`` (never used), the third cost-volume
pass of ``cross3`` (output bound to an unused name, ``mocopci.py:851``), and
the per-level upsampled-feature lists (``up_feat*_lst``) whose values are
overwritten before use (``mocopci.py:1019-1026``).
"""
from __future__ import annotations

import math
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mocopci_tpu import ops
from mocopci_tpu.config import ModelConfig
from mocopci_tpu.nn.attention import CrossFrameBlock, EICrossformer, MultiFrameBlock
from mocopci_tpu.nn.basic import ConvLReLU, FrameBatchNorm, compute_dtype
from mocopci_tpu.nn.cross import (
    BidirectionalLayerFeatCosine,
    CrossLayerFeatCosine,
    FlowEmbeddingLayer,
)
from mocopci_tpu.nn.pointconv import PointConv, PointConvD
from mocopci_tpu.nn.transformer import PointTransformerBlock


def time_embedding(ts: Sequence[float], dim: int) -> jnp.ndarray:
    """Sinusoidal time embedding table, (len(ts), dim).

    Bit-for-bit the reference's CPU loop (``mocopci.py:172-180``):
    ``enc[i, j]   = sin(t_i · 10000^(−j/dim))`` for even j,
    ``enc[i, j+1] = cos(t_i · 10000^(−(j+1)/dim))``.
    Computed once at trace time — a compile-time constant.
    """
    enc = np.zeros((len(ts), dim), np.float32)
    for i, t in enumerate(ts):
        for j in range(0, dim, 2):
            enc[i, j] = math.sin(t * math.pow(10000, -j / dim))
            if j + 1 < dim:
                enc[i, j + 1] = math.cos(t * math.pow(10000, -(j + 1) / dim))
    return jnp.asarray(enc)


def area_resize_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """Fixed matrix A (n_out, n_in) with A @ x == F.interpolate(x, n_out, mode="area").

    The reference abuses adaptive average pooling to lift each 3-vector flow to
    a feature-width vector (``mocopci.py:1021-1023``); with static sizes this
    is just a constant matmul.
    """
    A = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)  # ceil
        A[i, start:end] = 1.0 / (end - start)
    return jnp.asarray(A)


def _rev_frames(x: jax.Array) -> jax.Array:
    """Reverse the frame axis (axis 1) via an explicit gather.

    Semantically jnp.flip(x, axis=1); expressed as a gather because the
    XLA:TPU fusion emitter miscompiles (checks-fails on pad_low == -2) when the
    gradient of rev fuses with the loss-side slice gradients at batch >= 2.
    """
    idx = jnp.arange(x.shape[1] - 1, -1, -1)
    return jnp.take(x, idx, axis=1)


def _upsample_feats_and_frames(dense_xyz, sparse_xyz, feats, frames):
    """One shared-geometry upsample for feature fields + per-frame flows.

    Args:
      feats: tuple of (B, S, C_i) feature fields (possibly empty).
      frames: (B, F, S, 3) per-frame flow fields.
    Returns:
      (tuple of upsampled feats (B, N, C_i), upsampled frames (B, F, N, 3)).
    """
    B, F, S, _ = frames.shape
    flows_cat = frames.transpose(0, 2, 1, 3).reshape(B, S, F * 3)
    res = ops.upsample_multi(dense_xyz, sparse_xyz, list(feats) + [flows_cat])
    up = res[-1].reshape(B, dense_xyz.shape[1], F, 3).transpose(0, 2, 1, 3)
    return tuple(res[:-1]), up


def _upsample_feat_and_frames(dense_xyz, sparse_xyz, feat, frames):
    feats = () if feat is None else (feat,)
    ups, up_frames = _upsample_feats_and_frames(dense_xyz, sparse_xyz, feats, frames)
    return (ups[0] if feat is not None else None), up_frames


class PointConvEncoder(nn.Module):
    """Shared 5-level PointConv feature pyramid (ref ``mocopci.py:415-468``).

    setup-style so the point-sharded forward can drive the per-level modules
    individually (parallel/sp_forward.py).
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        c0, c1, c2, c3, c4 = cfg.enc_channels
        n1, n2, n3, n4 = cfg.pyramid
        k = cfg.feat_nei
        w = cfg.weightnet
        self.level0_lift = ConvLReLU(c0, name="level0_lift")
        self.level0 = PointConv(k, c0, w, name="level0")
        self.level0_1 = ConvLReLU(c1, name="level0_1")
        self.level1 = PointConvD(n1, k, c1, w, name="level1")
        self.level1_0 = ConvLReLU(c1, name="level1_0")
        self.level1_1 = ConvLReLU(c2, name="level1_1")
        self.level2 = PointConvD(n2, k, c2, w, name="level2")
        self.level2_0 = ConvLReLU(c2, name="level2_0")
        self.level2_1 = ConvLReLU(c3, name="level2_1")
        self.level3 = PointConvD(n3, k, c3, w, name="level3")
        self.level3_0 = ConvLReLU(c3, name="level3_0")
        self.level3_1 = ConvLReLU(2 * c3, name="level3_1")
        self.level4 = PointConvD(n4, k, c4, w, name="level4")

    def __call__(self, xyz) -> Tuple[list, list]:
        # The xyz pyramid is feature-independent, so ALL levels' FPS runs
        # upfront as one fused Pallas cascade (per-level composition spends
        # ~2x the kernel time on inter-level gathers/relayouts/launches);
        # per-level indices address the previous level, as PointConvD expects.
        fps_idx = ops.farthest_point_sample_pyramid(xyz, self.cfg.pyramid)

        feat = self.level0_lift(xyz)                           # xyz doubles as color
        feat_l0 = self.level0(xyz, feat)
        f = self.level0_1(feat_l0)

        pc_l1, feat_l1 = self.level1(xyz, f, fps_idx=fps_idx[0])
        feat_l1 = self.level1_0(feat_l1)
        f = self.level1_1(feat_l1)

        pc_l2, feat_l2 = self.level2(pc_l1, f, fps_idx=fps_idx[1])
        feat_l2 = self.level2_0(feat_l2)
        f = self.level2_1(feat_l2)

        pc_l3, feat_l3 = self.level3(pc_l2, f, fps_idx=fps_idx[2])
        feat_l3 = self.level3_0(feat_l3)
        f = self.level3_1(feat_l3)

        pc_l4, feat_l4 = self.level4(pc_l3, f, fps_idx=fps_idx[3])

        return [xyz, pc_l1, pc_l2, pc_l3, pc_l4], [
            feat_l0,
            feat_l1,
            feat_l2,
            feat_l3,
            feat_l4,
        ]


class MultiframeAttention(nn.Module):
    """Per-level multi-frame decoder stage (ref ``Multiframe_Attention``,
    ``mocopci.py:154-212``).

    For each of the 3 candidate frame flows: warp pc2 toward that time,
    re-correlate (bidirectional layer), build a motion embedding; then attend
    over the 5 time tokens with sinusoidal time encoding and emit per-frame
    flows + latent features.
    """

    feat_ch: int
    latent_ch: int
    mlp1: Tuple[int, int]
    mlp2: Tuple[int, int]
    flow_nei: int
    attn_drop: float = 0.05
    proj_drop: float = 0.05
    drop_path: float = 0.04

    def setup(self):
        self.bid = BidirectionalLayerFeatCosine(self.flow_nei, self.mlp1, name="bid")
        self.fe = FlowEmbeddingLayer(self.flow_nei, self.mlp2, name="fe")
        self.cross_block = MultiFrameBlock(
            dim=self.feat_ch,
            latent=self.latent_ch,
            drop=self.proj_drop,
            attn_drop=self.attn_drop,
            drop_path=self.drop_path,
            name="cross_block",
        )
        self.downsample = ConvLReLU(self.feat_ch, name="downsample")

    def __call__(
        self,
        pc1,
        pc2,
        feat1_new,
        feat2_new,
        feat1_0,
        feat1_1,
        feat2_0,
        feat2_1,
        up_frames,          # (B, 3, N, 3) candidate flows at this level
        ts: Tuple[float, ...],
        train: bool = False,
        deterministic: bool = True,
    ):
        c_feat1 = jnp.concatenate([feat1_0, feat1_1, feat1_new], axis=-1)
        c_feat2 = jnp.concatenate([feat2_0, feat2_1, feat2_new], axis=-1)

        # The reference loops the warp→bid→fe block over the 3 candidate frames
        # (mocopci.py:191-197) with *unchanged* weights and features — only the
        # warped geometry differs.  Fold the frame axis into the batch axis:
        # one op per stage instead of three, and compute the feature-space
        # cosine kNN (identical for every frame AND shared by bid/fe) once.
        B, F = up_frames.shape[:2]
        k_half = self.flow_nei // 2
        idx_cos_12 = ops.knn_cosine(k_half, feat2_0, feat1_0)
        idx_cos_21 = ops.knn_cosine(k_half, feat1_0, feat2_0)

        def rep(x):
            return jnp.broadcast_to(x[:, None], (B, F) + x.shape[1:]).reshape(
                (B * F,) + x.shape[1:]
            )

        def fold(x):
            return x.reshape((B * F,) + x.shape[2:])

        pc1_r, pc2_r = rep(pc1), rep(pc2)
        pc2_warp = ops.point_warp(pc1_r, pc2_r, fold(up_frames))
        f1n_all, f2n_all = self.bid(
            pc1_r, pc2_warp, rep(c_feat1), rep(c_feat2), rep(feat1_0), rep(feat2_0),
            rep(idx_cos_12), rep(idx_cos_21),
        )
        fe_all = self.fe(
            pc1_r, pc2_warp, f1n_all, f2n_all, rep(feat1_0), rep(feat2_0),
            rep(idx_cos_12),
        )
        f1n_all = f1n_all.reshape((B, F) + f1n_all.shape[1:])
        f2n_all = f2n_all.reshape((B, F) + f2n_all.shape[1:])
        fe_all = fe_all.reshape((B, F) + fe_all.shape[1:])
        # the reference keeps the LAST iteration's bid outputs (mocopci.py:195, 200)
        f1n, f2n = f1n_all[:, -1], f2n_all[:, -1]

        x = jnp.concatenate(
            [f1n[:, None], fe_all[:, :3], f2n[:, None]], axis=1
        )                                                     # (B, 5, N, C)
        x = x + time_embedding(ts, self.feat_ch)[None, :, None, :]
        feats, frames = self.cross_block(x, train, deterministic)
        feats = self.downsample(feats)                        # latent -> feat_ch
        return frames, f1n, f2n, feats


class MultiFrameEstimator(nn.Module):
    """Coarse-to-fine bidirectional multi-frame flow decoder
    (ref ``MultiFrameEstimatier``, ``mocopci.py:741-1059``)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        c0, c1, c2, c3, _ = cfg.enc_channels

        self.ei1 = EICrossformer(c1, name="ei1")
        self.ei2 = EICrossformer(c2, name="ei2")
        self.ei3 = EICrossformer(c3, name="ei3")

        self.deconv4_3 = ConvLReLU(c1, name="deconv4_3")
        self.deconv3_2 = ConvLReLU(c2, name="deconv3_2")
        self.deconv2_1 = ConvLReLU(c1, name="deconv2_1")

        self.cross3 = CrossLayerFeatCosine(
            cfg.flow_nei, (c3, c3), (c3, c3), name="cross3"
        )
        self.cross_block3 = CrossFrameBlock(
            dim=c3, attn_drop=cfg.attn_drop, drop=cfg.proj_drop, name="cross_block3"
        )
        # flag-gated decoder rematerialization: recompute these stages'
        # activations in the backward pass (jax.checkpoint via nn.remat).
        # static_argnums index from self=0: t (tuple of floats), train,
        # deterministic drive Python control flow inside the stage
        mfa_cls = MultiframeAttention
        if cfg.remat:
            mfa_cls = nn.remat(MultiframeAttention, static_argnums=(10, 11, 12))
        self.multi_frame_up_2 = mfa_cls(
            feat_ch=c2,
            latent_ch=c1 + c1 * 4,
            mlp1=(c2, c2),
            mlp2=(c2, c2),
            flow_nei=cfg.flow_nei,
            attn_drop=cfg.attn_drop,
            proj_drop=cfg.proj_drop,
            drop_path=cfg.drop_path,
            name="multi_frame_up_2",
        )
        self.multi_frame_up_1 = mfa_cls(
            feat_ch=c1,
            latent_ch=c1 + c0 * 4,
            mlp1=(c1, c1),
            mlp2=(c1, c1),
            flow_nei=cfg.flow_nei,
            attn_drop=cfg.attn_drop,
            proj_drop=cfg.proj_drop,
            drop_path=cfg.drop_path,
            name="multi_frame_up_1",
        )

        # fusion head conv stack 4->64->64->128 with BN(eps 1e-3) + ReLU
        # (ref mocopci.py:748-755)
        self.fusion_dense = [
            nn.Dense(c1, dtype=compute_dtype(), name="fusion_conv0"),
            nn.Dense(c1, dtype=compute_dtype(), name="fusion_conv1"),
            nn.Dense(c2, dtype=compute_dtype(), name="fusion_conv2"),
        ]
        self.fusion_bn = [
            FrameBatchNorm(eps=1e-3, name="fusion_bn0"),
            FrameBatchNorm(eps=1e-3, name="fusion_bn1"),
            FrameBatchNorm(eps=1e-3, name="fusion_bn2"),
        ]

        # refine head (ref mocopci.py:760-764)
        self.rlevel0 = ConvLReLU(c1, name="rlevel0")
        self.refine_level1 = PointConvD(
            cfg.refine_npoint, cfg.feat_nei, c1, cfg.weightnet, name="refine_level1"
        )
        self.shape1 = PointTransformerBlock(c1, cfg.refine_k, name="shape1")
        self.pred1 = nn.Dense(c0, dtype=compute_dtype(), name="pred1")
        self.pred2 = nn.Dense(3, name="pred2")

    def _fusion(self, points1, points2, n_groups, train, points1_self_ref=None):
        """kNN-softmax position blend (ref ``fusion``, ``mocopci.py:798-819``).

        Inputs are the 3 frames folded frame-major into the batch axis
        ((F·B, N, 3)); the reference calls fusion once per frame, so its
        BatchNorm statistics are per frame — reproduced by normalising per
        frame group (``n_groups`` leading groups).

        Row-parallel over ``points1`` rows given full reference clouds: the
        point-sharded eval forward passes ``points1`` as a local shard,
        ``points2`` fully gathered, and ``points1_self_ref`` (the gathered
        points1) as the self-kNN reference.
        """
        k = self.cfg.fusion_k
        # ONE batched kNN launch for both the self- and cross-neighbour sets
        # (2·FB clouds in a single kernel grid instead of two launches)
        self_ref = points1 if points1_self_ref is None else points1_self_ref
        idx_both = ops.knn(
            k,
            jnp.concatenate([self_ref, points2], axis=0),
            jnp.concatenate([points1, points1], axis=0),
        )
        idx_self, idx_cross = jnp.split(idx_both, 2, axis=0)
        idx = jnp.concatenate([idx_self, idx_cross], axis=-1)
        fb, n, k2 = idx.shape
        # k-MAJOR pair ordering (p' = j·N + n, neighbour slot j on sublanes,
        # point n on lanes): the per-point k2-group then occupies aligned
        # (3, N) lane blocks, so the query broadcast is a tile-aligned
        # concatenate (backward: aligned slice-sums) and the softmax/blend
        # group reshapes are tile moves — the k-minor order made all of these
        # strided 64-lane interleaves, ~16 ms of "transpose_jvp" fusions in
        # the B=2 train-step backward.  The Pallas head kernels are
        # order-agnostic over the pair axis.
        idx_t = idx.transpose(0, 2, 1)                         # (FB,2k,N)
        P = n * k2
        # flat k-major neighbour ROWS — the 3-minor tensor is never touched
        # elementwise on TPU: the pair planes are built by a Pallas sweep that
        # transposes (R, 3) row blocks on the MXU, and the whole
        # gather→planes pair is ONE custom-VJP op whose backward never leaves
        # plane layout (d_resi from the saved planes, d_points2 through the
        # radix-bucket scatter — fusion_planes.py); the XLA twin below keeps
        # CPU and tiny shapes on the same math
        p1_t = points1.astype(jnp.float32).transpose(0, 2, 1)  # (FB,3,N)
        from mocopci_tpu.ops.pallas.fusion_planes import (
            build_pair_planes_xla,
            gather_pair_planes,
        )

        n2 = points2.shape[1]
        if (
            jax.default_backend() == "tpu"
            and n % 128 == 0
            and n2 % 128 == 0
            and os.environ.get("MOCOPCI_PLANES") != "xla"  # escape hatch
        ):
            x_planes = gather_pair_planes(
                points2.astype(jnp.float32), idx_t.reshape(fb, P), p1_t
            )                                                  # (FB,4,P)
        else:
            nbr_rows = ops.gather(
                points2.astype(jnp.float32), idx_t.reshape(fb, P)
            )                                                  # (FB,P,3)
            x_planes = build_pair_planes_xla(nbr_rows, p1_t)
        resi_t = x_planes[:, :3]
        if train:
            # Transposed lane-dense planes, like the eval path below: the
            # round-2 channels-last program ((FB,N,2k,64) tensors, C=64 on
            # lanes at half occupancy) cost 97 ms fwd+bwd of the 275 ms B=2
            # train step.  Statistics semantics are unchanged — BN batch
            # stats + EMA run per frame group via FrameBatchNorm.grouped_cf,
            # and sum(w)=1 makes the resi-plane blend identical to the
            # reference's neighbour blend.  The dummy pass creates the dense
            # params during init (same trick as the eval branch).
            hd = jnp.zeros((1, 1, 1, 4), jnp.float32)
            for dense, bn in zip(self.fusion_dense, self.fusion_bn):
                hd = dense(hd)
                bn(hd, False)              # create BN params/stat variables
            cdt = compute_dtype()
            h = x_planes                                       # (FB,4,P)
            if jax.default_backend() == "tpu":
                # fused Pallas head: streaming stats + recompute sweeps with a
                # custom VJP — the XLA program materializes every (FB, C, P)
                # activation in HBM for itself and its backward
                # (ops/pallas/fusion_head_train.py)
                from mocopci_tpu.ops.pallas.fusion_head_train import (
                    fusion_head_train,
                )

                p12 = []
                for dense, bn in zip(self.fusion_dense, self.fusion_bn):
                    dv = dense.variables["params"]
                    bv = bn.variables["params"]
                    p12 += [
                        dv["kernel"].astype(jnp.float32),
                        dv["bias"].astype(jnp.float32),
                        bv["scale"], bv["bias"],
                    ]
                h, stats = fusion_head_train(h, tuple(p12), n_groups)
                n_el = (fb // n_groups) * P
                for bn, (mean_g, var_g) in zip(self.fusion_bn, stats):
                    bn(
                        jax.lax.stop_gradient(mean_g), True,
                        ema_stats=(
                            jax.lax.stop_gradient(mean_g),
                            jax.lax.stop_gradient(var_g),
                            n_el,
                        ),
                    )
            else:
                for dense, bn in zip(self.fusion_dense, self.fusion_bn):
                    dv = dense.variables["params"]
                    h = jnp.einsum(
                        "gcp,cd->gdp",
                        h.astype(cdt),
                        dv["kernel"].astype(cdt),
                        preferred_element_type=jnp.float32,
                    ) + dv["bias"].astype(jnp.float32)[:, None]
                    C = h.shape[1]
                    h = bn(
                        h.reshape(n_groups, fb // n_groups, C, P), True,
                        grouped_cf=True,
                    ).reshape(fb, C, P)
                    h = nn.relu(h)
                h = jnp.max(h, axis=1)                         # max over channels
            # blend weights and positions in f32 (coordinate precision);
            # k-major: group axis k2 lands on sublanes of aligned (k2, N)
            # tiles, so the softmax reduce and the blend contraction are
            # sublane ops over lane-dense planes
            w = jax.nn.softmax(
                h.astype(jnp.float32).reshape(fb, k2, n), axis=1
            )
            blend = jnp.einsum(
                "bkn,bckn->bnc", w, resi_t.reshape(fb, 3, k2, n),
                preferred_element_type=jnp.float32,
            )
            return points1.astype(jnp.float32) + blend         # (FB,N,3)
        else:
            # eval: fold the (running-stats) BatchNorms into the dense layers
            # and run the whole pair-MLP + channel-max as one Pallas kernel —
            # the dense program materializes (FB, N, 2k, 64..128) activations
            # in HBM (ops/pallas/fusion_head.py).  The tiny dummy pass keeps
            # the module's parameter/stat creation identical to the train path.
            from mocopci_tpu.ops.pallas.fusion_head import (
                fold_bn_dense,
                fusion_head_pallas,
            )

            hd = jnp.zeros((1, 1, 1, 4), jnp.float32)
            folded = []
            for dense, bn in zip(self.fusion_dense, self.fusion_bn):
                hd = nn.relu(bn(dense(hd), False))
                dv = dense.variables["params"]
                bp = bn.variables["params"]
                bs = bn.variables["batch_stats"]
                folded.extend(
                    fold_bn_dense(
                        dv["kernel"].astype(jnp.float32),
                        dv["bias"].astype(jnp.float32),
                        bp["scale"], bp["bias"], bs["mean"], bs["var"], bn.eps,
                    )
                )
            # the whole eval head runs TRANSPOSED: the Pallas plane build
            # above emits (FB, 4, N·2k) lane-dense planes straight from the
            # gathered rows, then every pass is lane-dense — a pairs-minor
            # (.., 3/4) layout pads each lane tile 3/128 and the
            # resi/dist/blend passes cost ~30x their bytes (measured)
            def tpu_path(x, *wb):
                return fusion_head_pallas(x, *wb)

            def default_path(x, *wb):
                hh = x
                for i in range(0, len(wb), 2):
                    hh = jnp.maximum(
                        jnp.einsum("gcp,cd->gdp", hh, wb[i]) + wb[i + 1][:, None],
                        0.0,
                    )
                return jnp.max(hh, axis=1)

            h = jax.lax.platform_dependent(
                x_planes, *folded, tpu=tpu_path, default=default_path
            )
            w = jax.nn.softmax(h.reshape(fb, k2, n), axis=1)   # (FB,2k,N)
            # softmax weights sum to 1, so Σ w·neighbor = p1 + Σ w·resi —
            # the blend stays on the wide resi planes (no narrow-lane pass)
            blend = jnp.einsum(
                "bkn,bckn->bnc", w, resi_t.reshape(fb, 3, k2, n),
                preferred_element_type=jnp.float32,
            )
            return points1.astype(jnp.float32) + blend         # (FB,N,3)

    def _refine(self, feat0, base_pc, up_flow, train):
        """Full-res compensation head (ref ``mocopci.py:1017-1038``)."""
        c0 = self.cfg.enc_channels[0]
        A = area_resize_matrix(3, c0)                          # (c0, 3)
        warped_feat = feat0 + jnp.einsum("bnc,dc->bnd", up_flow, A)
        warped_feat = self.rlevel0(warped_feat)
        down_xyz, down_feat = self.refine_level1(base_pc, warped_feat)
        shaped = self.shape1(down_feat, down_xyz)
        up = ops.upsample(base_pc, down_xyz, shaped)
        # pred2 emits xyz offsets -> f32 (pred1 inherits compute dtype)
        return self.pred2(nn.relu(self.pred1(up)).astype(jnp.float32))

    def __call__(
        self,
        pc1s,
        pc2s,
        feat1s,
        feat2s,
        train: bool = False,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        F = cfg.n_frames
        t_f, t_b = cfg.t_forward, cfg.t_backward

        # EI fusion at L1..L3 — one shared feature per level (mocopci.py:829-837)
        fus1 = self.ei1(feat1s[1], feat2s[1], deterministic)
        fus2 = self.ei2(feat1s[2], feat2s[2], deterministic)
        fus3 = self.ei3(feat1s[3], feat2s[3], deterministic)

        # L4 -> L3
        feat1_l4_3 = self.deconv4_3(ops.upsample(pc1s[3], pc1s[4], feat1s[4]))
        feat2_l4_3 = self.deconv4_3(ops.upsample(pc2s[3], pc2s[4], feat2s[4]))

        # L3 cost volume + one-shot frame synthesis (fwd and bwd)
        c_feat1_l3 = jnp.concatenate([feat1s[3], fus3, feat1_l4_3], axis=-1)
        c_feat2_l3 = jnp.concatenate([feat2s[3], fus3, feat2_l4_3], axis=-1)
        f1n_l3, f2n_l3 = self.cross3(
            pc1s[3], pc2s[3], c_feat1_l3, c_feat2_l3, feat1s[3], feat2s[3]
        )
        feats3_f, frame3_f = self.cross_block3(
            jnp.stack([f1n_l3, f2n_l3], axis=1), train, deterministic
        )
        feats3_b, frame3_b = self.cross_block3(
            jnp.stack([f2n_l3, f1n_l3], axis=1), train, deterministic
        )

        # L3 -> L2: one kNN/gather per cloud serves the deconv feature AND the
        # 3 candidate flows (identical geometry — see upsample_multi)
        feat1_l3_2, up_frame2_f = _upsample_feat_and_frames(
            pc1s[2], pc1s[3], f1n_l3, frame3_f
        )
        feat2_l3_2, up_frame2_b = _upsample_feat_and_frames(
            pc2s[2], pc2s[3], f2n_l3, frame3_b
        )
        feat1_l3_2 = self.deconv3_2(feat1_l3_2)
        feat2_l3_2 = self.deconv3_2(feat2_l3_2)
        frames3_out_f = pc1s[3][:, None] + frame3_f
        frames3_out_b = pc2s[3][:, None] + _rev_frames(frame3_b)

        # L2 (mocopci.py:882-916)
        frame2_f, f1n_l2_f, f2n_l2_f, _ = self.multi_frame_up_2(
            pc1s[2], pc2s[2], feat1_l3_2, feat2_l3_2,
            feat1s[2], fus2, feat2s[2], fus2, up_frame2_f, t_f, train, deterministic,
        )
        frame2_b, f2n_l2_b, f1n_l2_b, _ = self.multi_frame_up_2(
            pc2s[2], pc1s[2], feat2_l3_2, feat1_l3_2,
            feat2s[2], fus2, feat1s[2], fus2, up_frame2_b, t_b, train, deterministic,
        )

        # L2 -> L1: per cloud, one kNN/gather for both directions' features and
        # the candidate flows (mocopci.py:920-944 recomputes it 8×)
        (feat1_l2_1_f, feat1_l2_1_b), up_frame1_f = _upsample_feats_and_frames(
            pc1s[1], pc1s[2], (f1n_l2_f, f1n_l2_b), frame2_f
        )
        (feat2_l2_1_f, feat2_l2_1_b), up_frame1_b = _upsample_feats_and_frames(
            pc2s[1], pc2s[2], (f2n_l2_f, f2n_l2_b), frame2_b
        )
        feat1_l2_1_f = self.deconv2_1(feat1_l2_1_f)
        feat2_l2_1_f = self.deconv2_1(feat2_l2_1_f)
        feat1_l2_1_b = self.deconv2_1(feat1_l2_1_b)
        feat2_l2_1_b = self.deconv2_1(feat2_l2_1_b)
        frames2_out_f = pc1s[2][:, None] + frame2_f
        frames2_out_b = pc2s[2][:, None] + _rev_frames(frame2_b)

        # L1 (mocopci.py:947-981)
        frame1_f, f1n_l1_f, f2n_l1_f, _ = self.multi_frame_up_1(
            pc1s[1], pc2s[1], feat1_l2_1_f, feat2_l2_1_f,
            feat1s[1], fus1, feat2s[1], fus1, up_frame1_f, t_f, train, deterministic,
        )
        frame1_b, f2n_l1_b, f1n_l1_b, _ = self.multi_frame_up_1(
            pc2s[1], pc1s[1], feat2_l2_1_b, feat1_l2_1_b,
            feat2s[1], fus1, feat1s[1], fus1, up_frame1_b, t_b, train, deterministic,
        )

        # L1 -> L0: note the backward branch uses time-reversed frame order
        # (mocopci.py:1002-1006)
        _, up_frame0_f = _upsample_feat_and_frames(pc1s[0], pc1s[1], None, frame1_f)
        _, up_frame0_b = _upsample_feat_and_frames(
            pc2s[0], pc2s[1], None, _rev_frames(frame1_b)
        )
        frames1_out_f = pc1s[1][:, None] + frame1_f
        frames1_out_b = pc2s[1][:, None] + _rev_frames(frame1_b)

        # L0: warp, refine, fuse (mocopci.py:1009-1053).
        # The reference runs the refine head + fusion once per frame in Python;
        # the three calls share weights, so they are folded frame-major into
        # the batch axis and run as ONE op sequence.
        B = pc1s[0].shape[0]
        warped_f = pc1s[0][:, None] + up_frame0_f            # (B,F,N,3)
        warped_b = pc2s[0][:, None] + up_frame0_b
        warped_f_r = pc1s[0][:, None] + _rev_frames(up_frame0_b)
        warped_b_r = pc2s[0][:, None] + _rev_frames(up_frame0_f)

        # frames 0,1 refine the forward warp from frame-1 features; frame 2
        # refines the backward warp from frame-2 features (mocopci.py:1017-1038)
        base = jnp.concatenate(
            [warped_f[:, 0], warped_f[:, 1], warped_b[:, 2]], axis=0
        )                                                     # (3B, N, 3)
        feat0 = jnp.concatenate([feat1s[0], feat1s[0], feat2s[0]], axis=0)
        flows = jnp.concatenate(
            [up_frame0_f[:, 0], up_frame0_f[:, 1], up_frame0_b[:, 2]], axis=0
        )
        if cfg.remat:
            # method-form remat: the unbound method takes the module at arg 0,
            # so `train` is static argnum 4 (and n_groups 3 for _fusion)
            refine_fn = lambda *a: nn.remat(
                type(self)._refine, static_argnums=(4,)
            )(self, *a)
            fusion_fn = lambda *a: nn.remat(
                type(self)._fusion, static_argnums=(3, 4)
            )(self, *a)
        else:
            refine_fn, fusion_fn = self._refine, self._fusion
        refine_out = refine_fn(feat0, base, flows, train)
        fused = fusion_fn(base, refine_out, F, train)         # (3B, N, 3)
        out = jnp.stack([fused[i * B : (i + 1) * B] for i in range(F)], axis=1)

        result = {"out": out}                                 # (B, 3, N, 3)
        if train:
            result["frames_f"] = (
                warped_f, warped_f_r, frames1_out_f, frames2_out_f, frames3_out_f,
            )
            result["frames_b"] = (
                warped_b, warped_b_r, frames1_out_b, frames2_out_b, frames3_out_b,
            )
        return result


class MoCoPCI(nn.Module):
    """Top-level model (ref ``mocopci.py:1062-1097``).

    ``__call__(xyz1, xyz2)`` with channels-last (B, N, 3) clouds returns a dict:
      - ``out``: (B, 3, N, 3) — the three interpolated frames (always).
      - ``frames_f`` / ``frames_b``: 5-tuples of (B, 3, n_l, 3) pyramids
        [warped, reverse-warped, L1, L2, L3] (train only), matching the
        reference's ``flows_lst_f/b`` contract transposed per frame.

    The ground-truth FPS pyramid of the reference's train branch
    (``mocopci.py:1079-1085``) lives in ``training.loss.gt_pyramid`` — it has
    no parameters and belongs with the loss.
    """

    cfg: ModelConfig

    def setup(self):
        self.encoder = PointConvEncoder(self.cfg, name="encoder")
        self.estimator = MultiFrameEstimator(self.cfg, name="estimator")

    def __call__(self, xyz1, xyz2, train: bool = False, deterministic: bool = True):
        # the reference runs the shared encoder twice (mocopci.py:1072-1073);
        # every encoder op is per-cloud, so one batched call over the stacked
        # clouds does the same work with half the op count
        B = xyz1.shape[0]
        pcs, feats = self.encoder(jnp.concatenate([xyz1, xyz2], axis=0))
        pc1s = [p[:B] for p in pcs]
        pc2s = [p[B:] for p in pcs]
        feat1s = [f[:B] for f in feats]
        feat2s = [f[B:] for f in feats]
        return self.estimator(pc1s, pc2s, feat1s, feat2s, train, deterministic)
