"""Configuration dataclasses for the MoCoPCI-TPU framework.

The reference (``/root/reference``) hard-codes every model hyperparameter in module
constructors (``models/m_models/mocopci.py:741-796``) and exposes only the training
recipe via argparse (``train.py:18-37``).  Here everything is collected into two
frozen dataclasses so that (a) the exact reference defaults are reproducible and
(b) tiny configurations can be instantiated for unit tests and multi-chip dry runs
with fully static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


def timestamps(
    t_begin: float = 0.0,
    t_end: float = 1.0,
    interval: int = 4,
    num_frames: int = 4,
) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Frame timestamps from the CLI flags — wires ``--interval``/``--t_begin``/
    ``--t_end`` into the model.

    Reproduces the reference ``get_timestamp`` (``train.py:49-55``) and the
    hard-coded endpoint convention of the model (``mocopci.py:824-825``: the
    five attention time tokens are ``[t_begin, *time_intp, t_end]``).  With the
    default flags this returns bit-for-bit the reference literals.

    The one-shot heads-as-frames synthesis (``mocopci.py:589-621``) emits
    exactly ``interval - 1 = 3`` intermediate frames, and the NL-Drive row
    contract is 7 files = 4 inputs + 3 gt, so ``interval``/``num_frames`` other
    than 4 are rejected rather than silently ignored.
    """
    if interval != 4:
        raise ValueError(
            f"--interval must be 4 (got {interval}): the one-shot frame "
            "synthesis head emits interval-1=3 frames and the NL-Drive row "
            "contract provides exactly 3 ground-truth frames"
        )
    if num_frames != 4:
        raise ValueError(
            f"--num_frames must be 4 (got {num_frames}): NL-Drive rows carry "
            "4 input frames (01/05/09/13)"
        )
    time_seq = np.linspace(t_begin, t_end, num_frames)
    t_left, t_right = time_seq[num_frames // 2 - 1], time_seq[num_frames // 2]
    intp = np.linspace(t_left, t_right, interval + 1)[1:-1]
    t_forward = (float(t_begin),) + tuple(float(x) for x in intp) + (float(t_end),)
    return t_forward, tuple(reversed(t_forward))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture configuration.

    Defaults mirror the reference exactly:
      - pyramid sizes 8192/2048/512/256/64  (``mocopci.py:424-436``)
      - encoder channels 32/64/128/256/256  (``mocopci.py:420-436``)
      - kNN sizes: 32 neighbours for encoder grouping (``feat_nei=32``,
        ``mocopci.py:417``), 32 for cross/flow layers (``flow_nei=32``,
        ``mocopci.py:744``), 16 for the refine-head point transformer
        (``pointT_layer2.py:38``), 32 for the fusion head (``mocopci.py:1047``).
      - frame timestamps hard-coded forward/backward (``mocopci.py:824-825``).
    """

    npoints: int = 8192
    # FPS pyramid (levels 1..4). Reference hard-codes these for npoints=8192.
    pyramid: Tuple[int, int, int, int] = (2048, 512, 256, 64)
    # number of intermediate frames predicted in one shot (``inter_num=3``)
    n_frames: int = 3
    # encoder output channels per level (``mocopci.py:420-436``)
    enc_channels: Tuple[int, int, int, int, int] = (32, 64, 128, 256, 256)
    weightnet: int = 8
    feat_nei: int = 32       # encoder kNN group size
    flow_nei: int = 32       # cross / bidirectional / flow-embedding kNN size
    refine_k: int = 16       # point-transformer kNN in refine head
    fusion_k: int = 32       # kNN-softmax fusion neighbourhood
    # hard-coded frame timestamps (``mocopci.py:824-825``)
    t_forward: Tuple[float, ...] = (0.0, 0.41666666666666663, 0.5, 0.5833333333333333, 1.0)
    t_backward: Tuple[float, ...] = (1.0, 0.5833333333333333, 0.5, 0.41666666666666663, 0.0)
    # dropout rates of the attention decoder blocks (``mocopci.py:166-168, 781-783``)
    attn_drop: float = 0.05
    proj_drop: float = 0.05
    drop_path: float = 0.04
    # refine head downsample size (``PointConvD(2048, ...)``, ``mocopci.py:762``)
    refine_npoint: int = 2048
    # rematerialize the decoder stages (multi_frame_up_1/2, refine, fusion)
    # under autodiff: activations are recomputed in the backward pass instead
    # of living in HBM across it — trades step time for the XLA temporary
    # buffers that dominate memory at 16k-32k stress sizes (runs/remat_32k.json)
    remat: bool = False

    @property
    def levels(self) -> Tuple[int, int, int, int, int]:
        return (self.npoints,) + self.pyramid

    def validate(self) -> None:
        n0, (n1, n2, n3, n4) = self.npoints, self.pyramid
        assert n0 >= n1 >= n2 >= n3 >= n4 >= 1
        assert self.refine_npoint <= n0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe. Defaults = reference recipe (``train.py:58, 86-99, 106``)."""

    batch_size: int = 2
    epochs: int = 400
    lr: float = 1e-3
    weight_decay: float = 1e-4
    lr_step: int = 15          # StepLR step_size
    lr_gamma: float = 0.8      # StepLR gamma
    lr_clip: float = 5e-5      # LEARNING_RATE_CLIP (train.py:58)
    grad_clip: float = 2.0     # clip_grad_norm_ (train.py:166)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    seed: int = 0
    # loss weights (train.py:142-160)
    alpha: Tuple[float, float, float, float] = (1.0, 0.8, 0.4, 0.2)
    w_straight: float = 0.5
    w_multi: float = 0.25
    # gradient accumulation: the global batch is split into grad_accum
    # sequential micro-batches, gradients mean-combined before the single
    # optimizer update — reproduces the reference's global-batch-2 recipe
    # (``train.py:58``) on meshes with fewer chips than batch elements, and
    # bounds activation memory in the 16k-32k stress configs
    grad_accum: int = 1


def stress_model_config(npoints: int) -> ModelConfig:
    """Dense-stress configuration (BASELINE config 5: 16k-32k points/frame).

    Scales the FPS pyramid with the reference's 8192-point ratios
    (/4, /16, /32, /128).  At these sizes the blocked kNN, chunked attention,
    and memory-bounded EMD paths engage automatically.
    """
    return ModelConfig(
        npoints=npoints,
        pyramid=(npoints // 4, npoints // 16, npoints // 32, npoints // 128),
        refine_npoint=npoints // 4,
    )


def tiny_model_config(npoints: int = 256) -> ModelConfig:
    """A small config with the same structure, for tests and CPU dry runs."""
    return ModelConfig(
        npoints=npoints,
        pyramid=(npoints // 4, npoints // 8, npoints // 16, npoints // 32),
        feat_nei=8,
        flow_nei=8,
        refine_k=4,
        fusion_k=8,
        refine_npoint=npoints // 4,
    )
