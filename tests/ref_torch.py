"""Test harness that makes the reference PyTorch model runnable on CPU.

The reference's CUDA extensions (``pointnet2_cuda``, ``pytorch3d``) and
``timm`` are replaced with small, faithful torch implementations so that the
reference modules can be executed on CPU and used as numerical oracles for
parity tests.  These stubs implement the documented semantics of the CUDA
kernels (``pointnet2/src/*.cu``), they do not copy reference code.
"""
from __future__ import annotations

import sys
import types

REF = "/root/reference"
_installed = False


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_reference_stubs():
    """Install CPU stand-ins for the reference's native deps. Idempotent."""
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn

    # ---- timm pieces used at import time (mocopci.py:4) ----
    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()
            self.p = p

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1 - self.p
            mask = torch.bernoulli(torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep))
            return x * mask / keep

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    timm = _stub("timm")
    timm.models = _stub("timm.models")
    _stub("timm.models.layers", DropPath=DropPath, to_2tuple=to_2tuple,
          trunc_normal_=trunc_normal_)

    # ---- pointnet2 CUDA ops (semantics of pointnet2/src/*.cu) ----
    def furthest_point_sampling(xyz, npoint):
        # xyz: (B, N, 3) -> (B, npoint) int32; seed idx 0, 1e10 min-dist init
        B, N, _ = xyz.shape
        out = torch.zeros(B, npoint, dtype=torch.int32)
        for b in range(B):
            mind = torch.full((N,), 1e10)
            last = 0
            for i in range(1, npoint):
                d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
                mind = torch.minimum(mind, d)
                last = int(torch.argmax(mind))
                out[b, i] = last
        return out

    class _FPS(torch.autograd.Function):
        @staticmethod
        def forward(ctx, xyz, npoint):
            return furthest_point_sampling(xyz, npoint)

    def gather_operation(features, idx):
        # (B, C, N) x (B, M) -> (B, C, M)
        idx = idx.long()
        return torch.gather(
            features, 2, idx.unsqueeze(1).expand(-1, features.shape[1], -1)
        )

    def grouping_operation(features, idx):
        # (B, C, N) x (B, S, K) -> (B, C, S, K)
        B, C, N = features.shape
        _, S, K = idx.shape
        idx = idx.long().reshape(B, 1, S * K).expand(-1, C, -1)
        return torch.gather(features, 2, idx).reshape(B, C, S, K)

    # the reference imports these names from pointnet2_utils; install a module
    # tree that provides them without the CUDA build.
    pn2_utils = types.ModuleType("pointnet2.pointnet2_utils")
    pn2_utils.furthest_point_sample = lambda xyz, n: furthest_point_sampling(xyz, n)
    pn2_utils.gather_operation = gather_operation
    pn2_utils.grouping_operation = grouping_operation
    pn2 = _stub("pointnet2")
    pn2.pointnet2_utils = pn2_utils
    sys.modules["pointnet2.pointnet2_utils"] = pn2_utils
    _stub("pointnet2_cuda")

    models_pn2_utils = types.ModuleType("models.pointnet2.pointnet2_utils")
    models_pn2_utils.furthest_point_sample = pn2_utils.furthest_point_sample
    models_pn2_utils.gather_operation = gather_operation
    models_pn2_utils.grouping_operation = grouping_operation

    # ---- pytorch3d ----
    def knn_points(p1, p2, K=1, **kw):
        # for each point in p1 the K nearest in p2; returns (dists, idx, None)
        d = torch.cdist(p1, p2) ** 2
        dists, idx = torch.topk(d, K, dim=-1, largest=False)
        return dists, idx, None

    def chamfer_distance(x, y, **kw):
        d = torch.cdist(x, y) ** 2
        cham = d.min(2).values.mean(1) + d.min(1).values.mean(1)
        return cham.mean(), None

    p3d = _stub("pytorch3d")
    p3d.ops = _stub("pytorch3d.ops", knn_points=knn_points)
    p3d.loss = _stub("pytorch3d.loss", chamfer_distance=chamfer_distance)
    _stub("sklearn")
    _stub("sklearn.neighbors", KernelDensity=object)
    _stub("emd_cuda")

    # CPU-run patch: the reference hard-codes .cuda() on a few tensors
    torch.Tensor.cuda = lambda self, *a, **k: self

    if REF not in sys.path:
        sys.path.insert(0, REF)
    # pre-register models.pointnet2.pointnet2_utils so the reference's
    # `from models.pointnet2.pointnet2_utils import ...` resolves to the CPU
    # implementations (the real file needs torch.cuda tensors at forward time)
    _stub("models.pointnet2")
    sys.modules["models.pointnet2.pointnet2_utils"] = models_pn2_utils

    _installed = True


def module_state_dict(mod, prefix="m"):
    """Flat numpy state dict with a synthetic prefix, for the converter helpers."""
    return {f"{prefix}.{k}": v.detach().cpu().numpy() for k, v in mod.state_dict().items()}
