"""DHB / 8IVFB human-body dataset loader.

Equivalent of the reference ``DHBDataset`` (``data/no_norm_datasets.py:94-216``;
present in the reference but unused by its entry points — provided for feature
parity).  Sequences are stored as a single ``.pt``/``.npy`` tensor of shape
(T, 1024, 3); samples are sliding windows of 4 input frames spaced ``interval``
apart with the (interval-1) frames between the middle pair as ground truth.
8IVFB scenes are centroid-centred and scaled by the reference's constant
583.1497484423953 (``no_norm_datasets.py:199``).

Torch-free when sequences are ``.npy``; ``.pt`` tensors are loaded via torch if
available.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

_8IVFB_SCENES = ("longdress", "loot", "redandblack", "soldier")
_8IVFB_SCALE = 583.1497484423953


def _load_sequence(data_root: str, scene: str) -> np.ndarray:
    if scene in _8IVFB_SCENES:
        candidates = [scene + ".pt", scene + ".npy"]
    else:
        candidates = [scene + "_fps1024_aligned.pt", scene + "_fps1024_aligned.npy"]
    for name in candidates:
        path = os.path.join(data_root, name)
        if os.path.exists(path):
            if name.endswith(".npy"):
                return np.load(path).astype(np.float32)
            import torch

            return torch.load(path, map_location="cpu").numpy().astype(np.float32)
    raise FileNotFoundError(f"no sequence file for scene {scene} in {data_root}")


class DHBDataset:
    def __init__(self, data_root: str, scene_list: str, interval: int = 4):
        self.data_root = data_root
        self.interval = interval
        with open(scene_list) as f:
            self.scenes = [ln.strip() for ln in f if ln.strip()]
        self._samples: List[Tuple[str, int]] = []
        self._seqs: Dict[str, np.ndarray] = {}
        for scene in self.scenes:
            seq = _load_sequence(data_root, scene)
            self._seqs[scene] = seq
            # sliding windows: start while start + 3*interval < len(seq)
            start = 0
            while start + self.interval * 3 < len(seq):
                self._samples.append((scene, start))
                start += self.interval

    def __len__(self) -> int:
        return len(self._samples)

    def _frame(self, scene: str, idx: int) -> np.ndarray:
        pc = self._seqs[scene][idx]
        if scene in _8IVFB_SCENES:
            pc = (pc - pc.mean(axis=0)) / _8IVFB_SCALE
        return pc.astype(np.float32)

    def __getitem__(self, index: int):
        scene, s = self._samples[index]
        iv = self.interval
        inputs = [self._frame(scene, s + iv * i) for i in range(4)]
        gts = [self._frame(scene, s + iv + k + 1) for k in range(iv - 1)]
        return inputs, gts
