"""Native C++ loader: semantics vs the numpy path."""
import os

import numpy as np
import pytest

from mocopci_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native loader"
)


def _write_bin(path, n, rng):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts.tofile(path)
    return pts


def test_sample_without_replacement(tmp_path, rng):
    pts = _write_bin(tmp_path / "a.bin", 100, rng)
    out = native.load_and_sample(str(tmp_path / "a.bin"), 40, seed=7)
    assert out.shape == (40, 3)
    # every sampled row is a distinct row of the file
    rows = {tuple(r) for r in out}
    allrows = {tuple(r) for r in pts}
    assert rows <= allrows
    assert len(rows) == 40  # no replacement


def test_pad_with_replacement_keeps_prefix(tmp_path, rng):
    pts = _write_bin(tmp_path / "b.bin", 10, rng)
    out = native.load_and_sample(str(tmp_path / "b.bin"), 16, seed=3)
    np.testing.assert_array_equal(out[:10], pts)
    allrows = {tuple(r) for r in pts}
    assert all(tuple(r) in allrows for r in out[10:])


def test_batch_loading_matches_single(tmp_path, rng):
    paths = []
    for i in range(5):
        _write_bin(tmp_path / f"f{i}.bin", 60 + i, rng)
        paths.append(str(tmp_path / f"f{i}.bin"))
    out = native.load_batch(paths, 32, seed=11, n_threads=3)
    assert out.shape == (5, 32, 3)
    for i, p in enumerate(paths):
        raw = np.fromfile(p, np.float32).reshape(-1, 3)
        rows = {tuple(r) for r in out[i]}
        assert rows <= {tuple(r) for r in raw}


def test_nldrive_uses_native(tmp_path, rng):
    from mocopci_tpu.data import NLDriveDataset

    names = []
    for f in range(7):
        rel = f"s_{f}.bin"
        _write_bin(tmp_path / rel, 50 + f, rng)
        names.append(rel)
    lp = tmp_path / "list.txt"
    lp.write_text(" ".join(names) + "\n")
    ds = NLDriveDataset(str(tmp_path), str(lp), num_points=32, seed=0, use_native=True)
    assert ds._native is not None
    inputs, gts = ds[0]
    assert len(inputs) == 4 and len(gts) == 3
    for a in inputs + gts:
        assert a.shape == (32, 3)
