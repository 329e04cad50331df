"""Data-layer tests: synthetic generator and the NL-Drive loader contract."""
import os

import numpy as np

from mocopci_tpu.data import NLDriveDataset, SyntheticInterpolationDataset, batches


def test_synthetic_contract():
    ds = SyntheticInterpolationDataset(length=4, num_points=256, seed=1)
    assert len(ds) == 4
    inputs, gts = ds[0]
    assert len(inputs) == 4 and len(gts) == 3
    for a in inputs + gts:
        assert a.shape == (256, 3) and a.dtype == np.float32
    # deterministic per index
    i2, g2 = ds[0]
    np.testing.assert_array_equal(inputs[0], i2[0])
    # motion: consecutive frames differ
    assert np.abs(inputs[0] - inputs[3]).max() > 1e-3


def _write_nldrive_tree(root, n_rows=3, n_pts=50):
    rng = np.random.default_rng(0)
    rows = []
    for r in range(n_rows):
        names = []
        for f in range(7):
            rel = f"scene/{r:02d}_{f:02d}.bin"
            path = os.path.join(root, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # vary point count: some below num_points to exercise padding
            n = n_pts + 13 * f - (20 if f == 2 else 0)
            rng.normal(size=(n, 3)).astype(np.float32).tofile(path)
            names.append(rel)
        rows.append(" ".join(names))
    list_path = os.path.join(root, "scene_list.txt")
    with open(list_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    return list_path


def test_nldrive_loader_contract(tmp_path):
    root = str(tmp_path)
    list_path = _write_nldrive_tree(root)
    ds = NLDriveDataset(root, list_path, num_points=64, interval=4, num_frames=4, seed=0)
    assert len(ds) == 3
    inputs, gts = ds[0]
    assert len(inputs) == 4 and len(gts) == 3
    for a in inputs + gts:
        assert a.shape == (64, 3) and a.dtype == np.float32


def test_nldrive_padding_keeps_all_points(tmp_path):
    root = str(tmp_path)
    rel = "only.bin"
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    pts.tofile(os.path.join(root, rel))
    lp = os.path.join(root, "l.txt")
    with open(lp, "w") as f:
        f.write(" ".join([rel] * 7) + "\n")
    ds = NLDriveDataset(root, lp, num_points=16, interval=4, num_frames=4, seed=0)
    inputs, _ = ds[0]
    # pad-with-replacement keeps the original 10 points as a prefix
    np.testing.assert_array_equal(inputs[0][:10], pts)


def test_batches_iterator():
    ds = SyntheticInterpolationDataset(length=5, num_points=32, seed=0)
    got = list(batches(ds, batch_size=2, shuffle=True, drop_last=True, seed=0))
    assert len(got) == 2  # 5 // 2
    b = got[0]
    assert b["pc1"].shape == (2, 32, 3)
    assert b["pc2"].shape == (2, 32, 3)
    assert b["gt"].shape == (2, 3, 32, 3)


def test_dhb_dataset(tmp_path):
    from mocopci_tpu.data import DHBDataset

    # synthetic sequence: 20 frames of 64 points (npy path, torch-free)
    seq = np.random.default_rng(0).normal(size=(20, 64, 3)).astype(np.float32)
    np.save(tmp_path / "swing_fps1024_aligned.npy", seq)
    with open(tmp_path / "scenes.txt", "w") as f:
        f.write("swing\n")
    ds = DHBDataset(str(tmp_path), str(tmp_path / "scenes.txt"), interval=4)
    # windows: start + 12 < 20 -> starts 0, 4 -> 2 samples
    assert len(ds) == 2
    inputs, gts = ds[0]
    assert len(inputs) == 4 and len(gts) == 3
    np.testing.assert_array_equal(inputs[0], seq[0])
    np.testing.assert_array_equal(inputs[1], seq[4])
    np.testing.assert_array_equal(gts[0], seq[5])
    np.testing.assert_array_equal(gts[2], seq[7])
