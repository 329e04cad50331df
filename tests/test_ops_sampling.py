"""FPS / interpolation / warping tests against numpy oracles."""
import numpy as np
import jax.numpy as jnp

from mocopci_tpu import ops
from mocopci_tpu.ops.pallas.fps import farthest_point_sample_pallas


def _np_fps(xyz, npoint):
    """Oracle mirroring the CUDA kernel (sampling_gpu.cu:93-253)."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        mind = np.full(N, 1e10, np.float32)
        last = 0
        for i in range(1, npoint):
            d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            last = int(np.argmax(mind))
            out[b, i] = last
    return out


def test_fps_matches_oracle(rng):
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample_xla(jnp.asarray(xyz), 16))
    np.testing.assert_array_equal(got, _np_fps(xyz, 16))


def test_fps_pallas_interpret_matches_oracle(rng):
    xyz = rng.normal(size=(2, 200, 3)).astype(np.float32)  # non-multiple of 128
    got = np.asarray(
        farthest_point_sample_pallas(jnp.asarray(xyz), 32, interpret=True)
    )
    np.testing.assert_array_equal(got, _np_fps(xyz, 32))


def test_fps_pallas_odd_vreg_width_matches_oracle(rng):
    # npad=384 -> the tree reduction's halving is not 128-aligned and the
    # chunk-fold branch engages (stress-size Ns land here)
    xyz = rng.normal(size=(2, 384, 3)).astype(np.float32)
    got = np.asarray(
        farthest_point_sample_pallas(jnp.asarray(xyz), 24, interpret=True)
    )
    np.testing.assert_array_equal(got, _np_fps(xyz, 24))


def test_fps_pallas_sublane_split_matches_oracle(rng):
    # split layout (default-on): lane-aligned N and few clouds -> each
    # cloud's points spread over s sublane rows with a cross-row
    # roll-butterfly winner tournament.  Small npoint keeps the XLA:CPU
    # interpret compile fast; indices must still be EXACTLY the oracle's on
    # non-degenerate clouds.
    from mocopci_tpu.ops.pallas import fps as fps_mod
    from mocopci_tpu.ops.pallas.fps import _split_factor, set_fps_split

    prev = fps_mod._SPLIT_ENABLED
    set_fps_split(True)
    try:
        for B, N, npt in [(1, 256, 8), (3, 256, 9), (2, 512, 8)]:
            assert _split_factor(B, N) > 1
            xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
            got = np.asarray(
                farthest_point_sample_pallas(jnp.asarray(xyz), npt, interpret=True)
            )
            np.testing.assert_array_equal(got, _np_fps(xyz, npt))
    finally:
        set_fps_split(prev)  # restore the pre-test value; clears split-jit cache


def test_fps_covers_cloud(rng):
    # farthest-point property: no duplicates while npoint <= N distinct pts
    xyz = rng.normal(size=(1, 100, 3)).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample_xla(jnp.asarray(xyz), 50))[0]
    assert len(set(idx.tolist())) == 50


def test_upsample_inverse_distance(rng):
    sparse = rng.normal(size=(1, 10, 3)).astype(np.float32)
    dense = rng.normal(size=(1, 25, 3)).astype(np.float32)
    feat = rng.normal(size=(1, 10, 4)).astype(np.float32)
    got = np.asarray(ops.upsample(jnp.asarray(dense), jnp.asarray(sparse), jnp.asarray(feat)))

    d = np.sqrt(((dense[:, :, None] - sparse[:, None]) ** 2).sum(-1))[0]
    want = np.zeros((25, 4), np.float32)
    for n in range(25):
        nn3 = np.argsort(d[n])[:3]
        w = 1.0 / np.maximum(d[n][nn3], 1e-10)
        w = w / w.sum()
        want[n] = (w[:, None] * feat[0][nn3]).sum(0)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)


def test_upsample_identity_when_same_points(rng):
    xyz = rng.normal(size=(1, 12, 3)).astype(np.float32)
    feat = rng.normal(size=(1, 12, 5)).astype(np.float32)
    got = np.asarray(ops.upsample(jnp.asarray(xyz), jnp.asarray(xyz), jnp.asarray(feat)))
    # nearest neighbour is the point itself with dist ~0 -> weight ~1
    np.testing.assert_allclose(got[0], feat[0], rtol=1e-4, atol=1e-4)


def test_point_warp_zero_flow_is_identity(rng):
    xyz1 = rng.normal(size=(1, 20, 3)).astype(np.float32)
    xyz2 = rng.normal(size=(1, 20, 3)).astype(np.float32)
    flow = np.zeros_like(xyz1)
    got = np.asarray(ops.point_warp(jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(flow)))
    np.testing.assert_allclose(got[0], xyz2[0], atol=1e-5)


def test_point_warp_constant_flow(rng):
    # constant flow field -> every xyz2 point pulled back by the same vector
    xyz1 = rng.normal(size=(1, 50, 3)).astype(np.float32)
    xyz2 = xyz1 + 0.01 * rng.normal(size=(1, 50, 3)).astype(np.float32)
    flow = np.tile(np.array([[0.5, -0.2, 0.1]], np.float32), (50, 1))[None]
    got = np.asarray(ops.point_warp(jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(flow)))
    np.testing.assert_allclose(got[0], xyz2[0] - flow[0], rtol=1e-3, atol=1e-4)


def test_onehot_scatter_matches_loop_scatter(rng):
    # the TPU gather-backward path for C=3 row gathers (fusion pair planes):
    # the Pallas one-hot accumulation must equal the per-batch .at[].add loop
    from mocopci_tpu.ops.pallas.scatter import onehot_scatter_rows

    B, S, N = 2, 2048, 512
    g = rng.normal(size=(B, S, 3)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, S)).astype(np.int32)
    got = np.asarray(
        onehot_scatter_rows(jnp.asarray(g), jnp.asarray(idx), N, interpret=True)
    ).transpose(0, 2, 1)
    want = np.stack(
        [
            np.asarray(
                jnp.zeros((N, 3), jnp.float32).at[jnp.asarray(idx[b])].add(
                    jnp.asarray(g[b])
                )
            )
            for b in range(B)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fps_pyramid_pallas_matches_sequential(rng):
    """Fused pyramid kernel == per-level fps+gather chain, exact indices."""
    from mocopci_tpu.ops.pallas.fps import farthest_point_sample_pyramid_pallas

    xyz = rng.normal(size=(3, 256, 3)).astype(np.float32)
    npoints = (128, 32, 8)
    got = farthest_point_sample_pyramid_pallas(
        jnp.asarray(xyz), npoints, interpret=True
    )
    pc = xyz
    for g, n in zip(got, npoints):
        want = _np_fps(pc, n)
        np.testing.assert_array_equal(np.asarray(g), want)
        pc = np.take_along_axis(pc, want[..., None], axis=1)


def test_fps_pyramid_pallas_split_matches_sequential(rng, monkeypatch):
    """Split-layout pyramid (strided-roll re-split between levels) == chain.

    npoints[0]=132 -> opad 256, so level 1 re-splits the collected planes
    across 2 rows with the strided sublane roll; npoints[1]=16 -> level 2
    runs with s_data=1 (width 128, duplicated chunks)."""
    from mocopci_tpu.ops.pallas import fps as fps_mod

    monkeypatch.setattr(fps_mod, "_SPLIT_MIN_NPOINT", 1)
    prev = fps_mod._SPLIT_ENABLED
    fps_mod.set_fps_split(True)
    try:
        xyz = rng.normal(size=(2, 512, 3)).astype(np.float32)
        assert fps_mod._split_factor(2, 512) == 4
        npoints = (132, 16, 8)
        got = fps_mod.farthest_point_sample_pyramid_pallas(
            jnp.asarray(xyz), npoints, interpret=True
        )
        pc = xyz
        for g, n in zip(got, npoints):
            want = _np_fps(pc, n)
            np.testing.assert_array_equal(np.asarray(g), want)
            pc = np.take_along_axis(pc, want[..., None], axis=1)
    finally:
        fps_mod.set_fps_split(prev)  # restore the pre-test value + clear caches


def test_fps_pyramid_dispatch_cpu_matches_sequential(rng):
    """The public wrapper's CPU path (and tiny-shape fallback) chain-match."""
    xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    npoints = (64, 16)
    got = ops.farthest_point_sample_pyramid(xyz, npoints)
    pc = xyz
    for g, n in zip(got, npoints):
        want = ops.farthest_point_sample(pc, n)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(want))
        pc = ops.gather(pc, want)
    # non-multiple-of-128 N takes the fallback path
    xyz_odd = xyz[:, :200]
    got_odd = ops.farthest_point_sample_pyramid(xyz_odd, (64, 16))
    pc = xyz_odd
    for g, n in zip(got_odd, (64, 16)):
        want = ops.farthest_point_sample(pc, n)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(want))
        pc = ops.gather(pc, want)
