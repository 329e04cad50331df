"""Radix-bucket MXU scatter-add kernel (ops/pallas/scatter_bucket.py) in
interpret mode, against numpy ``np.add.at`` oracles — the gradient semantics
of the reference's atomicAdd scatters (``group_points_gpu.cu:24``,
``sampling_gpu.cu:60``), deterministic here.

Note on ``split=True`` tolerances: interpret mode emulates the two bf16
matmuls with bf16 ACCUMULATION (CPU lowering), so errors are ~1e-3 relative;
the real MXU accumulates these products in f32 and measures ~3e-6 relative
at the production fusion-gather shape (see module docstring).  The f32 path
(``split=False``) is exact everywhere and pins the kernel's structure.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mocopci_tpu.ops.pallas.scatter_bucket import (
    bucket_scatter_add,
    bucket_scatter_add_planes,
)


def _oracle(v, idx, n):
    G, S, C = v.shape
    ref = np.zeros((G, n, C), np.float64)
    for g in range(G):
        m = (idx[g] >= 0) & (idx[g] < n)
        np.add.at(ref[g], idx[g][m], v[g][m])
    return ref


@pytest.mark.parametrize(
    "S,N,C",
    [
        (1024, 256, 3),   # exact tile multiple
        (3000, 256, 3),   # padding path (S % ts != 0)
        (2048, 256, 1),   # single channel
        (1500, 384, 4),   # C=4, non-power-of-two N (multiple of 128)
        (700, 128, 2),    # single radix bucket (H*C small -> ts > S)
        (1024, 256, 64),  # wide channels (cross/bid/fe gather backwards)
        (900, 384, 35),   # wide C, non-power-of-two C and N
    ],
)
def test_matches_scatter_oracle_f32(rng, S, N, C):
    G = 2
    v = rng.normal(size=(G, S, C)).astype(np.float32)
    idx = rng.integers(0, N, size=(G, S)).astype(np.int32)
    out = np.asarray(
        bucket_scatter_add(jnp.asarray(v), jnp.asarray(idx), N, False, True)
    )
    np.testing.assert_allclose(out, _oracle(v, idx, N), rtol=1e-5, atol=1e-5)


def test_out_of_range_targets_dropped(rng):
    G, S, N, C = 2, 1024, 256, 3
    v = rng.normal(size=(G, S, C)).astype(np.float32)
    idx = rng.integers(-40, N + 40, size=(G, S)).astype(np.int32)
    out = np.asarray(
        bucket_scatter_add(jnp.asarray(v), jnp.asarray(idx), N, False, True)
    )
    np.testing.assert_allclose(out, _oracle(v, idx, N), rtol=1e-5, atol=1e-5)


def test_split_precision_close(rng):
    G, S, N, C = 1, 4096, 512, 3
    v = rng.normal(size=(G, S, C)).astype(np.float32)
    idx = rng.integers(0, N, size=(G, S)).astype(np.int32)
    out = np.asarray(
        bucket_scatter_add(jnp.asarray(v), jnp.asarray(idx), N, True, True)
    )
    ref = _oracle(v, idx, N)
    # loose: interpret emulates bf16 accumulation (see module docstring)
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 5e-3, err


def test_planes_equals_rows(rng):
    G, S, N, C = 2, 512, 128, 3
    v = rng.normal(size=(G, C, S)).astype(np.float32)
    idx = rng.integers(0, N, size=(G, S)).astype(np.int32)
    a = bucket_scatter_add_planes(jnp.asarray(v), jnp.asarray(idx), N, False, True)
    b = bucket_scatter_add(
        jnp.asarray(v.transpose(0, 2, 1)), jnp.asarray(idx), N, False, True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
