"""Interpret-mode checks of the radix-factorized MXU gather+plane kernel
(ops/pallas/gather_planes.py) against gather-then-build, plus the dispatching
wrapper's gradients (fusion_planes.gather_pair_planes keeps the custom VJP)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocopci_tpu import ops
from mocopci_tpu.ops.pallas.gather_planes import bucket_gather_pair_planes
from mocopci_tpu.ops.pallas.fusion_planes import (
    build_pair_planes_xla,
    gather_pair_planes,
)


def _case(G, M, N, k2, seed=0):
    r = np.random.default_rng(seed)
    tab = jnp.asarray(r.normal(size=(G, M, 3)).astype(np.float32) * 8)
    idx = jnp.asarray(r.integers(0, M, size=(G, N * k2)).astype(np.int32))
    p1t = jnp.asarray(r.normal(size=(G, 3, N)).astype(np.float32) * 8)
    return tab, idx, p1t


@pytest.mark.parametrize("G,M,N,k2", [(2, 256, 128, 3), (1, 128, 128, 1),
                                      (2, 640, 256, 2)])
def test_forward_matches_gather_then_build(G, M, N, k2):
    tab, idx, p1t = _case(G, M, N, k2)
    x = bucket_gather_pair_planes(tab, idx, p1t, True)
    nbr = ops.gather(tab, idx)
    x_t = build_pair_planes_xla(nbr, p1t)
    # three-term Dekker split reconstructs f32 to <= 1 ulp (bit-exact on the
    # TPU MXU; interpret-mode CPU matmuls round once more)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_t),
                               rtol=1e-6, atol=1e-5)


def test_extreme_coordinates_stay_exact():
    """Large-magnitude and tiny coordinates must survive the bf16 split."""
    G, M, N = 1, 128, 128
    r = np.random.default_rng(1)
    vals = np.concatenate([
        r.normal(size=(64, 3)) * 1e4,
        r.normal(size=(64, 3)) * 1e-4,
    ]).astype(np.float32)
    tab = jnp.asarray(vals[None])
    idx = jnp.asarray(r.integers(0, M, size=(G, N)).astype(np.int32))
    p1t = jnp.zeros((G, 3, N), jnp.float32)
    x = bucket_gather_pair_planes(tab, idx, p1t, True)
    nbr = ops.gather(tab, idx)
    x_t = build_pair_planes_xla(nbr, p1t)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_t), rtol=2e-7)
