"""Chamfer and approx-EMD tests: oracles, golden values, gradients."""
import numpy as np
import jax
import jax.numpy as jnp

from mocopci_tpu import ops


def _np_chamfer(a, b):
    d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    return (d.min(2).mean(1) + d.min(1).mean(1)).mean()


def test_chamfer_matches_oracle(rng):
    a = rng.normal(size=(3, 31, 3)).astype(np.float32)
    b = rng.normal(size=(3, 17, 3)).astype(np.float32)
    got = float(ops.chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_chamfer(a, b), rtol=1e-5)


def test_chamfer_blocked_matches_dense(rng):
    a = rng.normal(size=(2, 64, 3)).astype(np.float32)
    b = rng.normal(size=(2, 64, 3)).astype(np.float32)
    dense = float(ops.chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    blocked = float(ops.chamfer_distance_blocked(jnp.asarray(a), jnp.asarray(b), 16))
    np.testing.assert_allclose(blocked, dense, rtol=1e-5)


def test_chamfer_zero_for_identical(rng):
    a = rng.normal(size=(1, 20, 3)).astype(np.float32)
    assert float(ops.chamfer_distance(jnp.asarray(a), jnp.asarray(a))) < 1e-10


def test_chamfer_grad_finite(rng):
    a = jnp.asarray(rng.normal(size=(1, 12, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 12, 3)).astype(np.float32))
    g = jax.grad(lambda x: ops.chamfer_distance(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    # numerical check of one coordinate
    eps = 1e-3
    e = jnp.zeros_like(a).at[0, 3, 1].set(eps)
    num = (ops.chamfer_distance(a + e, b) - ops.chamfer_distance(a - e, b)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 3, 1]), float(num), rtol=1e-2, atol=1e-4)


def _np_approx_match(xyz1, xyz2):
    """Oracle mirroring emd_kernel.cu:30-162."""
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        ml, mr = 1.0, float(n // m)
    else:
        ml, mr = float(m // n), 1.0
    match = np.zeros((B, m, n), np.float32)
    d = ((xyz1[:, :, None] - xyz2[:, None]) ** 2).sum(-1).astype(np.float32)
    for b in range(B):
        remainL = np.full(n, ml, np.float32)
        remainR = np.full(m, mr, np.float32)
        for j in list(range(7, -2, -1)):
            level = -(4.0 ** j) if j > -2 else 0.0
            K = np.exp(np.float32(level) * d[b], dtype=np.float32)
            suml = K @ remainR + 1e-9
            ratioL = remainL / suml
            sumr = (K.T @ ratioL) * remainR
            cons = np.minimum(remainR / (sumr + 1e-9), 1.0)
            ratioR = cons * remainR
            remainR = np.maximum(0.0, remainR - sumr)
            W = K * ratioL[:, None] * ratioR[None, :]
            match[b] += W.T
            remainL = np.maximum(0.0, remainL - W.sum(1))
    return match.astype(np.float32)


def test_approx_match_matches_oracle(rng):
    a = rng.normal(size=(2, 12, 3)).astype(np.float32)
    b = rng.normal(size=(2, 12, 3)).astype(np.float32)
    got = np.asarray(ops.approx_match(jnp.asarray(a), jnp.asarray(b)))
    want = _np_approx_match(a, b)
    # Both sides are fp32 exp-annealing chains; the early levels use
    # exp(-16384·d), where a 1-ulp difference flips which capacity clamps hit,
    # so individual entries can drift.  Compare entries with slack and the
    # resulting transport cost tightly.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=3e-3)
    d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    cost_got = np.einsum("bmn,bnm->b", got, d)
    cost_want = np.einsum("bmn,bnm->b", want, d)
    np.testing.assert_allclose(cost_got, cost_want, rtol=1e-2)


def test_emd_golden_two_points():
    """Golden case from the reference's own check (models/EMD/test_emd_loss.py):
    clouds {(-1,0,0),(1,0,0)} vs {(-1+eps,0,0),(1-eps,0,0)} match 1:1, cost =
    2*eps^2 per cloud pair."""
    eps = 0.1
    p1 = jnp.asarray(np.array([[[-1, 0, 0], [1, 0, 0]]], np.float32))
    p2 = jnp.asarray(np.array([[[-1 + eps, 0, 0], [1 - eps, 0, 0]]], np.float32))
    cost = float(ops.earth_mover_distance(p1, p2)[0])
    np.testing.assert_allclose(cost, 2 * eps * eps, rtol=1e-3)


def test_emd_zero_identical(rng):
    a = jnp.asarray(rng.normal(size=(1, 16, 3)).astype(np.float32))
    assert float(ops.earth_mover_distance(a, a)[0]) < 1e-4


def test_emd_grad_matches_match_formula(rng):
    a = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    g1, g2 = jax.grad(lambda x, y: jnp.sum(ops.earth_mover_distance(x, y)), (0, 1))(a, b)
    match = np.asarray(ops.approx_match(a, b))[0]
    an, bn = np.asarray(a)[0], np.asarray(b)[0]
    want1 = 2 * (match.sum(0)[:, None] * an - match.T @ bn)
    want2 = 2 * (match.sum(1)[:, None] * bn - match @ an)
    np.testing.assert_allclose(np.asarray(g1)[0], want1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2)[0], want2, rtol=1e-3, atol=1e-4)


def test_emd_metric_normalisation(rng):
    a = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    want = float(jnp.mean(ops.earth_mover_distance(a, b))) / 16
    np.testing.assert_allclose(float(ops.emd(a, b)), want, rtol=1e-6)


def test_reference_named_utils(rng):
    """models/utils.py-compatible channels-first wrappers."""
    from mocopci_tpu import utils

    a = rng.normal(size=(2, 3, 20)).astype(np.float32)
    b = rng.normal(size=(2, 3, 20)).astype(np.float32)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    want_cd = float(ops.chamfer_distance(ja.transpose(0, 2, 1), jb.transpose(0, 2, 1)))
    np.testing.assert_allclose(float(utils.chamfer_loss(ja, jb)), want_cd, rtol=1e-6)
    np.testing.assert_allclose(
        float(utils.EMD(ja, jb)),
        float(ops.emd(ja.transpose(0, 2, 1), jb.transpose(0, 2, 1))),
        rtol=1e-6,
    )
    d = np.asarray(utils.pdist2squared(ja, jb))
    want = ((a.transpose(0, 2, 1)[:, :, None] - b.transpose(0, 2, 1)[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, want, rtol=1e-3, atol=1e-3)
    sched = utils.ClippedStepLR(1e-3, 15, 5e-5, 0.8)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(15)), 8e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10000)), 5e-5, rtol=1e-6)


class TestBlockedEMD:
    """Memory-bounded EMD (separable-match representation) vs the dense scan."""

    def _clouds(self, rng, n=300, m=150):
        import jax.numpy as jnp

        x1 = jnp.asarray(rng.normal(size=(2, n, 3)).astype(np.float32))
        x2 = jnp.asarray(rng.normal(size=(2, m, 3)).astype(np.float32))
        return x1, x2

    def test_cost_matches_dense(self, rng):
        import importlib

        E = importlib.import_module("mocopci_tpu.ops.emd")
        x1, x2 = self._clouds(rng)
        dense = np.asarray(E.earth_mover_distance(x1, x2))
        blocked = np.asarray(E.earth_mover_distance_blocked(x1, x2))
        np.testing.assert_allclose(dense, blocked, rtol=1e-4)

    def test_cost_matches_dense_chunked(self, rng):
        import importlib

        E = importlib.import_module("mocopci_tpu.ops.emd")
        x1, x2 = self._clouds(rng)
        dense = np.asarray(E.earth_mover_distance(x1, x2))
        old = E._EMD_CHUNK
        try:
            E._EMD_CHUNK = 64  # force the lax.map query-chunk path
            blocked = np.asarray(E.earth_mover_distance_blocked(x1, x2))
        finally:
            E._EMD_CHUNK = old
        np.testing.assert_allclose(dense, blocked, rtol=1e-4)

    def test_gradients_match_dense(self, rng):
        import importlib

        import jax
        import jax.numpy as jnp

        E = importlib.import_module("mocopci_tpu.ops.emd")
        x1, x2 = self._clouds(rng, 120, 120)
        g_d = jax.grad(lambda a, b: jnp.sum(E.earth_mover_distance(a, b)), (0, 1))(x1, x2)
        g_b = jax.grad(
            lambda a, b: jnp.sum(E.earth_mover_distance_blocked(a, b)), (0, 1)
        )(x1, x2)
        for d, b in zip(g_d, g_b):
            scale = max(1.0, float(np.abs(np.asarray(d)).max()))
            assert np.abs(np.asarray(d) - np.asarray(b)).max() < 1e-3 * scale

    def test_emd_metric_dispatches_blocked(self, rng, monkeypatch):
        import importlib

        E = importlib.import_module("mocopci_tpu.ops.emd")
        # fresh shape each call: jax.jit caches per shape, so the patched
        # dispatch limit is re-read at trace time
        x1, x2 = self._clouds(rng, 299, 151)
        dense = np.asarray(E.emd(x1, x2))
        monkeypatch.setattr(E, "_EMD_DENSE_LIMIT", 1)  # force blocked dispatch
        blocked = np.asarray(E.emd(x1[:, :297], x2))
        dense2 = np.asarray(E.earth_mover_distance(x1[:, :297], x2))
        np.testing.assert_allclose(
            blocked, np.mean(dense2) / 297, rtol=1e-4
        )
        assert np.isfinite(dense)


def test_emd_fast_exp_tolerance(rng):
    """Fast-exp EMD (set_emd_fast) shifts the metric by < 0.1% on both the
    dense and the blocked path, and the fast exp itself is accurate to the
    documented 1.9e-4 bound."""
    import sys

    import mocopci_tpu.ops.emd  # noqa: F401 — ensure module is loaded

    E = sys.modules["mocopci_tpu.ops.emd"]

    E.set_emd_fast(True)
    try:
        x = jnp.asarray(-np.logspace(-6, 2.2, 2000, dtype=np.float32))
        got = np.asarray(E._exp_kernel(x))
        want = np.exp(np.asarray(x))
        nz = want > 1e-30
        assert np.abs(got[nz] / want[nz] - 1).max() < 2.5e-4
        # deep-underflow tail flushes to exactly 0, no bitcast garbage
        assert float(E._exp_kernel(jnp.float32(-1e8))) == 0.0
    finally:
        E.set_emd_fast(False)

    worst = 0.0
    for trial in range(3):
        a = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32) * 10)
        b = jnp.asarray(
            a + rng.normal(size=(2, 512, 3)).astype(np.float32) * 0.5
        )
        E.set_emd_fast(False)
        exact = np.asarray(E.earth_mover_distance(a, b))
        exact_blk = np.asarray(E._emd_blocked(a, b))
        E.set_emd_fast(True)
        try:
            fast = np.asarray(E.earth_mover_distance(a, b))
            fast_blk = np.asarray(E._emd_blocked(a, b))
        finally:
            E.set_emd_fast(False)
        worst = max(worst, float(np.abs(fast / exact - 1).max()),
                    float(np.abs(fast_blk / exact_blk - 1).max()))
    assert worst < 1e-3, worst  # measured ~4e-5; 0.1% is the contract
