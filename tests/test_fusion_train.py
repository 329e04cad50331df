"""Train-path fusion head: transposed lane-dense program vs the reference
formulation (channels-last dense + per-group BN + neighbour blend).

Guards the round-3 layout rewrite of ``MultiFrameEstimator._fusion``'s train
branch: values, gradients, and the BN EMA updates must match the
straightforward program the reference defines (``mocopci.py:798-819``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocopci_tpu import ops
from mocopci_tpu.config import tiny_model_config
from mocopci_tpu.models import MoCoPCI


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(64)
    model = MoCoPCI(cfg)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    x1 = jnp.asarray(r.normal(size=(2, cfg.npoints, 3)).astype(np.float32))
    x2 = jnp.asarray(x1 + 0.05 * r.normal(size=(2, cfg.npoints, 3)).astype(np.float32))
    variables = model.init({"params": rng, "dropout": rng}, x1, x2, train=True)
    F = cfg.n_frames
    p1 = jnp.asarray(r.normal(size=(F * 2, cfg.npoints, 3)).astype(np.float32))
    p2 = jnp.asarray(p1 + 0.02 * r.normal(size=(F * 2, cfg.npoints, 3)).astype(np.float32))
    return cfg, model, variables, p1, p2


def _oracle(cfg, params, stats, p1, p2, n_groups):
    """The reference train-path program, channels-last (pre-rewrite code)."""
    k = cfg.fusion_k
    idx_self = ops.knn(k, p1, p1)
    idx_cross = ops.knn(k, p2, p1)
    idx = jnp.concatenate([idx_self, idx_cross], axis=-1)
    neighbor = ops.group(p2, idx)
    fb = neighbor.shape[0]
    resi = neighbor - p1[:, :, None, :]
    dist = jnp.sqrt(jnp.sum(resi * resi, axis=-1, keepdims=True) + 1e-20)
    h = jnp.concatenate([resi, dist], axis=-1)
    est = params["estimator"]
    sest = stats["estimator"]
    new_stats = {}
    for i in range(3):
        d = est[f"fusion_conv{i}"]
        b = est[f"fusion_bn{i}"]
        s = sest[f"fusion_bn{i}"]
        h = h @ d["kernel"] + d["bias"]
        hg = h.reshape((n_groups, fb // n_groups) + h.shape[1:])
        axes = tuple(range(1, hg.ndim - 1))
        mean = jnp.mean(hg, axis=axes)
        var = jnp.mean(
            (hg - mean.reshape((n_groups,) + (1,) * len(axes) + (-1,))) ** 2,
            axis=axes,
        )
        mb = mean.reshape((n_groups,) + (1,) * len(axes) + (-1,))
        vb = var.reshape((n_groups,) + (1,) * len(axes) + (-1,))
        hg = (hg - mb) * jax.lax.rsqrt(vb + 1e-3)
        h = (hg * b["scale"] + b["bias"]).reshape((fb,) + h.shape[1:])
        h = jax.nn.relu(h)
        n_el = int(np.prod([hg.shape[a] for a in axes]))
        unbiased = var * (n_el / max(n_el - 1, 1))
        new_stats[f"fusion_bn{i}"] = {
            "mean": 0.9 * s["mean"] + 0.1 * jnp.mean(mean, axis=0),
            "var": 0.9 * s["var"] + 0.1 * jnp.mean(unbiased, axis=0),
        }
    h = jnp.max(h, axis=-1)
    w = jax.nn.softmax(h, axis=-1)
    return jnp.sum(w[..., None] * neighbor, axis=2), new_stats


def _run_fusion(model, variables, p1, p2, n_groups):
    def f(m, a, b):
        return m.estimator._fusion(a, b, n_groups, True)

    return model.apply(variables, p1, p2, method=f, mutable=["batch_stats"])


def test_train_fusion_matches_reference_program(setup):
    cfg, model, variables, p1, p2 = setup
    got, mut = _run_fusion(model, variables, p1, p2, cfg.n_frames)
    want, want_stats = _oracle(
        cfg, variables["params"], variables["batch_stats"], p1, p2, cfg.n_frames
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    for i in range(3):
        for key in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"]["estimator"][f"fusion_bn{i}"][key]),
                np.asarray(want_stats[f"fusion_bn{i}"][key]),
                rtol=2e-4, atol=1e-6,
            )


def test_train_fusion_gradients_match(setup):
    cfg, model, variables, p1, p2 = setup

    def loss_new(a, b):
        return jnp.sum(_run_fusion(model, variables, a, b, cfg.n_frames)[0] ** 2)

    def loss_ref(a, b):
        out, _ = _oracle(
            cfg, variables["params"], variables["batch_stats"], a, b, cfg.n_frames
        )
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_new, argnums=(0, 1))(p1, p2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(p1, p2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
