"""Training-stack tests: loss contract, schedule, one train step, overfit,
checkpoint round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocopci_tpu.config import TrainConfig, tiny_model_config
from mocopci_tpu.training import (
    CheckpointManager,
    create_train_state,
    eval_step,
    make_lr_schedule,
    mocopci_loss,
    train_step,
)
from mocopci_tpu.training.loss import gt_pyramid


def _tiny_batch(cfg, B=2, key=0):
    rng = np.random.default_rng(key)
    pc1 = rng.normal(size=(B, cfg.npoints, 3)).astype(np.float32)
    flow = 0.3 * rng.normal(size=(B, 1, 3)).astype(np.float32)
    pc2 = pc1 + flow
    gt = np.stack([pc1 + flow * t for t in (0.25, 0.5, 0.75)], axis=1)
    return {
        "pc1": jnp.asarray(pc1),
        "pc2": jnp.asarray(pc2),
        "gt": jnp.asarray(gt),
    }


def test_lr_schedule_matches_reference():
    cfg = TrainConfig(lr=1e-3, lr_step=15, lr_gamma=0.8, lr_clip=5e-5)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(10 * 14)) == pytest.approx(1e-3)          # epoch 14
    assert float(sched(10 * 15)) == pytest.approx(8e-4)          # epoch 15
    assert float(sched(10 * 45)) == pytest.approx(1e-3 * 0.8**3)
    assert float(sched(10 * 399)) == pytest.approx(
        max(1e-3 * 0.8 ** (399 // 15), 5e-5)
    )
    assert float(sched(10 * 2000)) == pytest.approx(5e-5)        # clipped


def test_gt_pyramid_sizes():
    cfg = tiny_model_config(128)
    gt = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 128, 3)), jnp.float32)
    pyr = gt_pyramid(gt, cfg)
    assert [p.shape[2] for p in pyr] == [128, *cfg.pyramid[:3]]


def test_train_step_decreases_loss_overfit():
    cfg = tiny_model_config(64)
    tcfg = TrainConfig(lr=1e-3, batch_size=2, seed=0)
    _, state = create_train_state(cfg, tcfg, steps_per_epoch=100)
    batch = _tiny_batch(cfg)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(40):
        rng, sub = jax.random.split(rng)
        state, aux = train_step(state, batch, sub, cfg, tcfg)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    # overfit on one batch: loss at the end well below the start
    assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:3]), losses


def test_eval_step_metrics_finite():
    cfg = tiny_model_config(64)
    tcfg = TrainConfig()
    _, state = create_train_state(cfg, tcfg, steps_per_epoch=1)
    batch = _tiny_batch(cfg)
    m = eval_step(state, batch, cfg, True)
    assert set(m) == {"cd_0", "cd_1", "cd_2", "emd_0", "emd_1", "emd_2"}
    for v in m.values():
        assert np.isfinite(np.asarray(v)).all()


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_model_config(64)
    tcfg = TrainConfig()
    _, state = create_train_state(cfg, tcfg, steps_per_epoch=1)
    batch = _tiny_batch(cfg)
    state, _ = train_step(state, batch, jax.random.PRNGKey(1), cfg, tcfg)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state)
    assert mgr.latest_epoch() == 0

    _, fresh = create_train_state(cfg, tcfg, steps_per_epoch=1, rng=jax.random.PRNGKey(42))
    restored = mgr.restore(fresh)
    mgr.close()

    lhs = jax.tree_util.tree_leaves(state.params)
    rhs = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(lhs, rhs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
