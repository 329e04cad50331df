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


def test_grad_accum_matches_full_batch_on_duplicated_sample():
    """accum K=2 over micro-batches [X],[X] == one B=2 step on [X, X].

    Duplicating the sample makes BatchNorm batch statistics identical between
    the B=2 batch and each B=1 micro-batch, so the equivalence is exact up to
    fp reduction order (BN's EMA applies twice under accumulation — batch
    stats are compared against a twice-applied EMA of the same stats).
    """
    import dataclasses

    # zero the dropout rates: the full-batch and accumulation paths fold the
    # dropout rng differently (per-batch vs per-micro-batch), so equivalence
    # is only defined for the dropout-free forward
    cfg = dataclasses.replace(
        tiny_model_config(64), attn_drop=0.0, proj_drop=0.0, drop_path=0.0
    )
    batch1 = _tiny_batch(cfg, B=1, key=0)
    batch2 = {k: jnp.concatenate([v, v], axis=0) for k, v in batch1.items()}
    rng = jax.random.PRNGKey(7)

    tcfg_full = TrainConfig(lr=1e-3, batch_size=2, grad_accum=1)
    tcfg_acc = TrainConfig(lr=1e-3, batch_size=2, grad_accum=2)

    _, s0 = create_train_state(cfg, tcfg_full, steps_per_epoch=1)
    s_full, aux_full = train_step(s0, batch2, rng, cfg, tcfg_full)
    s_acc, aux_acc = train_step(s0, batch2, rng, cfg, tcfg_acc)

    # same loss (micro losses are means over identical samples)
    np.testing.assert_allclose(
        float(aux_acc["loss"]), float(aux_full["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(aux_acc["grad_norm"]), float(aux_full["grad_norm"]), rtol=2e-4
    )
    # leaf-wise gradient equivalence, computed outside the optimizer: a fresh
    # AdamW step amplifies fp noise on near-zero grads to ±lr (update ≈
    # lr·sign(g) at step 1), so comparing post-update params would be
    # ill-conditioned — the contract is about the GRADIENT the optimizer sees
    def grads_of(tcfg, batch, r):
        def f(p):
            result, mut = s0.apply_fn(
                {"params": p, "batch_stats": s0.batch_stats},
                batch["pc1"], batch["pc2"], train=True, deterministic=False,
                rngs={"dropout": r}, mutable=["batch_stats"],
            )
            from mocopci_tpu.training.loss import mocopci_loss as _l

            total, _ = _l(result, batch["gt"], cfg, tcfg)
            return total

        return jax.grad(f)(s0.params)

    g_full = grads_of(tcfg_full, batch2, rng)
    g_micro = grads_of(tcfg_acc, batch1, jax.random.split(rng, 2)[0])
    for f, a in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_micro)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f), rtol=5e-3,
                                   atol=1e-5)


def test_grad_accum_mean_of_micro_grads():
    """accum grads == mean of the two manual micro-grads (definition check),
    with the second micro-grad evaluated at the first micro-batch's updated
    batch_stats — the documented sequential-chaining semantics."""
    import optax
    from mocopci_tpu.training.loss import mocopci_loss as _loss

    cfg = tiny_model_config(64)
    tcfg = TrainConfig(lr=1e-3, batch_size=2, grad_accum=2)
    ba = _tiny_batch(cfg, B=2, key=1)
    rng = jax.random.PRNGKey(3)
    _, s0 = create_train_state(cfg, tcfg, steps_per_epoch=1)

    def grad_of(params, batch_stats, mb, mb_rng):
        def f(p):
            result, mut = s0.apply_fn(
                {"params": p, "batch_stats": batch_stats},
                mb["pc1"], mb["pc2"], train=True, deterministic=False,
                rngs={"dropout": mb_rng}, mutable=["batch_stats"],
            )
            total, _ = _loss(result, mb["gt"], cfg, tcfg)
            return total, mut
        (_, mut), g = jax.value_and_grad(f, has_aux=True)(params)
        return g, mut["batch_stats"]

    mb = {k: v[:1] for k, v in ba.items()}
    mb2 = {k: v[1:] for k, v in ba.items()}
    r1, r2 = jax.random.split(rng, 2)
    g1, bs1 = grad_of(s0.params, s0.batch_stats, mb, r1)
    g2, _ = grad_of(s0.params, bs1, mb2, r2)
    want = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)

    # reproduce train_step's accumulation result via its grad_norm aux
    _, aux = train_step(s0, ba, rng, cfg, tcfg)
    np.testing.assert_allclose(
        float(aux["grad_norm"]), float(optax.global_norm(want)), rtol=2e-4
    )


def test_remat_train_step_matches_no_remat():
    """cfg.remat changes memory scheduling, not values: one train step with
    and without decoder rematerialization produces the same loss and the
    same gradients (same program, recomputed activations)."""
    import dataclasses

    cfg = tiny_model_config(64)
    cfg_r = dataclasses.replace(cfg, remat=True)
    tcfg = TrainConfig(lr=1e-3, batch_size=2)
    ba = _tiny_batch(cfg, B=2, key=2)
    rng = jax.random.PRNGKey(11)

    _, s0 = create_train_state(cfg, tcfg, steps_per_epoch=1)
    _, aux = train_step(s0, ba, rng, cfg, tcfg)
    # remat wrappers do not change parameter structure, so s0 is reusable
    _, aux_r = train_step(s0, ba, rng, cfg_r, tcfg)
    np.testing.assert_allclose(float(aux_r["loss"]), float(aux["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(aux_r["grad_norm"]),
                               float(aux["grad_norm"]), rtol=1e-4)
