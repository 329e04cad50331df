"""Train / eval steps.

Replaces the reference's per-batch Python body (``train.py:124-168``) with one
jitted, mesh-sharded XLA program: forward, loss, backward, global-norm clip,
AdamW update, batch-stat update.  The reference's explicit
``torch.cuda.synchronize()`` (``train.py:133``) and pinned-memory staging
become no-ops under JAX's async dispatch.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from mocopci_tpu import ops
from mocopci_tpu.config import ModelConfig, TrainConfig
from mocopci_tpu.models import MoCoPCI
from mocopci_tpu.training.loss import mocopci_loss
from mocopci_tpu.training.schedule import make_lr_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Global-norm clip (2.0, ref ``train.py:166``) + AdamW with clipped StepLR.

    Wrapped in ``optax.flatten``: the update then runs on ONE concatenated
    vector instead of ~150 parameter leaves — each leaf otherwise becomes its
    own handful of sub-100µs XLA fusions, pure per-op overhead on TPU
    (the B=2 train-step trace shows a multi-ms tail of such ops).
    """
    return optax.flatten(_make_optimizer_inner(cfg, steps_per_epoch))


def _make_optimizer_inner(cfg: TrainConfig, steps_per_epoch: int):
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            make_lr_schedule(cfg, steps_per_epoch),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    steps_per_epoch: int,
    rng: Optional[jax.Array] = None,
) -> Tuple[MoCoPCI, TrainState]:
    model = MoCoPCI(model_cfg)
    rng = jax.random.PRNGKey(train_cfg.seed) if rng is None else rng
    dummy = jnp.zeros((1, model_cfg.npoints, 3), jnp.float32)
    # jit the init: eager initialisation executes the whole forward op-by-op
    # (minutes at full size); compiled it is seconds
    variables = jax.jit(
        lambda d: model.init({"params": rng, "dropout": rng}, d, d, train=True)
    )(dummy)
    tx = make_optimizer(train_cfg, steps_per_epoch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return model, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def _grads_and_stats(
    apply_fn,
    params,
    batch_stats,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
):
    """Gradients + loss aux + updated batch stats for one (global or shard-
    local) batch, honouring ``train_cfg.grad_accum``.  Shared by the
    declarative-DP ``train_step`` and the shard_map executor."""

    def loss_fn(params, batch_stats, mb, mb_rng):
        result, mut = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            mb["pc1"],
            mb["pc2"],
            train=True,
            deterministic=False,
            rngs={"dropout": mb_rng},
            mutable=["batch_stats"],
        )
        total, aux = mocopci_loss(result, mb["gt"], model_cfg, train_cfg)
        return total, (aux, mut)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    K = train_cfg.grad_accum
    if K <= 1:
        (_, (aux, mut)), grads = grad_fn(params, batch_stats, batch, rng)
    else:
        # split the global batch into K sequential micro-batches; mean-combine
        # the gradients so one optimizer update sees the full-batch gradient.
        # Activation memory then scales with B/K, not B — together with the
        # reference recipe's global batch 2 this reproduces that recipe on a
        # single chip at stress sizes (DESIGN.md §3c).  BatchNorm batch stats
        # are computed per micro-batch and chained through the scan (the EMA
        # update applies K times per step — the same semantics as K plain
        # steps, and the standard grad-accumulation BN behaviour).
        B = batch["pc1"].shape[0]
        assert B % K == 0, f"batch size {B} not divisible by grad_accum {K}"
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((K, B // K) + x.shape[1:]), batch
        )
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(carry, mb_and_rng):
            batch_stats, acc = carry
            mb, mb_rng = mb_and_rng
            (_, (aux, mut)), g = grad_fn(params, batch_stats, mb, mb_rng)
            acc = jax.tree_util.tree_map(jnp.add, acc, g)
            return (mut["batch_stats"], acc), aux

        rngs = jax.random.split(rng, K)
        (bs_final, grads), aux_k = jax.lax.scan(
            body, (batch_stats, zero_grads), (micro, rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / K, grads)
        aux = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), aux_k)
        mut = {"batch_stats": bs_final}
    return grads, aux, mut["batch_stats"]


@functools.partial(jax.jit, static_argnums=(3, 4))
def train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """batch: {'pc1': (B,N,3), 'pc2': (B,N,3), 'gt': (B,F,N,3)}."""
    grads, aux, new_bs = _grads_and_stats(
        state.apply_fn, state.params, state.batch_stats, batch, rng,
        model_cfg, train_cfg,
    )
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_bs,
        opt_state=new_opt_state,
    )
    aux["grad_norm"] = optax.global_norm(grads)
    return new_state, aux


def make_sharded_train_step(mesh, apply_fn, model_cfg: ModelConfig,
                            train_cfg: TrainConfig):
    """Explicit-SPMD train step: shard_map over the ``data`` mesh axis.

    The declarative path (plain jit + sharded batch) leaves partitioning to
    XLA's SPMD pass — which cannot partition the Pallas kernels (opaque
    custom calls) or the flat batch-folded gathers, so on a real multi-chip
    mesh it all-gathers their operands and replicates the downstream compute
    (measured: runs/dp_device_cost_256.json — per-device flops grow 1.7× from
    1→8 devices).  Under shard_map each device runs the UNMODIFIED
    single-chip program on its batch shard — every Pallas kernel and flat
    gather works verbatim — and the only collectives are the explicit ones
    here: pmean of gradients, loss aux, and batch-stat updates.

    Semantics: FrameBatchNorm computes statistics per batch item (reference
    contract — ``nn/basic.py``), so nearly the whole forward has no
    cross-batch coupling and matches the single-device step up to fp
    reduction order.  The one exception is the fusion head's per-frame-group
    BatchNorm (cross-batch): under shard_map its batch statistics are
    per-shard — EXACTLY ``torch.nn.DataParallel``'s per-replica BN, i.e. the
    semantics the reference itself trains with on multi-GPU (measured
    deviation vs the global-stats step: ~4e-4 relative on the loss at 8×1).
    Running stats are pmean'd across shards each step.  The per-shard
    dropout rng is folded with the shard index.

    Returns a jitted ``step(state, batch, rng) -> (state, aux)`` closed over
    the mesh; batch must be shard_batch'ed (leading axis over ``data``).
    """
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape["data"]

    def shard_fn(params, batch_stats, mb, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        grads, aux, bs = _grads_and_stats(
            apply_fn, params, batch_stats, mb, rng, model_cfg, train_cfg,
        )
        pm = functools.partial(jax.lax.pmean, axis_name="data")
        return (
            jax.tree_util.tree_map(pm, grads),
            jax.tree_util.tree_map(pm, aux),
            jax.tree_util.tree_map(pm, bs),
        )

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, batch, rng):
        grads, aux, new_bs = sharded(state.params, state.batch_stats, batch, rng)
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    assert n_data >= 1
    return step


@functools.partial(jax.jit, static_argnums=(2, 3))
def eval_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    with_emd: bool = True,
) -> Dict[str, jax.Array]:
    """One-shot inference + per-frame CD (and EMD) — the *intended* semantics of
    the reference eval loop (``test.py:79-98``), running the network once per
    sample instead of the shipped 3×."""
    result = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["pc1"],
        batch["pc2"],
        train=False,
        deterministic=True,
    )
    out = result["out"]                                     # (B, F, N, 3)
    B, F, N, _ = out.shape
    # CD: fold the frame axis into the batch axis — one launch for all F
    # frames (independent per row, so values are identical; measured 4.6 →
    # 3.6 ms on v5e).  EMD stays per-frame: batching the annealing matvecs
    # to B·F=3 makes the dot_general ~40% SLOWER than three sequential B=1
    # runs regardless of chunking (72 vs 52 ms measured), so the "fold EMD
    # too" idea is rejected by measurement.
    pred = out.reshape(B * F, N, 3)
    gt = batch["gt"].reshape(B * F, N, 3)
    cd = ops.chamfer_distance_per_sample(pred, gt).reshape(B, F)
    metrics = {}
    for j in range(F):
        metrics[f"cd_{j}"] = cd[:, j]
        if with_emd:
            metrics[f"emd_{j}"] = (
                ops.earth_mover_distance_auto(out[:, j], batch["gt"][:, j]) / N
            )
    return metrics
