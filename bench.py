"""Benchmark: interpolated frame-pairs/sec/chip (the BASELINE.json north star),
plus the training-step and EMD-at-scale numbers the reference's workloads
exercise (``/root/reference/train.py:124-168``, ``test.py:90``).

Prints ONE JSON line:
  metric/value/unit/vs_baseline : eval forward throughput, approx-kNN mode
  forward_ms_b1 / forward_ms_exact_b1 : per-pair forward latency (approx/exact)
  pairs_per_sec_b2 : batch-2 throughput (batch scaling)
  train_step_ms_b1 / train_step_ms_b2 : fwd+loss+bwd+AdamW at 8192 pts
  emd_8192_ms / emd_16384_ms / emd_32768_ms : approx-EMD per pair (blocked
    path engages above 16M matrix entries)

Crash tolerance: every section runs under ``_section`` — one retry on
transient transport errors (the axon remote-compile tunnel can drop a
response body mid-read, which destroyed the round-3 record), failures are
recorded in ``extras["failed_sections"]`` instead of aborting, and the
running extras dict is mirrored to stderr after every section so a hard
crash can never again erase numbers that were already measured.  The final
JSON line is emitted even if every section failed.

Baseline note: the reference publishes no absolute numbers (BASELINE.md — the
README carries only a relative "2× speedup" claim and the runtime-printed
latency was never recorded).  ``vs_baseline`` is therefore computed against a
documented proxy: 10 frame-pairs/sec, i.e. 2× the ~5 pairs/s implied by the
~200 ms/frame iterative GPU interpolators the reference claims to halve.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 10.0

extras: dict = {}
_failed: list = []


def _sync(x):
    # scalar probe transfer: block_until_ready does not reliably block
    # through the axon tunnel
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _time(fn, *args, iters=10, warmup=3):
    out = fn(*args)
    _sync(out)
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _transient(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(
        s in msg
        for s in (
            "remote_compile",
            "response body closed",
            "read body",
            "DEADLINE_EXCEEDED",
            "UNAVAILABLE",
            "Connection reset",
            "EOF",
        )
    )


def _section(name, fn):
    """Run one bench section; retry once on transient tunnel errors; never
    let a failure abort the run.  Mirrors progress to stderr each time."""
    for attempt in (1, 2):
        try:
            fn()
            break
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001 — bench must survive anything
            transient = _transient(e)
            print(
                f"[bench] section {name!r} attempt {attempt} failed "
                f"({'transient' if transient else 'fatal'}): "
                f"{type(e).__name__}: {e}",
                file=sys.stderr,
            )
            if attempt == 1 and transient:
                time.sleep(5.0)
                continue
            _failed.append(name)
            traceback.print_exc(file=sys.stderr)
            break
    print(f"[bench] after {name!r}: extras={json.dumps(extras)}", file=sys.stderr)


def main() -> None:
    # honour JAX_PLATFORMS even though sitecustomize pre-registers the TPU
    # backend (same contract as the CLIs)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from mocopci_tpu import ops
    from mocopci_tpu.config import ModelConfig, TrainConfig, tiny_model_config
    from mocopci_tpu.data import SyntheticInterpolationDataset
    from mocopci_tpu.models import MoCoPCI

    # MOCOPCI_BENCH_TINY=1: CPU smoke mode — every section runs at toy size
    # so code errors surface without a TPU (numbers are meaningless)
    tiny = os.environ.get("MOCOPCI_BENCH_TINY") == "1"
    cfg = tiny_model_config(64) if tiny else ModelConfig()
    model = MoCoPCI(cfg)
    rng = jax.random.PRNGKey(0)

    ds = SyntheticInterpolationDataset(length=2, num_points=cfg.npoints, seed=0)
    samples = [ds[i] for i in range(2)]
    x1 = jnp.asarray(np.stack([s[0][1] for s in samples]))
    x2 = jnp.asarray(np.stack([s[0][2] for s in samples]))
    gt = jnp.asarray(np.stack([np.stack(s[1]) for s in samples]))

    state = {"pairs_per_sec": None, "variables": None, "init_s": None}

    def sec_init():
        t0 = time.perf_counter()
        variables = jax.jit(
            lambda a, b: model.init({"params": rng, "dropout": rng}, a, b, train=False)
        )(x1[:1], x2[:1])
        _sync(variables)
        state["variables"] = variables
        state["init_s"] = time.perf_counter() - t0

    _section("init", sec_init)
    if state["variables"] is None:
        # nothing downstream can run without params; emit the record and stop
        _emit(state)
        return
    variables = state["variables"]

    def forward(variables, a, b):
        out = model.apply(variables, a, b, train=False, deterministic=True)["out"]
        return jnp.sum(out)

    fwd = jax.jit(forward)

    def sec_fwd_b1():
        t_fwd = _time(fwd, variables, x1[:1], x2[:1])
        state["pairs_per_sec"] = 1.0 / t_fwd
        extras["forward_ms_b1"] = round(t_fwd * 1e3, 2)

    _section("forward_b1", sec_fwd_b1)

    def sec_fwd_b2():
        t_b2 = _time(fwd, variables, x1, x2)
        extras["pairs_per_sec_b2"] = round(2.0 / t_b2, 3)

    _section("forward_b2", sec_fwd_b2)

    # batch-4: the throughput-optimal serving batch (latency amortizes once
    # no (B, 8192²) intermediates remain; b1 stays the headline latency)
    def sec_fwd_b4():
        x4a = jnp.concatenate([x1, x1])
        x4b = jnp.concatenate([x2, x2])
        t_b4 = _time(fwd, variables, x4a, x4b, iters=5, warmup=2)
        extras["pairs_per_sec_b4"] = round(4.0 / t_b4, 3)

    _section("forward_b4", sec_fwd_b4)

    # exact-kNN eval latency (parity-grade metric runs use this mode)
    def sec_fwd_exact():
        ops.set_knn_mode("exact")
        try:
            fwd_exact = jax.jit(lambda v, a, b: forward(v, a, b))
            extras["forward_ms_exact_b1"] = round(
                _time(fwd_exact, variables, x1[:1], x2[:1]) * 1e3, 2
            )
        finally:
            ops.set_knn_mode("approx")

    _section("forward_exact_b1", sec_fwd_exact)

    # bf16 activation mode (params stay f32; accuracy within the 1% CD band
    # per tests/test_model.py::test_bf16_activations_parity — reported as an
    # extra, f32 stays the headline)
    def sec_fwd_bf16():
        from mocopci_tpu.nn.basic import set_compute_dtype

        try:
            set_compute_dtype("bfloat16")
            fwd_bf16 = jax.jit(lambda v, a, b: forward(v, a, b))
            extras["forward_ms_b1_bf16"] = round(
                _time(fwd_bf16, variables, x1[:1], x2[:1]) * 1e3, 2
            )
        finally:
            set_compute_dtype("float32")

    _section("forward_bf16_b1", sec_fwd_bf16)

    # training step: fwd + loss + bwd + AdamW (ref train.py:124-168)
    def sec_train():
        from mocopci_tpu.training import create_train_state, train_step

        tcfg = TrainConfig()
        _, tstate = create_train_state(cfg, tcfg, steps_per_epoch=32)
        step_rng = jax.random.PRNGKey(1)
        for B in (1, 2):
            batch = {"pc1": x1[:B], "pc2": x2[:B], "gt": gt[:B]}

            def one_step(tstate, batch):
                new_state, aux = train_step(tstate, batch, step_rng, cfg, tcfg)
                return new_state.params, aux["loss"]

            t = _time(jax.jit(one_step), tstate, batch, iters=5, warmup=2)
            extras[f"train_step_ms_b{B}"] = round(t * 1e3, 1)

    _section("train_step", sec_train)

    # bf16-activation training step (params/optimizer stay f32; convergence
    # A/B vs f32 in runs/converge_r5_bf16_* — see DESIGN §3e)
    def sec_train_bf16():
        from mocopci_tpu.nn.basic import set_compute_dtype
        from mocopci_tpu.training import create_train_state, train_step

        # train_step's own jit cache is NOT keyed on the compute-dtype global
        # — trace the unwrapped function so bfloat16 is actually picked up
        raw_step = getattr(train_step, "__wrapped__", train_step)
        tcfg = TrainConfig()
        try:
            set_compute_dtype("bfloat16")
            _, tstate = create_train_state(cfg, tcfg, steps_per_epoch=32)
            step_rng = jax.random.PRNGKey(1)
            batch = {"pc1": x1, "pc2": x2, "gt": gt}

            def one_step(tstate, batch):
                new_state, aux = raw_step(tstate, batch, step_rng, cfg, tcfg)
                return new_state.params, aux["loss"]

            t = _time(jax.jit(one_step), tstate, batch, iters=5, warmup=2)
            extras["train_step_ms_b2_bf16"] = round(t * 1e3, 1)
        finally:
            set_compute_dtype("float32")

    _section("train_step_bf16", sec_train_bf16)

    # dense-stress forwards (BASELINE config 5): blocked kNN / chunked
    # attention engage automatically at these sizes
    def sec_stress(n):
        def run():
            from mocopci_tpu.config import stress_model_config

            scfg = stress_model_config(n)
            smodel = MoCoPCI(scfg)
            sx1 = jnp.asarray(
                np.asarray(x1[:1, :1]) * np.ones((1, n, 1), np.float32)
                + np.random.default_rng(n).normal(size=(1, n, 3)).astype(np.float32)
                * 10.0
            )
            sx2 = sx1 + 0.05
            svars = jax.jit(
                lambda a, b: smodel.init(
                    {"params": rng, "dropout": rng}, a, b, train=False
                )
            )(sx1, sx2)
            sfwd = jax.jit(
                lambda v, a, b: jnp.sum(
                    smodel.apply(v, a, b, train=False, deterministic=True)["out"]
                )
            )
            extras[f"forward_ms_{n}"] = round(
                _time(sfwd, svars, sx1, sx2, iters=3, warmup=1) * 1e3, 1
            )

        return run

    for n in () if tiny else (16384, 32768):
        _section(f"stress_forward_{n}", sec_stress(n))

    # approx-EMD per pair at eval scale and at the blocked stress sizes
    def sec_emd():
        emd_fn = jax.jit(lambda a, b: ops.earth_mover_distance_auto(a, b)[0])
        extras["emd_8192_ms"] = round(
            _time(emd_fn, x1[:1], x2[:1], iters=5, warmup=2) * 1e3, 1
        )
        # fast-exp variant (ops.set_emd_fast; tolerance test bounds the
        # metric shift < 0.1% — tests/test_ops_losses.py)
        ops.set_emd_fast(True)
        try:
            fast_fn = jax.jit(
                lambda a, b: ops.earth_mover_distance_auto(a, b)[0]
            )
            extras["emd_8192_ms_fast"] = round(
                _time(fast_fn, x1[:1], x2[:1], iters=5, warmup=2) * 1e3, 1
            )
        finally:
            ops.set_emd_fast(False)

    _section("emd_8192", sec_emd)

    def sec_emd_blocked(n):
        def run():
            r = np.random.default_rng(0)
            a = jnp.asarray(r.normal(size=(1, n, 3)).astype(np.float32))
            b = jnp.asarray(r.normal(size=(1, n, 3)).astype(np.float32))
            blocked = jax.jit(lambda a, b: ops.earth_mover_distance_blocked(a, b)[0])
            extras[f"emd_{n}_ms"] = round(
                _time(blocked, a, b, iters=3, warmup=1) * 1e3, 1
            )

        return run

    for n in () if tiny else (16384, 32768):
        _section(f"emd_blocked_{n}", sec_emd_blocked(n))

    _emit(state)


def _emit(state) -> None:
    if _failed:
        extras["failed_sections"] = _failed
    pairs_per_sec = state.get("pairs_per_sec")
    init_s = state.get("init_s")
    print(
        f"device={jax.devices()[0]} "
        f"init={init_s if init_s is None else round(init_s, 1)}s "
        f"extras={extras}",
        file=sys.stderr,
    )
    if pairs_per_sec is None:
        # headline section failed: fall back to b2 throughput if present, else
        # 0 — and tag the record so downstream comparisons know the headline
        # is a differently-defined metric (b2 throughput, not b1 latency⁻¹)
        pairs_per_sec = extras.get("pairs_per_sec_b2", 0.0)
        extras["pairs_per_sec_source"] = (
            "b2_fallback" if "pairs_per_sec_b2" in extras else "failed"
        )
    print(
        json.dumps(
            {
                "metric": "frame_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
