"""Full-model numerical parity: reference torch MoCoPCI vs mocopci-tpu.

Runs the ENTIRE reference model (8192 points, eval mode, CPU — CUDA ops
replaced by the faithful stand-ins in tests/ref_torch.py), converts its
weights with the production converter, runs our model with knn_mode=exact,
and compares the 3 interpolated output frames.

Slow (~minutes on one CPU core); run manually or via RUN_FULL_PARITY=1 pytest.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(npoints=8192, seed=0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from tests.ref_torch import install_reference_stubs
    install_reference_stubs()
    from models.m_models.mocopci import MoCoPCI as TorchMoCoPCI

    from mocopci_tpu import ops
    from mocopci_tpu.config import ModelConfig
    from mocopci_tpu.models import MoCoPCI
    from mocopci_tpu.training.convert import convert_reference_state_dict

    ops.set_knn_mode("exact")

    torch.manual_seed(seed)
    net = TorchMoCoPCI().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, batch_stats = convert_reference_state_dict(sd)

    rng = np.random.default_rng(seed)
    x1 = rng.normal(scale=10.0, size=(1, npoints, 3)).astype(np.float32)
    x2 = (x1 + 0.5 * rng.normal(size=(1, npoints, 3))).astype(np.float32)

    t0 = time.time()
    with torch.no_grad():
        out_ref = net(
            torch.from_numpy(x1.transpose(0, 2, 1)),
            torch.from_numpy(x2.transpose(0, 2, 1)),
            None, [0.41666666666666663, 0.5, 0.5833333333333333], False,
        )
    ref = np.stack([o.numpy() for o in out_ref], axis=1)  # (1, 3, N, 3)
    print(f"reference forward: {time.time()-t0:.1f}s, out shape {ref.shape}")

    model = MoCoPCI(ModelConfig(npoints=npoints))
    t0 = time.time()
    got = np.asarray(
        model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(x1), jnp.asarray(x2), train=False, deterministic=True,
        )["out"]
    )
    print(f"ours forward: {time.time()-t0:.1f}s, out shape {got.shape}")

    scale = np.abs(ref).max()
    diff = np.abs(got - ref)
    print(f"coordinate scale: {scale:.3f}")
    print(f"max abs diff:  {diff.max():.6f}  ({diff.max()/scale:.2e} of scale)")
    print(f"mean abs diff: {diff.mean():.6f}")
    # Chamfer between the two predictions per frame (output-set agreement)
    for j in range(3):
        cd = float(ops.chamfer_distance(jnp.asarray(got[:, j]), jnp.asarray(ref[:, j])))
        print(f"frame {j}: CD(ours, reference) = {cd:.8f}")
    ok = diff.max() / scale < 5e-3
    print("PARITY:", "PASS" if ok else "FAIL")
    return ok


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    sys.exit(0 if main(n) else 1)
