"""PointNet++ SA/FP module tests (op-library parity items)."""
import numpy as np
import jax
import jax.numpy as jnp

from mocopci_tpu.nn import FeaturePropagation, SetAbstraction, query_and_group
from mocopci_tpu import ops


def test_query_and_group_shapes(rng):
    xyz = jnp.asarray(rng.normal(size=(2, 30, 3)).astype(np.float32))
    new = xyz[:, :10]
    feat = jnp.asarray(rng.normal(size=(2, 30, 7)).astype(np.float32))
    g = query_and_group(0.8, 6, xyz, new, feat)
    assert g.shape == (2, 10, 6, 10)  # 3 rel-xyz + 7 features
    g2 = query_and_group(0.8, 6, xyz, new, None)
    assert g2.shape == (2, 10, 6, 3)


def test_set_abstraction_and_fp_roundtrip(rng):
    xyz = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(2, 40, 8)).astype(np.float32))
    sa = SetAbstraction(npoint=10, nsample=8, mlp=(16, 32))
    vs = sa.init(jax.random.PRNGKey(0), xyz, feat)
    new_xyz, new_feat = sa.apply(vs, xyz, feat)
    assert new_xyz.shape == (2, 10, 3)
    assert new_feat.shape == (2, 10, 32)
    # FP lifts back to the dense set with a skip connection
    fp = FeaturePropagation(mlp=(24,))
    vf = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feat, new_feat)
    up = fp.apply(vf, xyz, new_xyz, feat, new_feat)
    assert up.shape == (2, 40, 24)
    assert np.isfinite(np.asarray(up)).all()


def test_set_abstraction_radius_mode(rng):
    xyz = jnp.asarray(rng.normal(size=(1, 30, 3)).astype(np.float32))
    sa = SetAbstraction(npoint=8, nsample=4, mlp=(16,), radius=1.0)
    vs = sa.init(jax.random.PRNGKey(0), xyz, None)
    _, f = sa.apply(vs, xyz, None)
    assert f.shape == (1, 8, 16)


def test_flow_refine_net(rng):
    from mocopci_tpu.nn.refine import FlowRefineNet

    B, N = 2, 20
    fea0 = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    fea1 = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    cost = jnp.asarray(rng.normal(size=(B, N, 12)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    m = FlowRefineNet(context_dim=16, corr_dim=12)
    vs = m.init(jax.random.PRNGKey(0), fea0, fea1, cost, flow)
    out = m.apply(vs, fea0, fea1, cost, flow)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()
    # residual refinement: zero-weight head would return flow unchanged;
    # random weights must change it
    assert float(jnp.abs(out - flow).max()) > 1e-6
