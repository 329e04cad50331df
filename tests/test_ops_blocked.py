"""Blockwise kNN: forced-chunking paths must match the dense path exactly."""
import numpy as np
import jax.numpy as jnp
import pytest

from mocopci_tpu import ops
from mocopci_tpu.ops import distance as D


@pytest.fixture
def force_blocking(monkeypatch):
    # tiny thresholds so ordinary test sizes exercise the chunked code paths
    monkeypatch.setattr(D, "_DENSE_LIMIT", 4096)
    monkeypatch.setattr(D, "_REF_CHUNK", 64)


def test_query_chunking_matches_dense(rng, force_blocking):
    ref = jnp.asarray(rng.normal(size=(2, 50, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32))
    got = np.asarray(ops.knn(5, ref, q))
    want = np.asarray(D._topk_min_indices(D.square_distance(q, ref), 5))
    for b in range(2):
        for n in range(300):
            assert set(got[b, n]) == set(want[b, n])


def test_ref_chunking_matches_dense(rng, force_blocking):
    ref = jnp.asarray(rng.normal(size=(1, 200, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(1, 150, 3)).astype(np.float32))
    got = np.asarray(ops.knn(7, ref, q))
    want = np.asarray(D._topk_min_indices(D.square_distance(q, ref), 7))
    for n in range(150):
        assert set(got[0, n]) == set(want[0, n])


def test_cosine_blocked(rng, force_blocking):
    ref = jnp.asarray(rng.normal(size=(1, 130, 16)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(1, 140, 16)).astype(np.float32))
    got = np.asarray(ops.knn_cosine(4, ref, q))
    want = np.asarray(D._topk_min_indices(D.cosine_distance(q, ref), 4))
    for n in range(140):
        assert set(got[0, n]) == set(want[0, n])


def test_pallas_select_min_k_interpret(rng):
    from mocopci_tpu.ops.pallas.select_k import select_min_k_pallas

    vals = rng.normal(size=(2, 50, 96)).astype(np.float32)
    idxs = rng.integers(0, 10_000, size=(2, 50, 96)).astype(np.int32)
    got = np.asarray(
        select_min_k_pallas(jnp.asarray(vals), jnp.asarray(idxs), 5, interpret=True)
    )
    order = np.argsort(vals, axis=-1, kind="stable")[..., :5]
    want = np.take_along_axis(idxs, order, axis=-1)
    np.testing.assert_array_equal(got, want)


def _exact_knn(q, ref, k, metric="euclidean"):
    if metric == "euclidean":
        d = np.sum((q[:, :, None, :] - ref[:, None, :, :]) ** 2, -1)
    else:
        qn = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        rn = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-12)
        d = 1.0 - np.einsum("bnc,bmc->bnm", qn, rn)
    return np.argsort(d, axis=-1)[..., :k]


def test_fused_knn_pallas_exact_small_m(rng):
    # M <= TR and < 4 slabs: no fold, one column per ref point -> exact
    from mocopci_tpu.ops.pallas.knn import fused_knn_pallas

    q = rng.normal(size=(2, 70, 3)).astype(np.float32)
    ref = rng.normal(size=(2, 40, 3)).astype(np.float32)
    got = np.asarray(fused_knn_pallas(jnp.asarray(q), jnp.asarray(ref), 6,
                                      interpret=True))
    want = _exact_knn(q, ref, 6)
    for b in range(2):
        for n in range(70):
            assert set(got[b, n]) == set(want[b, n])


def test_fused_knn_pallas_fold3_recall(rng):
    # M > TR engages streaming + the fold3 extraction; require high recall
    from mocopci_tpu.ops.pallas.knn import fused_knn_pallas

    q = rng.normal(size=(1, 64, 3)).astype(np.float32)
    ref = rng.normal(size=(1, 1500, 3)).astype(np.float32)
    got = np.asarray(fused_knn_pallas(jnp.asarray(q), jnp.asarray(ref), 8,
                                      interpret=True))
    want = _exact_knn(q, ref, 8)
    hits = sum(len(set(got[0, n]) & set(want[0, n])) for n in range(64))
    assert hits / (64 * 8) > 0.97


def test_fused_knn_pallas_widened_exact_band(rng, monkeypatch):
    # MOCOPCI_KNN_WIDEN=1 widens 1024 < M <= 2048 to one exact 2048-wide pass
    from mocopci_tpu.ops.pallas.knn import fused_knn_pallas

    monkeypatch.setenv("MOCOPCI_KNN_WIDEN", "1")
    q = rng.normal(size=(1, 64, 3)).astype(np.float32)
    ref = rng.normal(size=(1, 1500, 3)).astype(np.float32)
    got = np.asarray(fused_knn_pallas(jnp.asarray(q), jnp.asarray(ref), 8,
                                      interpret=True))
    want = _exact_knn(q, ref, 8)
    for n in range(64):
        assert set(got[0, n]) == set(want[0, n])


def test_fused_knn_pallas_cosine_mxu_path(rng):
    # C > 8 takes the MXU contraction path; cosine metric
    from mocopci_tpu.ops.pallas.knn import fused_knn_pallas

    feats_q = rng.normal(size=(1, 50, 32)).astype(np.float32)
    feats_r = rng.normal(size=(1, 60, 32)).astype(np.float32)
    qn = feats_q / (np.linalg.norm(feats_q, axis=-1, keepdims=True) + 1e-8)
    rn = feats_r / (np.linalg.norm(feats_r, axis=-1, keepdims=True) + 1e-8)
    got = np.asarray(fused_knn_pallas(jnp.asarray(qn), jnp.asarray(rn), 5,
                                      "cosine", interpret=True))
    want = _exact_knn(feats_q, feats_r, 5, "cosine")
    for n in range(50):
        assert set(got[0, n]) == set(want[0, n])


# ---------------------------------------------------------------------------
# Exact-mode Pallas kernel: must match lax.top_k set AND order, incl. ties.
# ---------------------------------------------------------------------------

def _topk_oracle(q, ref, k, metric="euclidean"):
    """lax.top_k over the f32 distance matrix — set and tie-break oracle."""
    import jax

    if metric == "euclidean":
        d = D.square_distance(jnp.asarray(q), jnp.asarray(ref))
    else:
        d = D.cosine_distance(jnp.asarray(q), jnp.asarray(ref))
    _, idx = jax.lax.top_k(-d, k)
    return np.asarray(idx)


def test_exact_knn_pallas_multi_tile_matches_topk(rng):
    # tr=128 forces the streaming path; M=300 exercises the padding mask
    from mocopci_tpu.ops.pallas.knn import exact_knn_pallas

    q = rng.normal(size=(2, 70, 3)).astype(np.float32)
    ref = rng.normal(size=(2, 300, 3)).astype(np.float32)
    got = np.asarray(exact_knn_pallas(jnp.asarray(q), jnp.asarray(ref), 9,
                                      tr=128, interpret=True))
    want = _topk_oracle(q, ref, 9)
    np.testing.assert_array_equal(got, want)


def test_exact_knn_pallas_tie_break_matches_topk(rng):
    # duplicated reference points create exact f32 distance ties; the
    # lexicographic (d, col) extraction must pick the lower index first,
    # exactly like lax.top_k
    from mocopci_tpu.ops.pallas.knn import exact_knn_pallas

    base = rng.normal(size=(1, 100, 3)).astype(np.float32)
    ref = np.concatenate([base, base[:, :50], base[:, :25]], axis=1)  # M=175
    q = rng.normal(size=(1, 40, 3)).astype(np.float32)
    got = np.asarray(exact_knn_pallas(jnp.asarray(q), jnp.asarray(ref), 8,
                                      tr=128, interpret=True))
    want = _topk_oracle(q, ref, 8)
    np.testing.assert_array_equal(got, want)


def test_exact_knn_pallas_cosine_mxu(rng):
    from mocopci_tpu.ops.pallas.knn import exact_knn_pallas

    fq = rng.normal(size=(1, 50, 32)).astype(np.float32)
    fr = rng.normal(size=(1, 260, 32)).astype(np.float32)
    qn = fq / (np.linalg.norm(fq, axis=-1, keepdims=True) + 1e-8)
    rn = fr / (np.linalg.norm(fr, axis=-1, keepdims=True) + 1e-8)
    got = np.asarray(exact_knn_pallas(jnp.asarray(qn), jnp.asarray(rn), 6,
                                      "cosine", tr=128, interpret=True))
    want = _topk_oracle(qn, rn, 6, "cosine")
    np.testing.assert_array_equal(got, want)


def test_exact_mode_dispatch_cpu_matches_dense(rng):
    # set_knn_mode("exact") on CPU routes to the blocked XLA merge; the
    # result must equal the dense exact top-k
    D.set_knn_mode("exact")
    try:
        ref = jnp.asarray(rng.normal(size=(1, 300, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(1, 80, 3)).astype(np.float32))
        got = np.asarray(ops.knn(5, ref, q))
        want = _topk_oracle(q, ref, 5)
        for n in range(80):
            assert set(got[0, n]) == set(want[0, n])
    finally:
        D.set_knn_mode("approx")


def test_exact_knn_pallas_fold_overflow_fallback(rng):
    """>T=5 of the top-k in ONE column mod 128 trips the exactness flag and
    the in-kernel fallback still returns the bit-exact top_k result."""
    from mocopci_tpu.ops.pallas.knn import exact_knn_pallas

    M = 1024
    ref = rng.normal(size=(1, M, 3)).astype(np.float32) * 100  # far cloud
    q = np.zeros((1, 8, 3), np.float32)
    # 8 points in column residue 0 (mod 128), all near the origin queries
    for j in range(8):
        ref[0, j * 128] = 0.01 * j
    got = np.asarray(exact_knn_pallas(jnp.asarray(q), jnp.asarray(ref), 8,
                                      tr=128, interpret=True))
    want = _topk_oracle(q, ref, 8)
    np.testing.assert_array_equal(got, want)
