import numpy as np
import pytest

from cphnsw_tpu.search import bruteforce


def make_clustered(rng, n=4000, dim=48, n_clusters=32):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 3.0
    assign = rng.integers(0, n_clusters, size=n)
    return (centers[assign] + rng.standard_normal((n, dim)).astype(np.float32)), centers


def brute_gt(base, queries, k):
    d = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_bruteforce_recall(rng, bits):
    base, centers = make_clustered(rng)
    queries = base[rng.choice(len(base), 50, replace=False)] + 0.1 * rng.standard_normal(
        (50, base.shape[1])
    ).astype(np.float32)
    gt = brute_gt(base, queries, 10)

    index = bruteforce.BruteForceIndex(base.shape[1], bits=bits).build(base)
    ids, dists = index.search_batch(queries, k=10, top_c=100)

    hits = (ids[:, :, None] == gt[:, None, :]).any(-1).sum(-1)
    recall = hits.mean() / 10
    min_recall = {1: 0.85, 2: 0.95, 4: 0.97}[bits]
    assert recall >= min_recall, f"bits={bits}: recall@10={recall}"

    # reranked distances must be exact and sorted
    d_true = ((queries[:, None, :] - base[ids]) ** 2).sum(-1)
    np.testing.assert_allclose(dists, d_true, rtol=1e-3, atol=1e-3)
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_bruteforce_calibration_params(rng):
    base, _ = make_clustered(rng, n=2000)
    index = bruteforce.BruteForceIndex(base.shape[1], bits=1).build(base)
    # The reference's leverage-based degeneracy gate (hnsw_index.hpp:1009-1015)
    # rejects the fit for Gaussian-ish estimates (max leverage ~2ln(n)/n > 4/n),
    # so identity affine is the expected common case; the floor must be real.
    assert np.isfinite(index.calib.affine_a) and np.isfinite(index.calib.affine_b)
    assert index.calib.ip_qo_floor > 0.0
