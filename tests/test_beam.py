import jax.numpy as jnp
import numpy as np
import pytest

from cphnsw_tpu.calibration import calibrate as calib_mod
from cphnsw_tpu.graph import build
from cphnsw_tpu.ops import hadamard
from cphnsw_tpu.search import beam


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(5)
    n, dim = 2000, 32
    centers = rng.standard_normal((24, dim)).astype(np.float32) * 4.0
    x = centers[rng.integers(0, 24, n)] + rng.standard_normal((n, dim)).astype(
        np.float32
    )
    p = hadamard.next_pow2(dim)
    signs = hadamard.rotation_signs(42, p)
    raw = jnp.asarray(x)
    norm_sq = jnp.sum(raw * raw, -1)
    centroid = raw.mean(0)
    node_nop = jnp.linalg.norm(raw - centroid, axis=-1)
    res = build.build_graph(raw, norm_sq, node_nop, signs, bits=1, r=16)
    profile = calib_mod.IndexProfile.derive(n, p, 16, 1)
    snap = calib_mod.calibrate(
        res.raw, res.norm_sq, res.neighbors, signs, 1, profile
    )
    params = calib_mod.to_search_params(snap)
    return res, signs, x, params  # x in ORIGINAL order (ids map back to it)


def run_search(res, signs, queries, k, params, gamma=None):
    if gamma is not None:
        params = params._replace(
            gamma=jnp.float32(gamma),
            gamma_max=jnp.maximum(params.gamma_max, jnp.float32(gamma)),
        )
    n = res.raw.shape[0]
    cands = np.unique(np.concatenate(
        [[res.entry_point], np.random.default_rng(7).choice(n, 256, replace=False)]
    )).astype(np.int32)
    ids, dists = beam.search_batch(
        res.raw, res.norm_sq, res.neighbors,
        jnp.asarray(cands), signs,
        jnp.asarray(queries), params, bits=1, k=k,
        beam_cap=64, max_steps=400,
    )
    # map BFS-internal ids back to original dataset ids (the facade's job;
    # the reference omits this — its harness compares reordered ids to
    # original ground truth, see hnsw_index.hpp:139-159)
    ids = np.asarray(ids)
    new_to_old = np.empty(len(res.old_to_new), np.int64)
    new_to_old[res.old_to_new] = np.arange(len(res.old_to_new))
    mapped = np.where(ids >= 0, new_to_old[np.maximum(ids, 0)], -1)
    return mapped, np.asarray(dists)


def test_beam_search_recall(small_index, rng):
    res, signs, x, params = small_index
    queries = x[rng.choice(len(x), 40, replace=False)][:, : x.shape[1]]
    queries = queries + 0.05 * rng.standard_normal(queries.shape).astype(
        np.float32
    )
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]

    ids, dists = run_search(res, signs, queries, k=10, params=params)
    recall = (ids[:, :, None] == gt[:, None, :]).any(-1).mean()
    assert recall > 0.9, f"beam recall@10={recall}"

    # distances are exact and ascending
    rows = np.arange(len(queries))[:, None]
    want = d[rows, np.maximum(ids, 0)]
    got_valid = ids >= 0
    np.testing.assert_allclose(
        dists[got_valid], want[got_valid], rtol=1e-3, atol=1e-3
    )
    masked = np.where(got_valid, dists, np.inf)
    assert np.all(np.diff(masked, 1) >= -1e-4)


def test_beam_gamma_effect(small_index, rng):
    """Larger gamma explores more -> recall should not decrease."""
    res, signs, x, params = small_index
    queries = x[rng.choice(len(x), 30, replace=False)]
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]

    recalls = []
    for gamma in (1.0, 1.5):
        ids, _ = run_search(res, signs, queries, k=10, params=params, gamma=gamma)
        recalls.append((ids[:, :, None] == gt[:, None, :]).any(-1).mean())
    assert recalls[1] >= recalls[0] - 0.02


def test_beam_no_duplicate_results(small_index, rng):
    res, signs, x, params = small_index
    queries = x[rng.choice(len(x), 16, replace=False)]
    ids, _ = run_search(res, signs, queries, k=10, params=params)
    for row in ids:
        v = row[row >= 0]
        assert len(np.unique(v)) == len(v)


def test_beam_expand_width_quality(small_index, rng):
    """Multi-expansion (expand_width>1) must not degrade recall."""
    res, signs, x, params = small_index
    queries = x[rng.choice(len(x), 30, replace=False)]
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]
    n = res.raw.shape[0]
    cands = np.unique(np.concatenate(
        [[res.entry_point], np.random.default_rng(7).choice(n, 256, replace=False)]
    )).astype(np.int32)
    new_to_old = np.empty(n, np.int64)
    new_to_old[res.old_to_new] = np.arange(n)

    recalls = {}
    for ew, ms in ((1, 400), (4, 100)):
        ids, dists = beam.search_batch(
            res.raw, res.norm_sq, res.neighbors, jnp.asarray(cands), signs,
            jnp.asarray(queries), params, bits=1, k=10,
            beam_cap=64, max_steps=ms, expand_width=ew,
        )
        ids = np.asarray(ids)
        mapped = np.where(ids >= 0, new_to_old[np.maximum(ids, 0)], -1)
        recalls[ew] = (mapped[:, :, None] == gt[:, None, :]).any(-1).mean()
        # no duplicate ids in any row
        for row in mapped:
            v = row[row >= 0]
            assert len(np.unique(v)) == len(v)
    assert recalls[4] >= recalls[1] - 0.03, recalls


def test_beam_hash_visited_quality(small_index, rng):
    """Hash-table visited dedup must match dense-bitmap recall closely."""
    res, signs, x, params = small_index
    queries = x[rng.choice(len(x), 30, replace=False)]
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]
    n = res.raw.shape[0]
    cands = np.unique(np.concatenate(
        [[res.entry_point], np.random.default_rng(7).choice(n, 256, replace=False)]
    )).astype(np.int32)
    new_to_old = np.empty(n, np.int64)
    new_to_old[res.old_to_new] = np.arange(n)

    recalls = {}
    for hbits in (0, 11):
        ids, dists = beam.search_batch(
            res.raw, res.norm_sq, res.neighbors, jnp.asarray(cands), signs,
            jnp.asarray(queries), params, bits=1, k=10,
            beam_cap=64, max_steps=100, expand_width=4,
            visited_hash_bits=hbits,
        )
        ids = np.asarray(ids)
        mapped = np.where(ids >= 0, new_to_old[np.maximum(ids, 0)], -1)
        recalls[hbits] = (mapped[:, :, None] == gt[:, None, :]).any(-1).mean()
        # result rows contain no duplicate ids even with hash evictions
        for row in mapped:
            v = row[row >= 0]
            assert len(np.unique(v)) == len(v)
    assert recalls[11] >= recalls[0] - 0.03, recalls
