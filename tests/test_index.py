import numpy as np
import pytest

import cphnsw_tpu
from cphnsw_tpu import CPIndex


def make_data(rng, n=2500, dim=48, n_clusters=24):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 4.0
    x = centers[rng.integers(0, n_clusters, n)] + rng.standard_normal(
        (n, dim)
    ).astype(np.float32)
    return x


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(11)
    x = make_data(rng)
    index = CPIndex(dim=x.shape[1], bits=1)
    index.build(x)
    index.finalize()
    return index, x


def test_index_lifecycle_flags(built):
    index, x = built
    assert index.is_finalized
    assert index.size == len(x)
    assert index.dim == x.shape[1]


def test_index_recall(built, rng):
    index, x = built
    queries = x[rng.choice(len(x), 50, replace=False)] + 0.05 * (
        rng.standard_normal((50, x.shape[1])).astype(np.float32)
    )
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]
    ids, dists = index.search_batch(queries, k=10)
    recall = (ids[:, :, None] == gt[:, None, :]).any(-1).mean()
    assert recall > 0.9, f"recall@10={recall}"
    # ids are in the caller's original order with exact distances
    # (against the wire-precision query — the scan engine transmits
    # queries as f16, api/scan_index.py QUERY_WIRE_DTYPE)
    from cphnsw_tpu.api.scan_index import QUERY_WIRE_DTYPE

    q_wire = queries.astype(QUERY_WIRE_DTYPE).astype(np.float32)
    d_wire = ((q_wire[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    rows = np.arange(len(queries))[:, None]
    valid = ids >= 0
    np.testing.assert_allclose(
        dists[valid], d_wire[rows, np.maximum(ids, 0)][valid],
        rtol=1e-3, atol=1e-3,
    )


def test_single_query_matches_batch(built, rng):
    index, x = built
    q = x[7] + 0.01 * rng.standard_normal(x.shape[1]).astype(np.float32)
    ids1, d1 = index.search(q, k=5)
    ids2, d2 = index.search_batch(q[None], k=5)
    np.testing.assert_array_equal(ids1, ids2[0])


def test_save_load_roundtrip(built, rng, tmp_path):
    index, x = built
    path = tmp_path / "index.npz"
    index.save(path)

    loaded = CPIndex(dim=x.shape[1], bits=1)
    loaded.load(path)
    assert loaded.is_finalized and loaded.size == index.size

    queries = x[rng.choice(len(x), 20, replace=False)]
    ids_a, d_a = index.search_batch(queries, k=10)
    ids_b, d_b = loaded.search_batch(queries, k=10)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)


@pytest.fixture(scope="module")
def built_ip():
    """One finalized IP-metric graph index shared by the ip tests
    (finalize dominates suite latency; the tests are read-only)."""
    from cphnsw_tpu.api.index import Index

    rng = np.random.default_rng(1234)
    x = make_data(rng, n=3000, dim=24)
    x *= rng.uniform(0.7, 1.4, size=(3000, 1)).astype(np.float32)
    index = Index(dim=24, bits=1, metric="ip")
    index.build(x)
    index.finalize()
    return index, x


def test_save_load_roundtrip_ip_metric(built_ip, rng, tmp_path):
    """An IP-metric index must restore metric/_ip_norm_bound (reference
    save fully determines search behavior, hnsw_index.hpp:217-443)."""
    from cphnsw_tpu.api.index import Index

    index, x = built_ip
    path = tmp_path / "ip.npz"
    index.save(path)

    loaded = Index(dim=24, bits=1, metric="ip").load(path)
    queries = rng.standard_normal((12, 24)).astype(np.float32)
    ids_a, s_a = index.search_batch(queries, k=5)
    ids_b, s_b = loaded.search_batch(queries, k=5)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(s_a, s_b, rtol=1e-6)

    # an l2 Index must refuse an ip-built file
    with pytest.raises(ValueError, match="metric"):
        Index(dim=24, bits=1, metric="l2").load(path)


def test_ip_metric(built_ip, rng):
    index, x = built_ip
    queries = rng.standard_normal((25, 24)).astype(np.float32)
    ips = queries @ x.T
    gt = np.argsort(-ips, axis=1)[:, :10]
    ids, scores = index.search_batch(queries, k=10)
    recall = (ids[:, :, None] == gt[:, None, :]).any(-1).mean()
    assert recall > 0.78, f"ip recall@10={recall}"  # MIPS is harder than L2
    # returned scores are the inner products, descending
    rows = np.arange(len(queries))[:, None]
    valid = ids >= 0
    np.testing.assert_allclose(
        scores[valid], ips[rows, np.maximum(ids, 0)][valid], rtol=1e-3,
        atol=1e-3,
    )
    assert np.all(np.diff(np.where(valid, scores, -np.inf), axis=1) <= 1e-4)


@pytest.fixture(scope="module")
def built_hnsw():
    """One finalized hnsw-entry index shared by the hnsw tests."""
    from cphnsw_tpu.api.index import Index

    rng = np.random.default_rng(1234)
    x = make_data(rng, n=2200, dim=32)
    index = Index(dim=32, bits=1, entry_strategy="hnsw")
    index.build(x)
    index.finalize()
    return index, x


def test_save_load_roundtrip_hnsw_entry(built_hnsw, rng, tmp_path):
    """hnsw-entry indexes must restore the upper-layer hierarchy."""
    from cphnsw_tpu.api.index import Index

    index, x = built_hnsw
    path = tmp_path / "hnsw.npz"
    index.save(path)

    loaded = Index(dim=32, bits=1, entry_strategy="hnsw").load(path)
    assert (loaded._upper is None) == (index._upper is None)
    queries = x[rng.choice(len(x), 10, replace=False)]
    ids_a, d_a = index.search_batch(queries, k=5)
    ids_b, d_b = loaded.search_batch(queries, k=5)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)


def test_load_validates_params(built, tmp_path):
    index, x = built
    path = tmp_path / "index.npz"
    index.save(path)
    with pytest.raises(ValueError, match="bits"):
        CPIndex(dim=x.shape[1], bits=2).load(path)
    with pytest.raises(ValueError, match="dim"):
        CPIndex(dim=x.shape[1] + 1, bits=1).load(path)


def test_errors(built):
    index = CPIndex(dim=8, bits=1)
    with pytest.raises(RuntimeError):
        index.search_batch(np.zeros((1, 8), np.float32), k=1)
    with pytest.raises(RuntimeError):
        index.finalize()
    with pytest.raises(ValueError):
        index.build(np.zeros((0, 8), np.float32))
    with pytest.raises(ValueError):
        cphnsw_tpu.CPIndex(dim=8, bits=3)
    with pytest.raises(ValueError):
        index.build(np.zeros((4, 9), np.float32))


def test_k_larger_than_n():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((60, 16)).astype(np.float32)
    index = CPIndex(dim=16, bits=1)
    index.build(x)
    index.finalize()
    ids, dists = index.search_batch(x[:4], k=100)
    assert ids.shape == (4, 100)
    assert (ids[:, 60:] == -1).all()


def test_engine_auto_selection(built, rng, tmp_path):
    """CPIndex derives the engine (the parameterless contract extended to
    the engine choice): scan when the store fits single-chip HBM, explicit
    override via engine=, and load() detects the engine from the file."""
    index, x = built
    assert index.engine == "scan"  # auto at this scale -> scan

    g = CPIndex(dim=x.shape[1], bits=1, engine="graph")
    g.build(x)
    g.finalize()
    assert g.engine == "graph"
    queries = x[rng.choice(len(x), 16, replace=False)]
    ids_g, _ = g.search_batch(queries, k=10)
    ids_s, _ = index.search_batch(queries, k=10)
    # both engines find (mostly) the same exact-reranked neighbors
    agree = (ids_g[:, :, None] == ids_s[:, None, :]).any(-1).mean()
    assert agree > 0.8

    path = tmp_path / "graph.npz"
    g.save(path)
    auto = CPIndex(dim=x.shape[1], bits=1)
    auto.load(path)
    assert auto.engine == "graph"
    with pytest.raises(ValueError, match="engine"):
        CPIndex(dim=x.shape[1], bits=1, engine="scan").load(path)


def test_hnsw_entry_strategy(built_hnsw, rng):
    index, x = built_hnsw
    queries = x[rng.choice(len(x), 30, replace=False)]
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]
    ids, _ = index.search_batch(queries, k=10)
    recall = (ids[:, :, None] == gt[:, None, :]).any(-1).mean()
    # Hierarchical descent inherits HNSW's fragility on well-separated
    # clusters (the measured reference scores ~0.43 here).  The upper
    # layers are built with bidirectional edges + component bridging and
    # descended with a small beam (ef=8), which measures ~0.84; the
    # default seed-scan strategy reaches ~0.95+.  Full measurement:
    # PARITY.md "Upper layers".
    assert recall > 0.8, f"hnsw-entry recall@10={recall}"


