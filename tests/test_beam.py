import jax.numpy as jnp
import numpy as np
import pytest

from cphnsw_tpu.calibration import calibrate as calib_mod
from cphnsw_tpu.graph import build
from cphnsw_tpu.ops import hadamard
from cphnsw_tpu.search import beam


# The graph/beam path is exercised at EVERY bit width: the 2/4-bit
# branch takes the MSB partial-decode dual-bound path
# (search/beam.py, mirroring the reference's
# distance/fastscan_kernel.hpp:197-368) which 1-bit never touches.
@pytest.fixture(scope="module", params=[1, 2, 4], ids=["1bit", "2bit", "4bit"])
def small_index(request):
    bits = request.param
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
    res = build.build_graph(raw, norm_sq, node_nop, signs, bits=bits, r=16)
    profile = calib_mod.IndexProfile.derive(n, p, 16, bits)
    snap = calib_mod.calibrate(
        res.raw, res.norm_sq, res.neighbors, signs, bits, profile
    )
    params = calib_mod.to_search_params(snap)
    # x in ORIGINAL order (ids map back to it)
    return res, signs, x, params, bits


def run_search(res, signs, queries, k, params, bits, gamma=None):
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
        jnp.asarray(queries), params, bits=bits, k=k,
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
    res, signs, x, params, bits = small_index
    queries = x[rng.choice(len(x), 40, replace=False)][:, : x.shape[1]]
    queries = queries + 0.05 * rng.standard_normal(queries.shape).astype(
        np.float32
    )
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]

    ids, dists = run_search(res, signs, queries, k=10, params=params, bits=bits)
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
    res, signs, x, params, bits = small_index
    queries = x[rng.choice(len(x), 30, replace=False)]
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]

    recalls = []
    for gamma in (1.0, 1.5):
        ids, _ = run_search(res, signs, queries, k=10, params=params, bits=bits, gamma=gamma)
        recalls.append((ids[:, :, None] == gt[:, None, :]).any(-1).mean())
    assert recalls[1] >= recalls[0] - 0.02


def test_beam_no_duplicate_results(small_index, rng):
    res, signs, x, params, bits = small_index
    queries = x[rng.choice(len(x), 16, replace=False)]
    ids, _ = run_search(res, signs, queries, k=10, params=params, bits=bits)
    for row in ids:
        v = row[row >= 0]
        assert len(np.unique(v)) == len(v)


def test_beam_expand_width_quality(small_index, rng):
    """Multi-expansion (expand_width>1) must not degrade recall."""
    res, signs, x, params, bits = small_index
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
            jnp.asarray(queries), params, bits=bits, k=10,
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
    res, signs, x, params, bits = small_index
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
            jnp.asarray(queries), params, bits=bits, k=10,
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


def test_msb_partial_bound_property(small_index, rng):
    """N-bit two-stage property (reference fastscan_kernel.hpp:197-368):
    the MSB partial-decode lower bound must (a) sit at or below the
    full-precision estimate for essentially every edge, and (b) hold
    below the exact distance for the overwhelming majority (it is a
    calibrated bound with dot_slack absorbing quantization error, not a
    certified one — same contract as the reference's skip gate)."""
    from cphnsw_tpu.ops import estimate, pack, quantize

    res, signs, x, params, bits = small_index
    if bits < 2:
        pytest.skip("two-stage MSB bound exists only for bits >= 2")

    k_scale = float((1 << bits) - 1)
    msb_scale = 3.0
    raw = np.asarray(res.raw)
    p = raw.shape[1]
    n = raw.shape[0]

    # random (query, parent) pairs; bound every parent edge
    qs = x[rng.choice(len(x), 16, replace=False)]
    qpad = jnp.asarray(np.pad(qs, ((0, 0), (0, p - qs.shape[1]))))
    qc = quantize.encode_queries(qpad, signs)
    parents = rng.choice(n, 16)

    fused = np.asarray(res.neighbors.fused)
    r = res.neighbors.ids.shape[1]
    words = res.neighbors.words

    ests, lowers, exacts = [], [], []
    for qi, par in enumerate(parents):
        row = fused[par]
        nbr = row[:r].astype(np.int32)
        valid = nbr >= 0
        aux = row[r: 5 * r].view(np.float32).reshape(4, r)
        planes = (
            row[5 * r: (5 + bits * words) * r]
            .view(np.uint32)
            .reshape(bits, words, r)
        )
        planes = np.moveaxis(planes, 2, 0)          # (R, B, W)
        u = np.asarray(pack.unpack_planes(jnp.asarray(planes), p))
        fs = u @ np.asarray(qc.q_u[qi])
        ip_full = estimate.ip_from_fastscan(
            jnp.asarray(fs), jnp.asarray(aux[3]),
            qc.coeff_a[qi], qc.coeff_b[qi], qc.coeff_c[qi], k_scale,
        )
        u_msb = np.asarray(
            pack.unpack_msb(jnp.asarray(planes), p, bits)
        )
        fs_msb = u_msb @ np.asarray(qc.q_u[qi])
        ip_msb = estimate.ip_from_fastscan(
            jnp.asarray(fs_msb), jnp.asarray(u_msb.sum(-1)),
            qc.coeff_a[qi], qc.coeff_b[qi], qc.coeff_c[qi], msb_scale,
        )
        d_qp_sq = float(((np.asarray(qpad[qi]) - raw[par]) ** 2).sum())
        calib = estimate.CalibParams(
            affine_a=params.affine_a, affine_b=params.affine_b,
            ip_qo_floor=params.ip_qo_floor,
            dot_slack=params.slack_levels[0],
        )
        est_full, lower_msb = estimate.distances_with_bounds(
            ip_full, ip_msb, jnp.asarray(aux[0]), jnp.asarray(aux[1]),
            jnp.asarray(aux[2]), jnp.asarray(d_qp_sq), calib,
        )
        exact = ((np.asarray(qpad[qi])[None] - raw[np.maximum(nbr, 0)]) ** 2).sum(-1)
        ests.append(np.asarray(est_full)[valid])
        lowers.append(np.asarray(lower_msb)[valid])
        exacts.append(exact[valid])

    est = np.concatenate(ests)
    lower = np.concatenate(lowers)
    exact = np.concatenate(exacts)
    # (a) the partial-decode bound never (materially) exceeds the full
    # estimate it gates
    assert (lower <= est * 1.05 + 1e-3).mean() > 0.98, (
        f"MSB bound above full estimate for "
        f"{(lower > est * 1.05 + 1e-3).mean():.1%} of edges"
    )
    # (b) it holds below the exact distance for the vast majority
    assert (lower <= exact * 1.05 + 1e-3).mean() > 0.95, (
        f"MSB bound violates exact distance for "
        f"{(lower > exact * 1.05 + 1e-3).mean():.1%} of edges"
    )


def test_nbit_recall_parity(small_index, rng):
    """2/4-bit graph search must not trail the 1-bit fixture's recall
    floor (more code bits => better estimates; the dual-bound path must
    not lose what the extra bits buy)."""
    res, signs, x, params, bits = small_index
    queries = x[rng.choice(len(x), 40, replace=False)]
    queries = queries + 0.05 * rng.standard_normal(queries.shape).astype(
        np.float32
    )
    d = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, 1)[:, :10]
    ids, _ = run_search(res, signs, queries, k=10, params=params, bits=bits)
    recall = (ids[:, :, None] == gt[:, None, :]).any(-1).mean()
    assert recall > 0.9, f"bits={bits} graph recall@10={recall}"
