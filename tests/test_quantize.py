import jax.numpy as jnp
import numpy as np
import pytest

from cphnsw_tpu.ops import estimate, hadamard, pack, quantize

P = 64


@pytest.fixture(scope="module")
def signs():
    return hadamard.rotation_signs(42, P)


def test_pack_unpack_roundtrip(rng):
    for bits in (1, 2, 4):
        u = rng.integers(0, 1 << bits, size=(10, 3, P))
        planes = pack.pack_planes(jnp.asarray(u), bits)
        assert planes.shape == (10, 3, bits, P // 32)
        back = np.asarray(pack.unpack_planes(planes, P))
        np.testing.assert_array_equal(back, u)


def test_unpack_msb(rng):
    u = rng.integers(0, 16, size=(8, P))
    planes = pack.pack_planes(jnp.asarray(u), 4)
    msb = np.asarray(pack.unpack_msb(planes, P, 4))
    np.testing.assert_array_equal(msb, u >> 2)  # top-2 bits, K_partial=3
    u1 = rng.integers(0, 2, size=(8, P))
    planes1 = pack.pack_planes(jnp.asarray(u1), 1)
    np.testing.assert_array_equal(np.asarray(pack.unpack_msb(planes1, P, 1)), u1)


def test_encode_1bit_signs_and_ipqo(rng, signs):
    vecs = rng.standard_normal((50, P)).astype(np.float32)
    centroid = vecs.mean(axis=0)
    enc = quantize.encode_vectors(jnp.asarray(vecs), jnp.asarray(centroid), signs, 1)
    # reproduce by hand
    centered = vecs - centroid
    nop = np.linalg.norm(centered, axis=-1)
    rotated = np.asarray(hadamard.rotate(jnp.asarray(centered / nop[:, None]), signs))
    np.testing.assert_allclose(np.asarray(enc.nop), nop, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(enc.u), (rotated >= 0).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(enc.ip_qo),
        np.abs(rotated).sum(-1) / np.sqrt(P),
        rtol=1e-4,
    )


def test_caq_improves_or_matches_init_cosine(rng, signs):
    """CAQ coordinate descent never degrades the cos^2 of the LVQ init."""
    x = rng.standard_normal((40, P)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    xr = np.asarray(hadamard.rotate(jnp.asarray(x), signs))
    for bits in (2, 4):
        k = (1 << bits) - 1
        u, ip_qo, _ = quantize.caq_quantize(jnp.asarray(xr), bits)
        u = np.asarray(u)
        assert u.min() >= 0 and u.max() <= k
        # LVQ init for comparison
        vmin = xr.min(-1, keepdims=True)
        vmax = xr.max(-1, keepdims=True)
        delta = np.maximum((vmax - vmin) / k, 1e-12)
        u0 = np.clip(np.round((xr - vmin) / delta), 0, k)
        c0 = (2 * u0 - k) / k
        c1 = (2 * u - k) / k
        cos0 = (c0 * xr).sum(-1) ** 2 / (c0 * c0).sum(-1)
        cos1 = (c1 * xr).sum(-1) ** 2 / (c1 * c1).sum(-1)
        assert np.all(cos1 >= cos0 - 1e-5)
        # ip_qo definition: <c_bar, rotated>/sqrt(P)
        np.testing.assert_allclose(
            np.asarray(ip_qo), (c1 * xr).sum(-1) / np.sqrt(P), rtol=1e-4, atol=1e-6
        )


def test_estimator_unbiasedness(rng, signs):
    """The core RaBitQ estimator: ip_corrected/ip_qo approximates
    <q - p, (n - p)/||n-p||> (reference semantics, hnsw_index.hpp:855-861)."""
    n_edges = 200
    parents = rng.standard_normal((n_edges, P)).astype(np.float32)
    neighbors = parents + 0.3 * rng.standard_normal((n_edges, P)).astype(np.float32)
    queries = parents + 0.5 * rng.standard_normal((n_edges, P)).astype(np.float32)

    rot_parents = np.asarray(hadamard.rotate_raw(jnp.asarray(parents), signs))
    min_corr = {1: 0.75, 2: 0.9, 4: 0.95}
    # estimator residual is O(||q-p||/(2^B * sqrt(D))); allow ~2x headroom
    max_rel_resid = {1: 0.2, 2: 0.1, 4: 0.06}
    prev_resid = np.inf
    for bits in (1, 2, 4):
        enc = quantize.encode_residuals(
            jnp.asarray(parents), jnp.asarray(neighbors),
            jnp.asarray(rot_parents), signs, bits,
        )
        qc = quantize.encode_queries(jnp.asarray(queries), signs)
        fs = estimate.fastscan_sums(
            np.asarray(enc.u)[:, None, :], qc.q_u
        )[:, 0]
        wpc = np.asarray(enc.u).sum(-1)
        k = float((1 << bits) - 1)
        ip_approx = np.asarray(
            estimate.ip_from_fastscan(
                fs, jnp.asarray(wpc), qc.coeff_a, qc.coeff_b, qc.coeff_c, k
            )
        )
        est = (ip_approx - np.asarray(enc.ip_cp)) / np.asarray(enc.ip_qo)
        diff = neighbors - parents
        truth = ((queries - parents) * diff).sum(-1) / np.linalg.norm(diff, axis=-1)
        corr = np.corrcoef(est, truth)[0, 1]
        qp_norm = np.linalg.norm(queries - parents, axis=-1)
        mean_resid = np.abs(est - truth).mean()
        rel_resid = (np.abs(est - truth) / qp_norm).mean()
        assert corr > min_corr[bits], f"bits={bits}: corr={corr}"
        assert rel_resid < max_rel_resid[bits], f"bits={bits}: {rel_resid}"
        # higher bit widths must shrink the residual
        assert mean_resid < prev_resid + 1e-9
        prev_resid = mean_resid


def test_exact_l2(rng):
    q = rng.standard_normal((4, P)).astype(np.float32)
    v = rng.standard_normal((4, 7, P)).astype(np.float32)
    got = np.asarray(
        estimate.exact_l2_sq(
            jnp.asarray(q),
            jnp.asarray((q * q).sum(-1)),
            jnp.asarray(v),
            jnp.asarray((v * v).sum(-1)),
        )
    )
    want = ((q[:, None, :] - v) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_distances_with_bounds_formula(rng):
    nop = np.abs(rng.standard_normal(16)).astype(np.float32) + 0.5
    ip_qo = np.abs(rng.standard_normal(16)).astype(np.float32) + 0.3
    ip_cp = rng.standard_normal(16).astype(np.float32) * 0.1
    ip_approx = rng.standard_normal(16).astype(np.float32) * 0.5
    dqp = np.float32(2.0)
    calib = estimate.CalibParams(1.1, -0.02, 0.05, 0.03)
    est, lower = estimate.distances_with_bounds(
        jnp.asarray(ip_approx), jnp.asarray(ip_approx),
        jnp.asarray(nop), jnp.asarray(ip_qo), jnp.asarray(ip_cp), dqp, calib,
    )
    ip_qo_p = np.maximum(ip_qo, 0.05)
    ip_est = 1.1 * ((ip_approx - ip_cp) / ip_qo_p) - 0.02
    want_est = np.maximum(nop**2 + dqp - 2 * nop * ip_est, 0.0)
    cos_u = np.clip((ip_est + 0.03) / np.sqrt(dqp), -1, 1)
    want_lower = np.maximum(nop**2 + dqp - 2 * nop * np.sqrt(dqp) * cos_u, 0.0)
    np.testing.assert_allclose(np.asarray(est), want_est, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lower), want_lower, rtol=1e-5, atol=1e-5)


def test_caq_matches_reference_port(rng, signs):
    """caq_quantize (batched scan) must track a direct python port of the
    reference's per-vector coordinate descent (rabitq_encoder.hpp:371-467)
    in quantization quality (cos^2), and closely in code agreement."""
    x = rng.standard_normal((12, P)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    xr = np.asarray(hadamard.rotate(jnp.asarray(x), signs))

    def ref_caq(vec, bits):
        k_int = (1 << bits) - 1
        k = float(k_int)
        vmin, vmax = vec.min(), vec.max()
        delta = max((vmax - vmin) / k, 1e-12)
        u = np.clip(np.round((vec - vmin) / delta), 0, k_int).astype(int)
        c = (2 * u - k) / k
        dot, norm = float((c * vec).sum()), float((c * c).sum())
        for _ in range(10):
            changed = False
            for i in range(len(vec)):
                c_old = (2 * u[i] - k) / k
                dot_wo = dot - c_old * vec[i]
                norm_wo = norm - c_old * c_old
                best_u, best_dot, best_norm = u[i], dot, norm
                cands = (
                    range(k_int + 1) if bits < 4
                    else [u[i] - 1, u[i] + 1]
                )
                for ut in cands:
                    if ut < 0 or ut > k_int or ut == u[i]:
                        continue
                    cn = (2 * ut - k) / k
                    nd, nn = dot_wo + cn * vec[i], norm_wo + cn * cn
                    if nd * nd * best_norm > best_dot * best_dot * nn:
                        best_u, best_dot, best_norm = ut, nd, nn
                if best_u != u[i]:
                    cn = (2 * best_u - k) / k
                    dot, norm = dot_wo + cn * vec[i], norm_wo + cn * cn
                    u[i] = best_u
                    changed = True
            if not changed:
                break
        return u

    for bits in (2, 4):
        k = (1 << bits) - 1
        u_ours = np.asarray(quantize.caq_quantize(jnp.asarray(xr), bits)[0])
        for i in range(len(xr)):
            u_ref = ref_caq(xr[i].astype(np.float64), bits)
            c_ref = (2 * u_ref - k) / k
            c_our = (2 * u_ours[i] - k) / k
            cos_ref = (c_ref * xr[i]).sum() ** 2 / (c_ref**2).sum()
            cos_our = (c_our * xr[i]).sum() ** 2 / (c_our**2).sum()
            # quality parity (both are local optima of the same objective)
            assert cos_our >= cos_ref - 1e-3, f"bits={bits} vec={i}"
            # codes should agree on the vast majority of coordinates
            agree = (u_ref == u_ours[i]).mean()
            assert agree > 0.9, f"bits={bits} vec={i}: agree={agree}"


