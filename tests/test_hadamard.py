import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.ops import hadamard


def naive_fwht(x):
    x = np.asarray(x, dtype=np.float64).copy()
    d = x.shape[-1]
    h = 1
    while h < d:
        for i in range(0, d, 2 * h):
            for j in range(i, i + h):
                a, b = x[..., j].copy(), x[..., j + h].copy()
                x[..., j] = a + b
                x[..., j + h] = a - b
        h *= 2
    return x


def test_next_pow2():
    assert hadamard.next_pow2(1) == 1
    assert hadamard.next_pow2(128) == 128
    assert hadamard.next_pow2(129) == 256
    assert hadamard.next_pow2(960) == 1024


def test_fwht_matches_naive(rng):
    for d in (8, 32, 128):
        x = rng.standard_normal((5, d)).astype(np.float32)
        got = np.asarray(hadamard.fwht(jnp.asarray(x)))
        want = naive_fwht(x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fwht_scales_norm_by_sqrt_d(rng):
    d = 64
    x = rng.standard_normal((7, d)).astype(np.float32)
    y = np.asarray(hadamard.fwht(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1),
        np.sqrt(d) * np.linalg.norm(x, axis=-1),
        rtol=1e-5,
    )


def test_rotation_is_orthonormal(rng):
    """3x(diag o FWHT) with combined P**-1.5 scaling preserves norms and
    inner products."""
    p = 128
    signs = hadamard.rotation_signs(42, p)
    x = rng.standard_normal((10, p)).astype(np.float32)
    y = np.asarray(hadamard.rotate(jnp.asarray(x), signs))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
    np.testing.assert_allclose(y @ y.T, x @ x.T, rtol=1e-3, atol=1e-3)


def test_rotation_deterministic_per_seed():
    p = 64
    s1 = np.asarray(hadamard.rotation_signs(42, p))
    s2 = np.asarray(hadamard.rotation_signs(42, p))
    s3 = np.asarray(hadamard.rotation_signs(43, p))
    assert np.array_equal(s1, s2)
    assert not np.array_equal(s1, s3)
    assert set(np.unique(s1)) <= {-1.0, 1.0}


def test_rotate_raw_pads(rng):
    signs = hadamard.rotation_signs(42, 128)
    x = rng.standard_normal((3, 100)).astype(np.float32)
    y = np.asarray(hadamard.rotate_raw(jnp.asarray(x), signs))
    assert y.shape == (3, 128)
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
