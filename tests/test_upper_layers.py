import jax.numpy as jnp
import numpy as np

from cphnsw_tpu.api import upper_layers as ul


def test_level_assignment_distribution(rng):
    levels = ul.assign_levels(200_000, 18, seed=1)
    assert levels.min() == 0
    # P(level >= 1) = 1/M_UPPER
    frac = (levels >= 1).mean()
    assert abs(frac - 1 / 18) < 0.01
    frac2 = (levels >= 2).mean()
    assert abs(frac2 - 1 / 18**2) < 0.005


def test_upper_degree_formula():
    # R=32, P=128: 16 + min(11//4, 8) = 18
    assert ul.upper_layer_degree(32, 128) == 18
    assert ul.upper_layer_degree(32, 1024) == 24


def test_build_and_descend_finds_good_entry(rng):
    n, dim = 4000, 32
    centers = rng.standard_normal((16, dim)).astype(np.float32) * 4.0
    x = centers[rng.integers(0, 16, n)] + rng.standard_normal((n, dim)).astype(
        np.float32
    )
    raw = jnp.asarray(x)
    norm_sq = jnp.sum(raw * raw, -1)
    upper = ul.build_upper_layers(raw, norm_sq, r=32, seed=3)
    assert upper is not None
    assert len(upper.node_ids) >= 1

    queries = x[rng.choice(n, 32, replace=False)]
    qpad = jnp.asarray(queries)
    qnorm = jnp.sum(qpad * qpad, -1)
    entries = np.asarray(
        ul.greedy_descend(upper, raw, norm_sq, qpad, qnorm)
    )
    assert entries.ndim == 2  # (Q, ef) beam of entry candidates

    # the best descent entry should be far closer than a random/hub entry
    d_entry = ((queries[:, None, :] - x[entries]) ** 2).sum(-1).min(1)
    d_all = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    d_best = d_all.min(1)
    d_median = np.median(d_all, axis=1)
    # entry distance is within the best decile for most queries
    decile = np.quantile(d_all, 0.1, axis=1)
    assert (d_entry <= decile).mean() > 0.8
    assert (d_entry < d_median).all()
