import numpy as np

from cphnsw_tpu.calibration import evt, huber


def test_huber_recovers_affine_with_outliers(rng):
    x = rng.standard_normal(2000)
    y = 2.5 * x - 0.7 + 0.05 * rng.standard_normal(2000)
    # inject 5% gross outliers
    idx = rng.choice(2000, 100, replace=False)
    y[idx] += rng.standard_normal(100) * 20
    a, b, degenerate = huber.fit_affine_huber(x, y)
    # fit itself must be accurate even if the leverage gate fires
    if not degenerate:
        assert abs(a - 2.5) < 0.1 and abs(b + 0.7) < 0.1
    else:
        # gate fired -> identity fallback contract
        assert (a, b) == (1.0, 0.0)


def test_huber_irls_accuracy_before_gate(rng):
    # Two-point-mass x keeps max leverage ~2/n < 4/n so the gate stays open
    x = rng.choice([-1.0, 1.0], 5000) + 0.05 * rng.standard_normal(5000)
    y = 1.7 * x + 0.3 + 0.02 * rng.standard_normal(5000)
    a, b, degenerate = huber.fit_affine_huber(x, y)
    assert abs(a - 1.7) < 0.05
    assert abs(b - 0.3) < 0.05


def test_mad_sigma_gaussian(rng):
    v = rng.standard_normal(20000) * 3.0
    assert abs(huber.mad_sigma(v) - 3.0) < 0.15


def test_gpd_fit_exponential(rng):
    # xi=0 case: exponential tail with scale beta
    data = rng.exponential(scale=2.0, size=20000)
    state = evt.fit_gpd_stable(data, min_tail=64)
    assert state.fitted
    assert abs(state.xi) < 0.15
    if not state.use_empirical:
        assert abs(state.beta - 2.0) < 0.6


def test_gpd_fit_pareto_tail(rng):
    # GPD with xi=0.3, beta=1: inverse-CDF sampling
    u = rng.uniform(size=30000)
    xi, beta = 0.3, 1.0
    data = beta / xi * ((1 - u) ** -xi - 1)
    state = evt.fit_gpd_stable(data, min_tail=64)
    assert state.fitted
    assert state.xi > 0.05  # recognizably heavy-tailed
    # quantile accuracy is what search consumes: compare at alpha=1e-3
    true_q = beta / xi * ((1e-3) ** -xi - 1)
    got_q = evt.evt_quantile(1e-3, state)
    assert 0.5 * true_q < got_q < 2.0 * true_q


def test_evt_quantile_monotone_and_tail(rng):
    data = rng.exponential(scale=1.0, size=10000)
    state = evt.fit_gpd_stable(data, min_tail=64)
    qs = [evt.evt_quantile(a, state) for a in (0.3, 0.1, 0.01, 1e-3, 1e-4)]
    assert all(q2 >= q1 - 1e-9 for q1, q2 in zip(qs, qs[1:]))
    # alpha above p_u returns the threshold itself
    assert evt.evt_quantile(0.5, state) == state.u


def test_evt_empirical_fallback_quantiles(rng):
    # Bimodal tail that a GPD fits poorly -> KS should reject -> empirical
    data = np.concatenate(
        [rng.exponential(1.0, 20000), 10.0 + 0.01 * rng.standard_normal(2000)]
    )
    state = evt.fit_gpd_stable(data, min_tail=64)
    assert state.fitted
    q = evt.evt_quantile(1e-3, state)
    assert np.isfinite(q) and q > state.u


def test_ks_critical_shrinks():
    assert evt.ks_critical(100) > evt.ks_critical(10000)


def test_evtstate_roundtrip(rng):
    data = rng.exponential(scale=1.0, size=5000)
    state = evt.fit_gpd_stable(data, min_tail=64)
    state2 = evt.EVTState.from_dict(state.to_dict())
    for a in (0.1, 0.01, 1e-4):
        assert evt.evt_quantile(a, state) == evt.evt_quantile(a, state2)
