"""Huber-IRLS robust affine regression (host-side numpy).

Re-implementation of the affine correction fit inside calibrate_estimator
(/root/reference/include/cphnsw/api/hnsw_index.hpp:924-1017): OLS init,
Huber-weighted IRLS with a MAD-derived delta, and degeneracy detection via
R^2 / leverage diagnostics that falls back to the identity map.

This is O(samples) scalar math producing two floats — host-side numpy by
design (SURVEY.md section 7: "Huber/Grimshaw/KS calibration -> host-side").
"""

from __future__ import annotations

import numpy as np

# Reference core/constants.hpp:38-43
HUBER_DELTA_SCALE = 1.345
MAD_NORM_FACTOR = 1.4826
HUBER_MAX_ITER = 10
HUBER_CONVERGE_TOL = 1e-6
EPS_SMALL = 1e-12


def fit_affine_huber(estimates: np.ndarray, truths: np.ndarray):
    """Fit truths ~ a * estimates + b robustly.

    Returns (a, b, degenerate): degenerate=True means the fit was rejected
    (R^2 < 0.1 or max leverage > 4/n) and (a, b) = (1, 0) — the reference's
    identity fallback (hnsw_index.hpp:1009-1015).
    """
    e = np.asarray(estimates, dtype=np.float64)
    t = np.asarray(truths, dtype=np.float64)
    n = e.size

    mean_e = e.mean()
    mean_t = t.mean()
    var_e = (e * e).mean() - mean_e * mean_e
    cov_et = (e * t).mean() - mean_e * mean_t

    a, b = 1.0, 0.0
    if var_e > EPS_SMALL:
        a = cov_et / var_e
        b = mean_t - a * mean_e

    for _ in range(HUBER_MAX_ITER):
        r = t - (a * e + b)
        mad = np.median(np.abs(r))
        huber_delta = HUBER_DELTA_SCALE * MAD_NORM_FACTOR * mad
        if huber_delta < EPS_SMALL:
            break
        ar = np.abs(r)
        w = np.where(ar <= huber_delta, 1.0, huber_delta / np.maximum(ar, EPS_SMALL))
        wsum = w.sum()
        wm_e = (w * e).sum() / wsum
        wm_t = (w * t).sum() / wsum
        wvar = (w * e * e).sum() / wsum - wm_e * wm_e
        wcov = (w * e * t).sum() / wsum - wm_e * wm_t
        if wvar > EPS_SMALL:
            a_new = wcov / wvar
            b_new = wm_t - a_new * wm_e
            converged = abs(a_new - a) + abs(b_new - b) < HUBER_CONVERGE_TOL
            a, b = a_new, b_new
            if converged:
                break

    # Degeneracy diagnostics (hnsw_index.hpp:988-1015)
    fitted = a * e + b
    ss_res = ((t - fitted) ** 2).sum()
    ss_tot = ((t - mean_t) ** 2).sum()
    r_squared = 1.0 - ss_res / ss_tot if ss_tot > EPS_SMALL else 0.0

    sxx = var_e * n
    max_leverage = 0.0
    if sxx > EPS_SMALL:
        max_leverage = float((1.0 / n + (e - mean_e) ** 2 / sxx).max())
    leverage_threshold = 4.0 / max(n, 1)
    degenerate = (r_squared < 0.1) or (max_leverage > leverage_threshold)
    if degenerate:
        a, b = 1.0, 0.0
    return float(a), float(b), bool(degenerate)


def mad_sigma(values: np.ndarray) -> float:
    """MAD-based robust standard deviation estimate."""
    v = np.asarray(values, dtype=np.float64)
    med = np.median(v)
    return float(MAD_NORM_FACTOR * np.median(np.abs(v - med)))


def mad_lower_fence(values: np.ndarray, n_sigma: float = 3.0, floor: float = 1e-10):
    """median - n_sigma * MAD-sigma, floored (ip_qo_floor rule,
    hnsw_index.hpp:896-910)."""
    v = np.asarray(values, dtype=np.float64)
    med = float(np.median(v))
    return max(med - n_sigma * mad_sigma(v), floor)
