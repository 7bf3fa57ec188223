"""Least-squares fit of the Rippe contact curve to binned cis contacts.

Host-side scipy code, equivalent of reference optim_rippe_curve_update.py.
The model is fit in log space with fixed d=2; the cis/trans crossover
distance d_max is solved from the fitted curve against the trans level.
"""

from __future__ import annotations

import warnings

import numpy as np
from scipy.optimize import fsolve, leastsq

D_FIXED = 2.0  # reference optim_rippe_curve_update.py:8
INIT_KUHN = 50.0
INIT_LM = 9.6
INIT_SLOPE = -1.5
LOWER_FACT = 7.0  # reference :79


def peval(x, param):
    """Rippe curve value; param = [kuhn, lm, slope, (d,) A]."""
    kuhn, lm, slope = param[0], param[1], param[2]
    A = param[-1]
    x = np.asarray(x, dtype=np.float64)
    return A * (
        0.53
        * kuhn**-3.0
        * np.power(lm * x / kuhn, slope)
        * np.exp((D_FIXED - 2.0) / (np.power(lm * x / kuhn, 2) + D_FIXED))
    )


def _log_residuals(p, y, x):
    kuhn, lm, slope, A = p
    with np.errstate(invalid="ignore", divide="ignore"):
        model = (
            np.log(A)
            + np.log(0.53)
            - 3.0 * np.log(kuhn)
            + slope * np.log(lm * x / kuhn)
            + (D_FIXED - 2.0) / (np.power(lm * x / kuhn, 2) + D_FIXED)
        )
    return y - model


def estimate_param_rippe(y_meas, x_bins):
    """Fit [kuhn, lm, slope, d, A] to mean contacts vs distance.

    Reference optim_rippe_curve_update.py:64-106: log-space leastsq from
    fixed inits, y divided by LOWER_FACT, with a fallback rescale when the
    fit diverges (NaNs or non-negative slope).
    """
    y_meas = np.asarray(y_meas, dtype=np.float64)
    x_bins = np.asarray(x_bins, dtype=np.float64)
    A0 = float(np.max(y_meas))
    p0 = [INIT_KUHN, INIT_LM, INIT_SLOPE, A0]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        plsq = leastsq(
            _log_residuals, p0, args=(np.log(y_meas / LOWER_FACT), x_bins)
        )
    kuhn, lm, slope, A = plsq[0]
    out = [kuhn, lm, slope, D_FIXED, A]
    y_estim = peval(x_bins, [kuhn, lm, slope, A])

    if np.any(np.isnan(out)) or slope >= 0:
        # degenerate fit: keep the shape from the inits, rescale amplitude
        # to match the first bin (reference :97-104)
        test = peval(x_bins, [INIT_KUHN, INIT_LM, INIT_SLOPE, A0])
        new_A = y_meas[0] * A0 / test.max()
        out = [INIT_KUHN, INIT_LM, INIT_SLOPE, D_FIXED, A0 * new_A]
        y_estim = peval(x_bins, [INIT_KUHN, INIT_LM, INIT_SLOPE, new_A])
    return out, y_estim


def _residual_4_max_dist(x, p):
    kuhn, lm, slope, d, A, y = p
    x = np.abs(np.nan_to_num(np.asarray(x, dtype=np.float64)))
    return np.abs(y - peval(x, [kuhn, lm, slope, A]))


def estimate_max_dist_intra(param, val_inter, s0: float = 500.0):
    """Distance where the cis curve crosses the trans level
    (reference :120-134; :137-149 for the warm-started nuisance variant).
    """
    kuhn, lm, slope, d, A = param
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        x = fsolve(
            _residual_4_max_dist, s0, args=([kuhn, lm, slope, d, A, val_inter],)
        )
    return float(np.abs(x[0]))


def estimate_max_dist_intra_nuis(param, val_inter, old_s):
    """Warm-started crossover solve used by the nuisance MH sampler."""
    kuhn, lm, slope, d, A = param
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        x = fsolve(
            _residual_4_max_dist,
            old_s,
            args=([kuhn, lm, slope, d, A, val_inter],),
        )
    return float(x[0])
