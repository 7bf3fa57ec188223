"""Alternative broken-power-law ("exp") contact model.

Equivalent of reference init_nuisance.py: a two-slope model with a
short-range distance bias, fit by log-space least squares followed by a
bounded L-BFGS-B refinement. Only used when use_rippe=False — the
reference never reaches it from the CLI (SURVEY.md §2.2) but the model
is part of the API surface (param_simu_exp struct,
cuda_lib_gl_single.py:249-258).

Model::

    n(s) = A * s^alpha_0 * exp((d_exp-2)/(s^2+d_exp))    for s < d_init
    n(s) = n(d_init) * (s/d_init)^alpha_1                for s >= d_init
"""

from __future__ import annotations

import warnings
from typing import NamedTuple

import numpy as np
from scipy.optimize import fsolve, leastsq, minimize

D0 = 1.0  # short-range bias distance (reference init_nuisance.py:9)
D_EXP = -10.0


class ExpParams(NamedTuple):
    """param_simu_exp equivalent (reference cuda_lib_gl_single.py:249)."""

    d0: np.float32
    d_max: np.float32
    alpha_0: np.float32
    alpha_1: np.float32
    fact: np.float32
    v_inter: np.float32

    @classmethod
    def make(cls, d0, d_max, alpha_0, alpha_1, fact, v_inter):
        return cls(
            *[np.float32(v) for v in (d0, d_max, alpha_0, alpha_1, fact, v_inter)]
        )


def peval(x, param):
    """Model value; param = [d_init, alpha_0, alpha_1, A]."""
    d_init, a0, a1, A = param
    x = np.asarray(x, dtype=np.float64)
    val_lim = (
        A
        * np.power(d_init, a0 - a1)
        * np.exp((D_EXP - 2) / (d_init**2 + D_EXP))
    )
    short = A * np.power(x, a0, where=x > 0, out=np.ones_like(x)) * np.exp(
        (D_EXP - 2) / (np.square(x) + D_EXP)
    )
    long = val_lim * np.power(x, a1, where=x > 0, out=np.ones_like(x))
    return np.where(x < d_init, short, long)


def _log_model(x, d_init, a0, a1, A):
    x = np.asarray(x, dtype=np.float64)
    log_lim = (
        np.log(A)
        + (a0 - a1) * np.log(d_init)
        + (D_EXP - 2) / (d_init**2 + D_EXP)
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        short = (
            np.log(A) + a0 * np.log(x) + (D_EXP - 2) / (np.square(x) + D_EXP)
        )
        long = log_lim + a1 * np.log(x)
    out = np.where((x > 0) & (x < d_init), short, long)
    return np.where(x <= 0, 0.0, out)


def estimate_param_hic(y_meas, x_bins):
    """Two-stage fit (reference init_nuisance.py:78-113): log leastsq on
    (alpha_0, alpha_1, A) with d_init fixed, then bounded L-BFGS-B over
    all four. Returns (result, fitted curve)."""
    y_meas = np.asarray(y_meas, dtype=np.float64)
    x_bins = np.asarray(x_bins, dtype=np.float64)
    a0, a1 = -10.0, -1.5
    x0 = x_bins.min()
    A = y_meas.max() * x0 ** (-a0) / np.exp((D_EXP - 2) / (x0**2 + D_EXP))
    log_y = np.log(np.maximum(y_meas, 1e-30))

    def resid(p):
        pa0, pa1, pA = p
        return log_y - _log_model(x_bins, D0, pa0, pa1, max(pA, 1e-30))

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        plsq = leastsq(lambda p, y, x: resid(p), [a0, a1, A], args=(log_y, x_bins))
    a0, a1, A = plsq[0]

    def loss(p):
        d_init, pa0, pa1, pA = p
        err = log_y - _log_model(x_bins, max(d_init, 1e-3), pa0, pa1, max(pA, 1e-30))
        return float(np.sqrt(np.square(err).sum()))

    bnds = ((0, 3), (-10, -0.2), (-2, -0.2), (1e-12, None))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        res = minimize(
            loss, [D0, a0, a1, A], method="L-BFGS-B", bounds=bnds
        )
    return res, peval(x_bins, res.x)


def estimate_max_dist_intra(p, val_inter, s0: float = 500.0):
    """Cis/trans crossover for the exp model (reference :124-139)."""

    def resid(x):
        return val_inter - peval(np.atleast_1d(np.abs(x)), p)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        x = fsolve(resid, s0)
    return float(np.abs(x[0]))
