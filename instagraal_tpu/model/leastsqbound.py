"""Bounded least squares with the classic leastsq call signature.

The reference vendors a Levenberg-Marquardt wrapper that maps bounded
("external") parameters to unbounded ("internal") ones with sin/sqrt
transforms (reference leastsqbound.py, 208 LoC — itself vendored from
the MINUIT tradition). SciPy has since grown native bound support in
`least_squares` (Trust Region Reflective), so this module exposes the
same call contract over the modern solver, plus the internal/external
transforms for callers that want the exact MINUIT-style mapping.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares


def internal2external(xi, bounds):
    """Map unbounded internal params to bounded external ones.

    Transforms (per parameter, matching the MINUIT conventions used by
    the reference):
      (None, None): x = xi
      (lb, None):   x = lb - 1 + sqrt(xi^2 + 1)
      (None, ub):   x = ub + 1 - sqrt(xi^2 + 1)
      (lb, ub):     x = lb + (ub - lb)/2 * (sin(xi) + 1)
    """
    out = np.empty_like(np.asarray(xi, dtype=np.float64))
    for i, (v, (lb, ub)) in enumerate(zip(xi, bounds)):
        if lb is None and ub is None:
            out[i] = v
        elif ub is None:
            out[i] = lb - 1.0 + np.sqrt(v * v + 1.0)
        elif lb is None:
            out[i] = ub + 1.0 - np.sqrt(v * v + 1.0)
        else:
            out[i] = lb + (ub - lb) / 2.0 * (np.sin(v) + 1.0)
    return out


def external2internal(xe, bounds):
    """Inverse of internal2external (clips to the open interval)."""
    out = np.empty_like(np.asarray(xe, dtype=np.float64))
    for i, (v, (lb, ub)) in enumerate(zip(xe, bounds)):
        if lb is None and ub is None:
            out[i] = v
        elif ub is None:
            out[i] = np.sqrt(max((v - lb + 1.0), 1.0) ** 2 - 1.0)
        elif lb is None:
            out[i] = np.sqrt(max((ub - v + 1.0), 1.0) ** 2 - 1.0)
        else:
            frac = np.clip(2.0 * (v - lb) / (ub - lb) - 1.0, -1.0, 1.0)
            out[i] = np.arcsin(frac)
    return out


def leastsqbound(func, x0, bounds=None, args=(), **kw):
    """Bounded least squares, scipy.optimize.leastsq-style return.

    Parameters mirror the reference's vendored API: `bounds` is a list
    of (lower, upper) tuples with None for unbounded sides. Returns
    (x, ier) where ier in 1..4 signals success.
    """
    x0 = np.asarray(x0, dtype=np.float64)
    if bounds is None:
        lb = -np.inf
        ub = np.inf
    else:
        lb = np.array(
            [b[0] if b[0] is not None else -np.inf for b in bounds]
        )
        ub = np.array(
            [b[1] if b[1] is not None else np.inf for b in bounds]
        )
        x0 = np.clip(x0, lb + 1e-12, ub - 1e-12)
    res = least_squares(
        lambda x: np.atleast_1d(func(x, *args)),
        x0,
        bounds=(lb, ub),
        **kw,
    )
    ier = 1 if res.success else 5
    return res.x, ier
