"""Rippe et al. 2001 polymer contact model.

Expected Hi-C contact count at genomic distance s (kb)::

    n(s) = fact * 0.53 * kuhn^-3 * (lm*s/kuhn)^slope
                * exp((d-2) / ((lm*s/kuhn)^2 + d))

floored at the inter-contig background v_inter, and 0 outside
(0, d_max). Matches reference kernel_sparse_adapt.cu:153-225 with one
fix: the reference's circular variant floors the result at p.d_max
(kernel :219), clamping expected counts to a genomic *distance* — an
obvious typo for p.v_inter, which we use.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RippeParams(NamedTuple):
    """Model parameters (reference param_simu struct, kernel :91-100)."""

    kuhn: jnp.ndarray  # Kuhn segment length (nm-equivalent, kb units here)
    lm: jnp.ndarray  # mass per unit length
    c1: jnp.ndarray  # precomputed 0.53 * (lm/kuhn)^slope * kuhn^-3
    slope: jnp.ndarray  # power-law exponent
    d: jnp.ndarray  # interaction distance parameter
    d_max: jnp.ndarray  # cis/trans crossover distance (kb)
    fact: jnp.ndarray  # scale factor
    v_inter: jnp.ndarray  # inter-contig (trans) expected count

    @classmethod
    def make(cls, kuhn, lm, slope, d, d_max, fact, v_inter) -> "RippeParams":
        """Build params, deriving c1 (reference cuda_lib_gl_single.py:2206-2221)."""
        kuhn = abs(float(kuhn))
        lm = abs(float(lm))
        fact = abs(float(fact))
        c1 = float(0.53 * (lm / kuhn) ** slope * kuhn**-3)
        # host-side numpy scalars: eager jnp scalar construction would
        # trigger a tiny device compilation per field, which is extremely
        # slow through a tunneled TPU backend.
        return cls(
            *[
                np.float32(v)
                for v in (kuhn, lm, c1, slope, d, d_max, fact, v_inter)
            ]
        )

    def to_numpy(self) -> np.ndarray:
        return np.array([float(v) for v in self], dtype=np.float32)


def rippe_contacts(s, p: RippeParams):
    """Expected cis contact count at distance s kb (kernel :153-163)."""
    s_safe = jnp.where(s > 0, s, 1.0)
    val = (
        p.c1
        * jnp.power(s_safe, p.slope)
        * jnp.exp((p.d - 2.0) / (jnp.square(s_safe * p.lm / p.kuhn) + p.d))
        * p.fact
    )
    result = jnp.where((s > 0.0) & (s < p.d_max), val, 0.0)
    return jnp.maximum(result, p.v_inter)


def rippe_contacts_circ(s, s_tot, p: RippeParams):
    """Circular-contig variant (kernel :200-225): distance mapped to
    n = K*s*(s_tot-s)/s_tot. Floored at v_inter (see module docstring).
    """
    K = p.lm / p.kuhn
    s_tot_safe = jnp.where(s_tot > 0, s_tot, 1.0)
    n = K * s * (s_tot_safe - s) / s_tot_safe
    n_safe = jnp.where(n > 0, n, 1.0)
    val = (
        jnp.power(p.kuhn, -3.0)
        * jnp.power(n_safe, p.slope)
        * jnp.exp((p.d - 2.0) / (jnp.square(n_safe) + p.d))
        * p.fact
    )
    result = jnp.where((s > 0.0) & (s < p.d_max), val, 0.0)
    return jnp.maximum(result, p.v_inter)


def expected_counts(s, s_tot, p: RippeParams):
    """Dispatch linear/circular by s_tot (0 => linear), like the kernels."""
    return jnp.where(
        s_tot == 0.0,
        rippe_contacts(s, p),
        rippe_contacts_circ(s, s_tot, p),
    )


def expected_counts_fast(s, s_tot, p: RippeParams):
    """Single-transcendental form of `expected_counts`.

    The two kernel branches collapse algebraically: with K = lm/kuhn,

      linear   = 0.53 * kuhn^-3 * fact * f(s*K)
      circular =        kuhn^-3 * fact * f(K*s*(s_tot-s)/s_tot)

    where f(x) = x^slope * exp((d-2)/(x^2+d)) — because
    c1*s^slope = 0.53*(K^slope)*kuhn^-3*s^slope = 0.53*kuhn^-3*(sK)^slope.
    One pow + one exp instead of the dispatch's two of each (`jnp.where`
    evaluates both branches). Equal to `expected_counts` up to float32
    association (~1e-7 relative); the hot scoring path uses this form,
    reference-spec code paths keep the branch-exact `expected_counts`.
    """
    return expected_counts_with_log10(s, s_tot, p)[0]


LOG10_E_ = np.float32(0.4342944819032518)
LN_053 = np.float32(-0.6348782724359695)  # ln(0.53)


def expected_counts_with_log10(s, s_tot, p: RippeParams):
    """(ex, log10(ex)) at 2 transcendentals per element.

    The single-exp rewrite of `expected_counts_fast`:

      val = coef * exp(slope*ln(x) + (d-2)/(x^2+d)),
      coef = w * kuhn^-3 * fact

    makes the exp's argument (plus ln(coef)) the natural log of val, so
    log10(val) falls out with no extra elementwise transcendental —
    where the naive form pays pow (= log+exp), exp AND log10 per
    element (7 -> 4 per pixel across the two expectations of
    `pp_rows_fast`, the hot-loop bound on TPU: the dense-grid rescore
    fusion is VPU-transcendental-bound, 33% of a yeast-L4 sweep step).
    Scalar logs of (kuhn, fact, v_inter) are hoisted out of the
    element loop. Equal to `expected_counts` up to f32 association.
    """
    K = p.lm / p.kuhn
    circ = s_tot > 0
    s_tot_safe = jnp.where(circ, s_tot, 1.0)
    x = s * K * jnp.where(circ, (s_tot_safe - s) / s_tot_safe, 1.0)
    x_safe = jnp.where(x > 0, x, 1.0)
    # per-element: 1 log + 1 exp
    ln_arg = p.slope * jnp.log(x_safe) + (p.d - 2.0) / (
        jnp.square(x_safe) + p.d
    )
    # scalar hoists (traced once per call, not per element)
    ln_coef0 = jnp.log(p.fact) - 3.0 * jnp.log(p.kuhn)
    ln_coef = ln_coef0 + jnp.where(circ, 0.0, LN_053)
    val = jnp.exp(ln_arg + ln_coef)
    log10_v_inter = jnp.log(jnp.maximum(p.v_inter, 1e-38)) * LOG10_E_
    take_val = (s > 0.0) & (s < p.d_max) & (val > p.v_inter)
    ex = jnp.where(take_val, val, p.v_inter)
    log10_ex = jnp.where(
        take_val, (ln_arg + ln_coef) * LOG10_E_, log10_v_inter
    )
    return ex, log10_ex
