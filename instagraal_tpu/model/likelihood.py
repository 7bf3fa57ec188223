"""Poisson log10-likelihood of a Hi-C contact map under the Rippe model.

Replaces the reference likelihood kernels:

- evaluate_likelihood_pxl_double  (kernel :251-270)  per-pixel term
- evaluate_likelihood_sparse      (kernel :4374)     full nnz sweep
- eval_likelihood_on_zero         (kernel :3850)     analytic zeros term
- uni_fill_vect_dist              (kernel :3763)     frag -> sub-frag projection

Design notes. The reference's per-pixel term mixes log10 and natural
units exactly as the CUDA does (e.g. ``- ex`` rather than
``- ex*log10(e)``); we replicate it bit-for-bit so scores are comparable.
Every pixel also adds back a "zero-model" correction
``+ expected_z * log10(e)`` cancelling that pixel's contribution to the
analytic zeros term (kernel :4462). All sums use XLA tree reductions;
on CPU tests validate against float64 NumPy references.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.state import FragState
from .rippe import RippeParams, expected_counts

LOG10_E = 0.43429448190325182  # reference cuda_lib_gl_single.py:128


def _log10_factorial_table() -> np.ndarray:
    """log10(ob!) for ob = 0..14, via the kernel's `factorial` (:111-124):
    exact product below 10, Stirling approximation from 10 on.
    """
    out = np.zeros(15, dtype=np.float64)
    for n in range(15):
        if n < 10:
            out[n] = math.log10(math.factorial(n))
        else:
            stirling = n**n * math.exp(-n) * math.sqrt(2 * math.pi * n)
            out[n] = math.log10(stirling)
    return out


# kept as a host numpy constant: a module-level jnp.asarray would
# initialize the default JAX backend at import time (observed to hang
# every CPU-only entry point for minutes when a TPU transport plugin is
# registered but its endpoint is unreachable). jnp converts it at trace
# time, where the platform choice has already been made.
_LOG10_FACT = _log10_factorial_table().astype(np.float32)


def poisson_norm(ob: np.ndarray) -> np.ndarray:
    """Data-only normalization of `log10_poisson`, precomputed on host.

    log10_poisson(ex, ob) == ob*log10(ex) - ex - poisson_norm(ob) for
    every branch of the kernel's per-pixel term (evaluate_likelihood_pxl
    :251-270): norm(0) = 0 reproduces the ob==0 branch, 0<ob<15 uses the
    factorial table, ob>=15 the Stirling formula with the kernel's
    log10/natural unit mixing. Observed counts are constant for a run,
    so the hot scoring path gathers this instead of re-deriving the
    factorial/Stirling term per pixel per mutation.
    """
    ob = np.asarray(ob, dtype=np.float64)
    out = np.zeros_like(ob)
    table = _log10_factorial_table()
    small = ob < 15.0
    idx = np.clip(ob[small].astype(np.int64), 0, 14)
    out[small] = table[idx]
    big = ~small
    obb = ob[big]
    out[big] = (
        obb * np.log10(obb)
        - obb
        + np.log10(np.sqrt(obb * 2.0 * np.pi))
    )
    return out.astype(np.float32)


def log10_poisson(ex, ob):
    """Per-pixel score (kernel evaluate_likelihood_pxl_double :251-270)."""
    ob_f = ob.astype(jnp.float32) if hasattr(ob, "astype") else jnp.float32(ob)
    big = ob_f >= 15.0
    # Stirling branch (ob >= 15)
    stirling = (
        ob_f * jnp.log10(jnp.maximum(ex, 1e-38))
        - ex
        - (
            ob_f * jnp.log10(jnp.maximum(ob_f, 1.0))
            - ob_f
            + jnp.log10(jnp.sqrt(jnp.maximum(ob_f, 1.0) * 2.0 * jnp.pi))
        )
    )
    # small-count branch (0 < ob < 15)
    idx = jnp.clip(ob_f.astype(jnp.int32), 0, 14)
    small = (
        ob_f * jnp.log10(jnp.maximum(ex, 1e-38))
        - ex
        - jnp.asarray(_LOG10_FACT)[idx]
    )
    res = jnp.where(big, stirling, jnp.where(ob_f > 0, small, -ex))
    return jnp.where(ex != 0.0, res, 0.0)


class SubVectors(NamedTuple):
    """Per-sub-fragment genome geometry (the 5 `sub_vect_*` arrays)."""

    pos_bp: jnp.ndarray  # genomic position within contig, kb (float)
    id_c: jnp.ndarray  # contig id (int)
    s_tot: jnp.ndarray  # circular-contig total length kb, 0 if linear
    pos: jnp.ndarray  # position within contig in sub-fragment units (int)
    l_cont: jnp.ndarray  # contig length in sub-fragments (int)


class SubIndex(NamedTuple):
    """Static mapping from sub-fragments to their owning fragments.

    Built once per run from the pyramid (reference simu_single.py:674-723
    create_sub_frags / np_sub_frags_2_frags).
    """

    frag_of_sub: jnp.ndarray  # [n_sub] owning fragment id
    w_dist: jnp.ndarray  # [n_sub] midpoint offset, watson orientation (kb)
    c_dist: jnp.ndarray  # [n_sub] midpoint offset, crick orientation (kb)
    j_of_sub: jnp.ndarray  # [n_sub] index of the sub-frag within its fragment


def project_to_sub(state: FragState, idx: SubIndex) -> SubVectors:
    """Project fragment-level genome state to sub-fragment vectors.

    Vectorized uni_fill_vect_dist (kernel :3763-3822): each sub-fragment
    inherits its fragment's contig/position, offset by the precomputed
    watson/crick midpoint distance depending on orientation.
    """
    f = idx.frag_of_sub
    ori = state.ori[f]
    d = jnp.where(ori == 1, idx.w_dist, idx.c_dist)
    pos = jnp.where(
        ori == 1,
        state.sub_pos[f] + idx.j_of_sub,
        state.sub_pos[f] + (state.sub_len[f] - 1) - idx.j_of_sub,
    )
    return SubVectors(
        pos_bp=state.start_bp[f].astype(jnp.float32) / 1000.0 + d,
        id_c=state.id_c[f],
        s_tot=(
            state.circ[f].astype(jnp.float32)
            * state.l_cont_bp[f].astype(jnp.float32)
            / 1000.0
        ),
        pos=pos,
        l_cont=state.sub_l_cont[f],
    )


def nz_log_likelihood(
    sub: SubVectors,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    data: jnp.ndarray,
    p: RippeParams,
    mean_size_frag,
    weights: jnp.ndarray | None = None,
):
    """Likelihood over the non-zero pixels of the COO contact matrix.

    Mirrors evaluate_likelihood_sparse (kernel :4374-4488): per pixel,
    cis pixels get the Rippe expectation at the kb distance plus the
    zero-model correction at the sub-fragment-count distance; trans
    pixels get v_inter for both. `weights` optionally masks pixels
    (used by the sliced scoring backend).
    """
    cis = sub.id_c[rows] == sub.id_c[cols]
    s = jnp.abs(sub.pos_bp[rows] - sub.pos_bp[cols])
    s_z = (
        jnp.abs(sub.pos[rows] - sub.pos[cols]).astype(jnp.float32)
        * mean_size_frag
    )
    s_tot = sub.s_tot[rows]
    s_tot_z = sub.l_cont[rows].astype(jnp.float32) * mean_size_frag
    circ = s_tot > 0

    ex = jnp.where(cis, expected_counts(s, jnp.where(circ, s_tot, 0.0), p), p.v_inter)
    ex_z = jnp.where(
        cis,
        expected_counts(s_z, jnp.where(circ, s_tot_z, 0.0), p),
        p.v_inter,
    )
    per_pixel = log10_poisson(ex, data) + ex_z * LOG10_E
    if weights is not None:
        per_pixel = per_pixel * weights
    return jnp.sum(per_pixel)


def zeros_log_likelihood(
    sub: SubVectors,
    p: RippeParams,
    mean_size_frag,
    n_pix_total,
):
    """Analytic likelihood contribution of all zero pixels.

    Mirrors eval_likelihood_on_zero (kernel :3850-3917) plus the host-side
    trans term (reference cuda_lib_gl_single.py:755-759): each sub-frag at
    position pos > 0 accounts for the (l_cont - pos) zero diagonals at
    distance pos, and all remaining trans pixel pairs contribute -v_inter.
    """
    s = sub.pos.astype(jnp.float32) * mean_size_frag
    circ = sub.s_tot > 0
    s_tot_z = sub.l_cont.astype(jnp.float32) * mean_size_frag
    ex = expected_counts(s, jnp.where(circ, s_tot_z, 0.0), p)
    n_diag = (sub.l_cont - sub.pos).astype(jnp.float32)
    intra = jnp.sum(jnp.where(sub.pos > 0, -ex * n_diag, 0.0))

    lc = sub.l_cont.astype(jnp.float32)
    n_intra = jnp.sum(jnp.where(sub.pos == 0, lc * (lc - 1.0) / 2.0, 0.0))
    inter = (n_pix_total - n_intra) * (-p.v_inter)
    return LOG10_E * (intra + inter)


def genome_log_likelihood(
    state: FragState,
    idx: SubIndex,
    rows,
    cols,
    data,
    p: RippeParams,
    mean_size_frag,
    n_pix_total,
):
    """Full log10-likelihood of a genome state: nnz sweep + zeros term."""
    sub = project_to_sub(state, idx)
    return nz_log_likelihood(
        sub, rows, cols, data, p, mean_size_frag
    ) + zeros_log_likelihood(sub, p, mean_size_frag, n_pix_total)
