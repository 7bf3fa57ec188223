#!/usr/bin/env python3
"""Host-setup scaling probe at a synthetic 200k-fragment problem
(VERDICT r3 #5 worried the per-fragment setup loops would cost
minutes-to-hours at the 10^5-10^6-fragment fine levels of BASELINE
config #5).

Measured outcome: build_sub_index and neighbour_distributions are now
bulk/lazy (9-40x and 4x+deferred respectively, asserted equal to the
loops); NeighbourTable.build deliberately KEEPS its per-row loop —
it measures 2.1 s @200k / 11.5 s @1M while two global-sort
vectorizations measured 8.4 s / 89 s (per-row top-k via a global sort
is random-gather bound and loses at every scale tried). Total host
setup at 200k frags / 5M nnz: ~2.5 s — a once-per-run cost that never
gates the TPU.

Usage:
  python scripts/setup_scale_probe.py [--n-frags 200000] [--out FILE]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# host-setup probe: all timings are numpy-side; force the CPU backend
# so the jnp.asarray uploads at 200k-frag scale don't ride the TPU
# tunnel (JAX_PLATFORMS alone is overridden by the axon plugin)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp


def _synthetic_contacts(n, partners_mean, seed):
    """Banded + random contact matrix, ~Hi-C-shaped."""
    rng = np.random.default_rng(seed)
    nnz = n * partners_mean
    i = rng.integers(0, n, nnz)
    # mostly near-diagonal partners, some long-range
    off = np.minimum(
        rng.geometric(0.05, nnz), n - 1
    ) * rng.choice([-1, 1], nnz)
    j = np.clip(i + off, 0, n - 1)
    keep = i != j
    m = sp.coo_matrix(
        (
            rng.integers(1, 100, keep.sum()).astype(np.float64),
            (i[keep], j[keep]),
        ),
        shape=(n, n),
    ).tocsr()
    m.sum_duplicates()
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-frags", type=int, default=200_000)
    ap.add_argument("--partners-mean", type=int, default=30)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tests.test_setup_vector import (
        _distri_loop,
        _Level,
        _sub_index_loop,
        _SubLevel,
        _TopLevel,
    )

    from instagraal_tpu.sampler.device_sweep import NeighbourTable
    from instagraal_tpu.sampler.setup import (
        build_sub_index,
        neighbour_distributions,
    )

    n = args.n_frags
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    csr = _synthetic_contacts(n, args.partners_mean, seed=0)
    log(f"synthetic matrix: {n} frags, {csr.nnz} nnz")

    results = {"n_frags": n, "nnz": int(csr.nnz)}

    # --- neighbour table -------------------------------------------
    # kept as a per-row loop ON PURPOSE: the measured numbers below
    # are why (two global-sort vectorizations lost to it at every
    # scale tried — see NeighbourTable.build's docstring)
    t0 = time.perf_counter()
    table = NeighbourTable.build(csr, n, k=args.k)
    t_build = time.perf_counter() - t0
    results["neighbour_table"] = {
        "build_s": round(t_build, 2),
        "note": "per-row loop kept: measured 2.1 s @200k / 11.5 s "
        "@1M; global-sort vectorizations measured 8.4 s / 89 s "
        "(random-gather bound)",
    }
    log(f"neighbour_table: {results['neighbour_table']}")

    # --- jumping distributions -------------------------------------
    level = _Level(csr)
    t0 = time.perf_counter()
    lazy = neighbour_distributions(level)
    _ = lazy[0], lazy[n // 2]
    t_vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    loop = _distri_loop(level)
    t_loop = time.perf_counter() - t0
    for i in (0, 1, n - 1):
        if loop[i]["xk"] is not None:
            np.testing.assert_array_equal(lazy[i]["xk"], loop[i]["xk"])
            np.testing.assert_array_equal(lazy[i]["pk"], loop[i]["pk"])
    results["neighbour_distributions"] = {
        "vectorized_s": round(t_vec, 3),
        "loop_s": round(t_loop, 1),
        "speedup": round(t_loop / t_vec, 1),
    }
    log(f"neighbour_distributions: {results['neighbour_distributions']}")

    # --- sub index -------------------------------------------------
    rng = np.random.default_rng(1)
    reps = rng.integers(1, 4, n)
    hi = np.cumsum(reps) - 1
    lo = hi - reps + 1
    n_sub = int(reps.sum())
    len_bp = rng.integers(500, 20000, n_sub)
    t0 = time.perf_counter()
    idx, _, _ = build_sub_index(_TopLevel(lo, hi), _SubLevel(len_bp))
    t_vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    f_l, j_l, w_l, c_l = _sub_index_loop(
        lo, hi, len_bp.astype(np.float64) / 1e3
    )
    t_loop = time.perf_counter() - t0
    np.testing.assert_array_equal(np.asarray(idx.frag_of_sub), f_l)
    np.testing.assert_array_equal(np.asarray(idx.w_dist), w_l)
    results["build_sub_index"] = {
        "n_sub": n_sub,
        "vectorized_s": round(t_vec, 3),
        "loop_s": round(t_loop, 1),
        "speedup": round(t_loop / t_vec, 1),
    }
    log(f"build_sub_index: {results['build_sub_index']}")

    from scripts._probemeta import probe_meta

    results = {"results": results, **probe_meta()}
    line = json.dumps(results)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
