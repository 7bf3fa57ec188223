"""Measure touched-slice sizes and tune SweepEngine's slice capacity.

The sliced scoring backend gathers ``[24, cap, 8]`` packed-attribute
rows per candidate, so per-step gather traffic is proportional to the
static slice capacity — not to the slices actually touched. This script
measures the real per-step maxima (the ``slice_max`` trace) on a few
cycles of the target problem, then re-times the engine with a capacity
derived from the measurement.

Usage:
    python scripts/tune_slice_cap.py HIC_FOLDER REFERENCE_FA \
        [--level 4] [--cycles 3] [--bomb] [--out OUT_DIR]

Prints one JSON line per phase so results survive partial runs.
"""

import argparse
import json
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_cycles(eng, state, params, ll, key, n, label, nuisance=True):
    tr = None
    t0 = time.time()
    key, sub = jax.random.split(key)
    state, params, ll, tr = eng.run_cycle(
        state, params, ll, sub, sample_param=nuisance
    )
    emit(phase=f"{label}_compile", seconds=round(time.time() - t0, 2))
    t0 = time.time()
    maxima = []
    overflows = 0
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, params, ll, tr = eng.run_cycle(
            state, params, ll, sub, sample_param=nuisance
        )
        maxima.append(int(tr["slice_max"].max()))
        overflows += int(tr["slice_overflow"].sum())
    dt = (time.time() - t0) / n
    n_frags = tr["likelihood"].shape[0]
    emit(
        phase=f"{label}_timing",
        cap=eng.slice_capacity,
        sec_per_cycle=round(dt, 2),
        steps_per_sec=round(n_frags / dt, 1),
        cycles_per_hour=round(3600 / dt, 1),
        slice_max_per_cycle=maxima,
        slice_p99=int(np.percentile(tr["slice_max"], 99)),
        slice_median=int(np.median(tr["slice_max"])),
        overflow_steps=overflows,
        n_contigs_end=int(tr["n_contigs"][-1]),
        dist_end=round(float(tr["dist_init_genome"][-1]), 4),
    )
    return state, params, ll, key, max(maxima)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hic_folder")
    ap.add_argument("reference_fa")
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--bomb", action="store_true")
    ap.add_argument(
        "--caps",
        default=None,
        help="Comma-separated capacities to grid-measure (skips the "
        "default+auto-tune flow). Suffix a value with 't' to measure "
        "it with truncation (exact_overflow=False); the literal "
        "'full' measures the full-recompute backend.",
    )
    ap.add_argument("--no-nuisance", action="store_true")
    ap.add_argument("--neighbours", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from instagraal_tpu.sampler import Simulation, suggest_slice_capacity
    from instagraal_tpu.sampler.device_sweep import SweepEngine

    t0 = time.time()
    out = pathlib.Path(args.out or "/tmp/tune_slice_cap_out")
    sim = Simulation(
        os.path.basename(os.path.normpath(args.hic_folder)),
        args.hic_folder,
        args.reference_fa,
        args.level,
        output_folder=out,
    )
    params = sim.estimate_parameters_rippe()
    nnz = int(sim.coo_rows.shape[0])
    emit(
        phase="setup",
        seconds=round(time.time() - t0, 2),
        n_frags=sim.n_frags,
        nnz=nnz,
        default_cap=int(min(nnz, max(4096, nnz // 16))),
        suggested_cap=suggest_slice_capacity(sim),
    )

    state = sim.state
    if args.bomb:
        import jax.numpy as jnp

        from instagraal_tpu.core import ops

        order = np.random.default_rng(0).permutation(sim.n_frags)
        state = ops.explode_genome(
            state, jnp.asarray(order.astype(np.int32))
        )

    key = jax.random.PRNGKey(0)
    if args.caps:
        # grid mode: every config starts from the SAME state so the
        # cycles are comparable; likelihood is reported to judge the
        # truncation cost.
        for spec in args.caps.split(","):
            nb = args.neighbours
            wide = "w" in spec.lstrip("0123456789").replace("full", "")
            spec = spec.replace("w", "")
            if spec.startswith("full"):
                cap = int(spec[4:]) if spec[4:] else None
                eng = SweepEngine(
                    sim, backend="full", sample_param=True,
                    n_neighbours=nb, wide_rows=wide, slice_capacity=cap,
                )
                label = f"full{cap or ''}"
            else:
                trunc = spec.endswith("t")
                cap = int(spec.rstrip("t"))
                eng = SweepEngine(
                    sim, backend="sliced", sample_param=True,
                    slice_capacity=cap, exact_overflow=not trunc,
                    n_neighbours=nb, wide_rows=wide,
                )
                label = f"cap{cap}{'_trunc' if trunc else ''}"
            if wide:
                label += "_wide"
            if nb != 5:
                label += f"_nb{nb}"
            if args.no_nuisance:
                label += "_nonuis"
            ll = eng.initial_ll(state, params)
            _, _, ll_end, _, _ = time_cycles(
                eng, state, params, ll, key, args.cycles, label,
                nuisance=not args.no_nuisance,
            )
            emit(phase=f"{label}_ll", ll_end=round(float(ll_end), 2))
        emit(phase="done")
        return

    eng = SweepEngine(sim, backend="sliced", sample_param=True)
    ll = eng.initial_ll(state, params)
    state, params, ll, key, seen_max = time_cycles(
        eng, state, params, ll, key, args.cycles, "default"
    )

    tuned = int(min(nnz, max(4096, round(1.25 * seen_max))))
    if tuned == eng.slice_capacity:
        emit(phase="done", note="default capacity already tuned", tuned=tuned)
        return
    eng2 = SweepEngine(
        sim, backend="sliced", sample_param=True, slice_capacity=tuned
    )
    time_cycles(eng2, state, params, ll, key, args.cycles, "tuned")
    emit(phase="done", tuned=tuned)


if __name__ == "__main__":
    main()
