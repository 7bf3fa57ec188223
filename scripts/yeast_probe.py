#!/usr/bin/env python3
"""Measure scan-engine throughput on the real yeast-L4 workload.

Builds (or reuses, via the .bench_data cache) the yeast pre+pyramid
pipeline from the reference test assembly, then times full_em-style
cycles of the SweepEngine on whatever device JAX selects.

Usage:
  python scripts/yeast_probe.py [--cycles N] [--level L] [--backend B]
         [--cap C|auto] [--profile DIR] [--out FILE]

Writes one timing line per cycle directly to --out (default stdout);
through a tunneled TPU, write to a file (pipes lose partial output).
"""

import argparse
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

REPO = pathlib.Path(__file__).resolve().parent.parent
BENCH_DATA = REPO / ".bench_data"
YEAST_FASTA = pathlib.Path("/root/reference/tests/data/yeast.contigs.fa.gz")


def ensure_bench_data(log=print) -> pathlib.Path:
    """Create .bench_data/hic (pre output) from the reference yeast
    assembly + simulated pairs if not already cached."""
    hic = BENCH_DATA / "hic"
    if (hic / "abs_fragments_contacts_weighted.txt").exists():
        return hic
    sys.path.insert(0, str(REPO))
    from instagraal_tpu.pre import run_pre
    from instagraal_tpu.testing import simulate_pairs

    BENCH_DATA.mkdir(exist_ok=True)
    pairs = BENCH_DATA / "yeast.pairs.gz"
    if not pairs.exists():
        log("simulating pairs...")
        simulate_pairs(YEAST_FASTA, pairs, n_pairs=2_000_000, seed=13)
    log("running pre...")
    run_pre(YEAST_FASTA, pairs, ["DpnII"], hic, plot=False)
    return hic


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--cap", default=None)
    ap.add_argument("--block-cap", default="auto")
    ap.add_argument("--block-tri", action="store_true")
    ap.add_argument("--no-nuisance", action="store_true")
    ap.add_argument("--bomb", action="store_true", default=True)
    ap.add_argument("--profile", default=None, help="xprof trace dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    outf = open(args.out, "w", buffering=1) if args.out else sys.stdout

    def log(*a):
        print(*a, file=outf, flush=True)

    sys.path.insert(0, str(REPO))
    hic = ensure_bench_data(log)

    import jax
    import numpy as np

    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation

    t0 = time.perf_counter()
    sim = Simulation(
        "hic", hic, YEAST_FASTA, args.level,
        output_folder=BENCH_DATA / "out",
    )
    params = sim.estimate_parameters_rippe()
    log(
        f"setup {time.perf_counter()-t0:.1f}s: n_frags={sim.n_frags} "
        f"n_sub={sim.n_sub_frags} nnz={sim.nnz} "
        f"device={jax.devices()[0].platform}"
    )

    cap = args.cap
    if cap is not None and cap != "auto":
        cap = int(cap)
    engine = SweepEngine(
        sim,
        backend=args.backend,
        slice_capacity=cap,
        sample_param=not args.no_nuisance,
        block_capacity=(
            "auto" if args.block_cap == "auto" else int(args.block_cap)
        ),
        block_tri=args.block_tri,
    )
    log(
        f"engine: backend={engine.backend} cap={engine.slice_capacity} "
        f"bcap={engine.block_capacity} nnz={sim.nnz}"
    )

    from instagraal_tpu.core.ops import explode_genome

    state = sim.state
    if args.bomb:
        state = explode_genome(state, np.arange(sim.n_frags, dtype=np.int32))
    ll = engine.initial_ll(state, params)
    log(f"initial ll {ll:.1f}")

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    key, sub = jax.random.split(key)
    state, params, ll, traces = engine.run_cycle(
        state, params, ll, sub, sample_param=not args.no_nuisance
    )
    log(f"compile+first cycle: {time.perf_counter()-t0:.1f}s  ll={ll:.1f}")

    if args.profile:
        jax.profiler.start_trace(args.profile)
    times = []
    for j in range(args.cycles):
        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        state, params, ll, traces = engine.run_cycle(
            state, params, ll, sub, sample_param=not args.no_nuisance
        )
        dt = time.perf_counter() - t0
        times.append(dt)
        log(
            f"cycle {j}: {dt:.2f}s = {sim.n_frags/dt:.1f} steps/s  "
            f"ll={ll:.1f} n_contigs={int(traces['n_contigs'][-1])} "
            f"overflows={int(traces['slice_overflow'].sum())} "
            f"slice_max={int(traces['slice_max'].max())}"
        )
    if args.profile:
        jax.profiler.stop_trace()
    best = min(times)
    log(json.dumps({
        "steps_per_sec_best": round(sim.n_frags / best, 2),
        "steps_per_sec_median": round(
            sim.n_frags / float(np.median(times)), 2
        ),
        "cycles_per_hour": round(3600.0 / float(np.median(times)), 1),
        "backend": engine.backend,
        "cap": engine.slice_capacity,
    }))


if __name__ == "__main__":
    main()
