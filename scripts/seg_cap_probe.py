#!/usr/bin/env python3
"""Calibrate the seg backend's tier-1 capacity on the running chip
(VERDICT r3 #7).

The round-3 tier sizing used a "~1.3 us per capacity unit" constant
measured on one dev chip. This probe measures the real thing: it
builds the L2 engine at several tier-1 capacities (the row-window and
update caps derive from tier 1), times a short chunk of real sweep
steps for each, fits the linear per-unit cost, and reports the
fastest capacity. SweepEngine.probe_seg_capacity is the library
entry; pass the winner via --slice-cap (CLI) / slice_capacity=
(API). Exactness is capacity-independent (tier-2 + exact-overflow
fallbacks), so this knob only moves wall time.

Usage: python scripts/seg_cap_probe.py [--level 2]
       [--caps 256 512 954 2048] [--steps 64] [--out FILE]
"""

import argparse
import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument(
        "--caps", type=int, nargs="+", default=[256, 512, 954, 2048]
    )
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    hic = ensure_bench_data(log=log)
    sim = Simulation(
        "hic", hic, "/root/reference/tests/data/yeast.contigs.fa.gz",
        args.level,
        output_folder=REPO / ".bench_data" / f"out_l{args.level}",
    )
    params = sim.estimate_parameters_rippe()
    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )

    table = SweepEngine.probe_seg_capacity(
        sim, state, params=params, caps=args.caps,
        probe_steps=args.steps, log=log,
    )
    from scripts._probemeta import probe_meta

    table.update(probe_meta())
    line = json.dumps(table)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
