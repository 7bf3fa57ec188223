#!/usr/bin/env python3
"""Block vs seg crossover measurement (VERDICT r3 #8).

Times both backends at yeast levels 4 and 3 through the chunked path
on the current device and reports steps/s per (level, backend). The
block backend's dense grids grow as (n_sub+1)^2 per step while seg's
windows stay O(cap): somewhere between L4 (1,233 subs) and the block
envelope (6,144 subs) the ranking flips — the auto rule's envelope
constant should come from this measurement, not a guess.

Usage: python scripts/crossover_probe.py [--levels 4 3] [--steps 128]
       [--out FILE]
"""

import argparse
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache")
)


def time_backend(sim, backend, steps, state, params):
    """Returns the per-run steps/s list (3 timed chunks after the
    compile chunk; report the spread — VERDICT r4 #7)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.sampler.device_sweep import SweepEngine

    engine = SweepEngine(
        sim, backend=backend, sample_param=True, steps_per_call=steps
    )
    p = jax.tree.map(jnp.asarray, params)
    key = jax.random.PRNGKey(0)
    k_perm, k_steps = jax.random.split(key)
    order = jax.random.permutation(k_perm, engine.n_frags).astype(
        jnp.int32
    )[:steps]
    keys = jax.random.split(k_steps, engine.n_frags)[:steps]
    flags = np.ones(steps, dtype=bool)
    pp, nz = engine._init_cache(state, p)
    args = (state, p, jnp.float32(0.0), pp, nz, order, keys, flags)
    jax.block_until_ready(engine._run_chunk(*args))  # compile
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(engine._run_chunk(*args))
        runs.append(steps / (time.perf_counter() - t0))
    return runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="+", default=[4, 3])
    ap.add_argument(
        "--synthetic", type=int, nargs="*", default=[],
        help="ALSO time backends on banded SyntheticSim shapes with "
        "these fragment counts (~3 subs/frag: 10000 -> ~30k subs, "
        "70000 -> ~210k subs) — the config-#5 regime the auto rule "
        "must hold in (VERDICT r4 #8)",
    )
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    hic = ensure_bench_data(log=log)
    fasta = "/root/reference/tests/data/yeast.contigs.fa.gz"

    rows = []
    for level in args.levels:
        sim = Simulation(
            "hic", hic, fasta, level,
            output_folder=REPO / ".bench_data" / f"out_l{level}",
        )
        params = sim.estimate_parameters_rippe()
        state = explode_genome(
            sim.state, np.arange(sim.n_frags, dtype=np.int32)
        )
        n_sub = int(np.asarray(sim.sub_index.frag_of_sub).shape[0])
        for backend in ("block", "seg"):
            if backend == "block" and n_sub + 1 > 6144:
                continue
            runs = time_backend(
                sim, backend, args.steps, state, params
            )
            row = {
                "level": level,
                "backend": backend,
                "n_frags": sim.n_frags,
                "n_sub": n_sub,
                "nnz": int(sim.coo_rows.shape[0]),
                "steps_per_sec": round(max(runs), 1),
                "steps_per_sec_runs": [round(r, 1) for r in runs],
            }
            rows.append(row)
            log(json.dumps(row))

    for n_frags in args.synthetic:
        from instagraal_tpu.testing import SyntheticSim

        ssim = SyntheticSim(
            n_frags=n_frags, n_contigs=max(8, n_frags // 20),
            seed=0, band=16,
        )
        sstate = explode_genome(
            ssim.state, np.arange(ssim.n_frags, dtype=np.int32)
        )
        s_sub = int(np.asarray(ssim.sub_index.frag_of_sub).shape[0])
        for backend in ("seg", "sliced"):
            runs = time_backend(
                ssim, backend, args.steps, sstate, ssim.params
            )
            row = {
                "synthetic_frags": n_frags,
                "backend": backend,
                "n_sub": s_sub,
                "nnz": int(ssim.coo_rows.shape[0]),
                "steps_per_sec": round(max(runs), 1),
                "steps_per_sec_runs": [round(r, 1) for r in runs],
            }
            rows.append(row)
            log(json.dumps(row))

    from scripts._probemeta import probe_meta

    line = json.dumps({"crossover": rows, **probe_meta()})
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
