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
    t0 = time.perf_counter()
    jax.block_until_ready(engine._run_chunk(*args))
    t1 = time.perf_counter()
    jax.block_until_ready(engine._run_chunk(*args))
    t2 = time.perf_counter()
    return steps / min(t1 - t0, t2 - t1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="+", default=[4, 3])
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
            r = time_backend(sim, backend, args.steps, state, params)
            row = {
                "level": level,
                "backend": backend,
                "n_frags": sim.n_frags,
                "n_sub": n_sub,
                "nnz": int(sim.coo_rows.shape[0]),
                "steps_per_sec": round(r, 1),
            }
            rows.append(row)
            log(json.dumps(row))

    line = json.dumps({"crossover": rows})
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
