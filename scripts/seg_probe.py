#!/usr/bin/env python3
"""Timing probe: seg vs legacy delta backends beyond the block envelope.

Builds the yeast Simulation at a given scaffolding level and times a
bounded number of sweep steps per backend through the engine's own
chunked path (so the tunnel watchdog is respected). Usage:

    python scripts/seg_probe.py [level] [backend ...]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)


def main():
    import jax
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    level = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    backends = sys.argv[2:] or ["seg", "sliced"]
    repo = pathlib.Path(__file__).resolve().parents[1]
    hic = ensure_bench_data(log=lambda *a: print(*a, file=sys.stderr))
    sim = Simulation(
        "hic", hic, "/root/reference/tests/data/yeast.contigs.fa.gz",
        level, output_folder=repo / ".bench_data" / f"out_l{level}",
    )
    params = sim.estimate_parameters_rippe()
    nnz = int(sim.coo_rows.shape[0])
    n_sub = int(np.asarray(sim.sub_index.frag_of_sub).shape[0])
    print(
        f"level {level}: n_frags={sim.n_frags} n_sub={n_sub} nnz={nnz}",
        flush=True,
    )
    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )

    spc = 256
    n_time_chunks = 4
    for spec in backends:
        parts = spec.split(":")
        backend, opts = parts[0], parts[1:]
        kw = {}
        sample_param = "nonuis" not in opts
        if "wide" in opts:
            kw["wide_rows"] = True
        for o in opts:
            if o.startswith("cap"):
                kw["slice_capacity"] = (
                    "auto" if o == "capauto" else int(o[3:])
                )
        t0 = time.perf_counter()
        eng = SweepEngine(
            sim, backend=backend, sample_param=sample_param,
            steps_per_call=spc, **kw,
        )
        ll = eng.initial_ll(state, params)
        key = jax.random.PRNGKey(0)
        k_perm, k_steps = jax.random.split(key)
        order = jax.random.permutation(k_perm, eng.n_frags).astype(
            jax.numpy.int32
        )
        keys = jax.random.split(k_steps, eng.n_frags)
        flags = np.full(eng.n_frags, sample_param)
        p = jax.tree.map(jax.numpy.asarray, params)
        pp, nz = eng._init_cache(state, p)
        llj = jax.numpy.float32(ll)
        # warmup chunk (compile)
        st, p2, llj, pp, nz, tr = eng._run_chunk(
            state, p, llj, pp, nz, order[:spc], keys[:spc], flags[:spc]
        )
        jax.block_until_ready(llj)
        t1 = time.perf_counter()
        steps = 0
        t2 = time.perf_counter()
        for c in range(1, 1 + n_time_chunks):
            s, e = c * spc, min((c + 1) * spc, eng.n_frags)
            if s >= e:
                break
            st, p2, llj, pp, nz, tr = eng._run_chunk(
                st, p2, llj, pp, nz, order[s:e], keys[s:e], flags[s:e]
            )
            steps += e - s
            print(
                f"  chunk {c}: ll={float(llj):.1f} "
                f"t={time.perf_counter() - t2:.2f}s",
                file=sys.stderr, flush=True,
            )
        jax.block_until_ready((st, p2, llj, pp, nz, tr))
        dt = time.perf_counter() - t2
        print(
            f"backend={spec}: build+compile {t1 - t0:.1f}s, "
            f"{steps} steps in {dt:.2f}s = {steps / dt:.1f} steps/s "
            f"(ll={float(llj):.0f}, overflow={int(tr['slice_overflow'].sum())}, "
            f"slice_max={int(tr['slice_max'].max())}, cap={eng.slice_capacity})",
            flush=True,
        )


if __name__ == "__main__":
    main()
