#!/usr/bin/env python3
"""Minimal yeast-L4 block-cycle timer for perf bisects.

Times exactly what bench.py's flagship number measures (3 full cycles
through SweepEngine.run_cycle at pyramid level 4) with none of the
extras (roofline, beyond-envelope), so a single run costs one compile
plus ~4 s. Usage: python scripts/l4_time.py [n_cycles]
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))


def main():
    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    hic = ensure_bench_data(log=lambda *a: print(*a, file=sys.stderr))
    sim = Simulation(
        "hic", hic, pathlib.Path(
            "/root/reference/tests/data/yeast.contigs.fa.gz"
        ), 4, output_folder=REPO / ".bench_data" / "out",
    )
    params = sim.estimate_parameters_rippe()
    engine = SweepEngine(sim, sample_param=True)
    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    ll = engine.initial_ll(state, params)
    key = jax.random.PRNGKey(0)

    print("l4_time: compiling...", file=sys.stderr, flush=True)
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    state, params, ll, _ = engine.run_cycle(
        state, params, ll, sub, sample_param=True
    )
    print(
        f"l4_time: compile+first cycle {time.perf_counter() - t0:.1f}s",
        file=sys.stderr, flush=True,
    )
    t0 = time.perf_counter()
    for _ in range(n_cycles):
        key, sub = jax.random.split(key)
        state, params, ll, _ = engine.run_cycle(
            state, params, ll, sub, sample_param=True
        )
    elapsed = time.perf_counter() - t0
    rate = n_cycles * sim.n_frags / elapsed
    print(
        f"steps_per_sec={rate:.1f} backend={engine.backend} "
        f"ll={float(ll):.2f} n_frags={sim.n_frags}"
    )


if __name__ == "__main__":
    main()
