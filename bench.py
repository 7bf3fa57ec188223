#!/usr/bin/env python3
"""Benchmark: MCMC sweep throughput of the on-device scan engine.

Runs full scaffolding cycles (per fragment: contig renumbering, 5
candidates x 24 mutated genomes, sliced Poisson likelihood scoring,
greedy accept, nuisance MH) as single-device lax.scan calls on a
synthetic problem sized like the yeast benchmark at level 4, on whatever
device JAX selects (the real TPU under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference CUDA implementation performs ~40 kernel
launches and >=6 host<->device synchronisations per sweep step
(SURVEY.md §3.2); 100 steps/s is a favourable estimate of its RTX-4090
throughput at this problem size (>=10ms/step launch+sync bound).
vs_baseline = measured steps/s / 100.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

REFERENCE_STEPS_PER_SEC = 100.0
N_FRAGS = 512
N_CYCLES = 2


def main():
    import jax

    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.testing import SyntheticSim

    sim = SyntheticSim(n_frags=N_FRAGS, n_contigs=16, seed=0)
    nnz = int(sim.coo_rows.shape[0])
    engine = SweepEngine(sim, sample_param=True)  # backend="auto"

    state = sim.state
    params = sim.params
    ll = engine.initial_ll(state, params)
    key = jax.random.PRNGKey(0)

    print("bench: compiling cycle...", file=sys.stderr, flush=True)
    # compile + warmup (one cycle)
    key, sub = jax.random.split(key)
    state, params, ll, _ = engine.run_cycle(
        state, params, ll, sub, sample_param=True
    )

    print("bench: timing...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(N_CYCLES):
        key, sub = jax.random.split(key)
        state, params, ll, traces = engine.run_cycle(
            state, params, ll, sub, sample_param=True
        )
    elapsed = time.perf_counter() - t0

    steps = N_CYCLES * N_FRAGS
    steps_per_sec = steps / elapsed
    print(
        json.dumps(
            {
                "metric": "mcmc_sweep_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": f"steps/s (n_frags={N_FRAGS}, nnz={nnz}, "
                f"5x24 mutations/step + nuisance MH, scan engine, "
                f"backend={engine.backend}, "
                f"device={jax.devices()[0].platform})",
                "vs_baseline": round(
                    steps_per_sec / REFERENCE_STEPS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
