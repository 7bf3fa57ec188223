#!/usr/bin/env python3
"""Benchmark: MCMC sweep-step throughput of the flagship scoring path.

Runs the full per-step computation (contig renumbering, 5 candidates x 24
mutated genomes, sub-fragment projection, Poisson likelihood over the
contact COO, apply best move) on a synthetic problem sized like the yeast
benchmark at level 4, on whatever device JAX selects (TPU under the
driver; CPU elsewhere).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference CUDA implementation performs ~40 kernel
launches and >=6 host<->device synchronisations per sweep step
(SURVEY.md §3.2); 100 steps/s is a favourable estimate of its RTX-4090
throughput at this problem size (>=10ms/step launch+sync bound).
vs_baseline = measured steps/s / 100.
"""

import json
import time

import numpy as np

REFERENCE_STEPS_PER_SEC = 100.0
N_FRAGS = 1024
N_TIMED_STEPS = 30


def main():
    import jax
    import jax.numpy as jnp

    from instagraal_tpu.core.moves import (
        N_MUTATIONS,
        all_candidate_states,
        renumber_contigs,
    )
    from instagraal_tpu.model.likelihood import genome_log_likelihood
    from instagraal_tpu.testing import synthetic_problem

    p = synthetic_problem(n_frags=N_FRAGS, n_contigs=16, seed=0)
    idx = p["sub_index"]
    rows, cols, data = p["rows"], p["cols"], p["data"]
    msf = np.float32(p["mean_size_frag_kb"])
    n_pix = np.float32(p["n_pix_total"])
    n_neighbours = 5
    nnz = int(rows.shape[0])

    def step(state, id_fA, cand_ids, first_mask, params):
        state, n_contigs, _ = renumber_contigs(state)
        max_id = (n_contigs - 1).astype(jnp.int32)

        def score_candidate(args):
            id_fB, is_first = args
            stacked, valid = all_candidate_states(
                state, id_fA, id_fB, max_id, flip_eject=is_first
            )
            lls = jax.vmap(
                lambda s: genome_log_likelihood(
                    s, idx, rows, cols, data, params, msf, n_pix
                )
            )(stacked)
            return jnp.where(valid, lls, -jnp.inf)

        scores = jax.lax.map(score_candidate, (cand_ids, first_mask))
        best = jnp.argmax(scores.reshape(-1))
        id_fB = cand_ids[best // N_MUTATIONS]
        op = best % N_MUTATIONS
        stacked, _ = all_candidate_states(
            state, id_fA, id_fB, max_id, flip_eject=True
        )
        new_state = jax.tree.map(lambda a: a[op], stacked)
        return new_state, scores.reshape(-1)[best]

    step_jit = jax.jit(step)

    rng = np.random.default_rng(0)
    state = p["state"]
    first = np.zeros(n_neighbours, dtype=bool)
    first[0] = True
    first = jnp.asarray(first)

    def make_args():
        id_fA = int(rng.integers(N_FRAGS))
        cand = np.sort(rng.choice(N_FRAGS, n_neighbours, replace=False))
        return np.int32(id_fA), jnp.asarray(cand.astype(np.int32))

    # compile + warmup
    a, c = make_args()
    state, ll = step_jit(state, a, c, first, p["params"])
    ll.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(N_TIMED_STEPS):
        a, c = make_args()
        state, ll = step_jit(state, a, c, first, p["params"])
    ll.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps_per_sec = N_TIMED_STEPS / elapsed
    print(
        json.dumps(
            {
                "metric": "mcmc_sweep_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": f"steps/s (n_frags={N_FRAGS}, nnz={nnz}, "
                f"{n_neighbours}x{N_MUTATIONS} mutations/step, "
                f"device={jax.devices()[0].platform})",
                "vs_baseline": round(
                    steps_per_sec / REFERENCE_STEPS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
