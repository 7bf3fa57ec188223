#!/usr/bin/env python3
"""Speed-of-light (roofline) analysis for the sweep step on this chip.

BASELINE.md's headline metric is "likelihood evals/sec/chip
(speed-of-light analysis per chip)"; this probe supplies the
speed-of-light half — a ceiling the measured rate must sit BELOW.

The ceiling is measured in the step's OWN data layout. The round-3
probe streamed [n_pix, PACK] arrays from HBM and called that the
pipeline ceiling — a bandwidth-bound number ~70x below what the block
step's broadcast grids actually attain (the grids are built by
broadcasting tiny [bcap, PACK] operands with bcap-fold reuse, so they
run compute-bound). That mistake produced the self-contradictory
"985% of speed of light" in BENCH_r03. Here every ceiling is measured
with the exact op the step executes, at the step's shapes:

* block: pp_rows_fast over the dense [S, S] broadcast grid and the
  [24, bcap, bcap] member grid (the two shapes the step evaluates).
  demand/step = n_cand * 24 * bcap^2 (candidate member grids)
              + 2 * (S+1)^2 (current-score grid + nuisance-MH grid)
  SoL steps/s = 1 / (member_cells / member_rate
                     + dense_cells / dense_rate)
* seg: the 24-way rescore's row gathers (jnp.take over [S, PACK] and
  [nnz, k] tables) — the measured gather-issue bound. demand/step =
  gathered rows at the engine's tier-1 capacities.

Because the demand model counts only a SUBSET of the step's
irreducible work (no mutation ops, no renumber, no argmax, no XU
matmul, no scan latency), SoL is a true upper bound and the achieved
fraction must come out < 100%; the gap is the step's op-latency tail
(docs/DESIGN.md round-2 XProf decomposition: ~40% small fusions).

Timing note: on the tunneled 'axon' TPU platform block_until_ready
returns before execution completes for small graphs, so naive
dispatch-loop timing reads ~0.06 ms for everything. All ceilings here
are measured by chaining N iterations inside one jitted
lax.fori_loop (data-dependent across iterations, defeating CSE) and
timing a host readback; two chain lengths cancel dispatch+readback.

Usage:  python scripts/roofline_probe.py [--steps-per-sec N] [--out F]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)

_N0 = 2  # short-chain length used to cancel dispatch+readback


def _chain_rate(make_body, work_per_iter, reps):
    """items/s of make_body's op, timed as a fori_loop chain readback.

    make_body() -> (body_fn, init) where body_fn(i, acc) -> acc must
    consume acc (data dependence across iterations). Returns
    work_per_iter / per-iteration seconds, overhead-cancelled.
    """
    import jax
    import jax.numpy as jnp

    body, init = make_body()

    @jax.jit
    def chain(n, init):
        return jax.lax.fori_loop(0, n, body, init)

    n0 = jnp.int32(_N0)
    n1 = jnp.int32(_N0 + reps)
    float(jnp.sum(chain(n0, init)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(n0, init)))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(chain(n1, init)))
    t_long = time.perf_counter() - t0
    per = max((t_long - t_short) / reps, 1e-9)
    return work_per_iter / per


def measure_dense_grid_rate(S: int, reps: int = 400):
    """cells/s of the block backend's dense [S, S] pp grid."""
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.model.rippe import RippeParams
    from instagraal_tpu.sampler.device_sweep import PACK, pp_rows_fast

    p = RippeParams.make(50.0, 9.6, -1.5, 2.0, 300.0, 1.0, 0.01)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0.0, 100.0, (S, PACK)).astype(np.float32)
    )
    dn = jnp.asarray(rng.poisson(2.0, (S, S, 2)).astype(np.float32))

    def make():
        def body(i, acc):
            xv = x + acc * np.float32(1e-20)
            v = pp_rows_fast(
                xv[:, None, :], xv[None, :, :], dn, p, np.float32(1.0)
            )
            return acc + jnp.sum(jnp.where(dn[..., 0] > 0, v, 0.0))

        return body, jnp.float32(0.0)

    return _chain_rate(make, S * S, reps)


def measure_member_grid_rate(
    bcap: int, n_mut: int = 24, reps: int = 400
):
    """cells/s of the block candidate's [n_mut, bcap, bcap] grid."""
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.model.rippe import RippeParams
    from instagraal_tpu.sampler.device_sweep import PACK, pp_rows_fast

    p = RippeParams.make(50.0, 9.6, -1.5, 2.0, 300.0, 1.0, 0.01)
    rng = np.random.default_rng(0)
    x24 = jnp.asarray(
        rng.uniform(0.0, 100.0, (n_mut, bcap, PACK)).astype(np.float32)
    )
    dnb = jnp.asarray(
        rng.poisson(2.0, (bcap, bcap, 2)).astype(np.float32)
    )

    def make():
        def body(i, acc):
            xv = x24 + acc * np.float32(1e-20)
            v = pp_rows_fast(
                xv[:, :, None, :], xv[:, None, :, :], dnb[None],
                p, np.float32(1.0),
            )
            return acc + jnp.sum(
                jnp.where(dnb[None, :, :, 0] > 0, v, 0.0)
            )

        return body, jnp.float32(0.0)

    return _chain_rate(make, n_mut * bcap * bcap, reps)


def measure_gather_rate(
    n_table: int, window: int, n_mut: int = 24, reps: int = 200
):
    """rows/s of the seg rescore's take(packed24, idx, axis=1) gather
    (+ the pp eval over the gathered window, as the step fuses them)."""
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.model.rippe import RippeParams
    from instagraal_tpu.sampler.device_sweep import PACK, pp_rows_fast

    p = RippeParams.make(50.0, 9.6, -1.5, 2.0, 300.0, 1.0, 0.01)
    rng = np.random.default_rng(0)
    p24 = jnp.asarray(
        rng.uniform(0.0, 100.0, (n_mut, n_table, PACK)).astype(
            np.float32
        )
    )
    b_rows = jnp.asarray(
        rng.integers(0, n_table, window).astype(np.int32)
    )
    b_cols = jnp.asarray(
        rng.integers(0, n_table, window).astype(np.int32)
    )
    b_dn = jnp.asarray(
        rng.poisson(2.0, (window, 2)).astype(np.float32)
    )

    def make():
        def body(i, acc):
            pv = p24 + acc * np.float32(1e-20)
            ra = jnp.take(pv, b_rows, axis=1)
            ca = jnp.take(pv, b_cols, axis=1)
            pp = pp_rows_fast(ra, ca, b_dn[None], p, np.float32(1.0))
            return acc + jnp.sum(pp)

        return body, jnp.float32(0.0)

    # 2 gathers of n_mut*window rows each per iteration
    return _chain_rate(make, 2 * n_mut * window, reps)


def block_demand_per_step(engine):
    """Pixel-pipeline evaluations one block-backend sweep step issues:
    the n_cand*24 candidate member grids + the current-score and
    nuisance-MH dense grids (device_sweep.py step body)."""
    n_sub1 = int(engine.sim.sub_index.frag_of_sub.shape[0]) + 1
    return (
        engine.n_neighbours * 24 * engine.block_capacity ** 2
        + 2 * n_sub1 * n_sub1
    )


def block_speed_of_light(engine, reps: int = 400):
    """Measured SoL for the block backend at this engine's shapes."""
    S = int(engine.sim.sub_index.frag_of_sub.shape[0]) + 1
    bcap = int(engine.block_capacity)
    member_rate = measure_member_grid_rate(bcap, reps=reps)
    dense_rate = measure_dense_grid_rate(S, reps=reps)
    member_cells = engine.n_neighbours * 24 * bcap * bcap
    dense_cells = 2 * S * S
    t_min = member_cells / member_rate + dense_cells / dense_rate
    return {
        "backend": "block",
        "member_grid_rate_cells_per_s": round(member_rate),
        "dense_grid_rate_cells_per_s": round(dense_rate),
        "member_cells_per_step": member_cells,
        "dense_cells_per_step": dense_cells,
        "speed_of_light_steps_per_s": round(1.0 / t_min, 1),
    }


def seg_speed_of_light(engine, reps: int = 200):
    """Measured SoL for the seg backend: the tier-1 rescore gathers
    (n_cand candidates x 24 mutations x slice_capacity rows x 2
    endpoint gathers) against the measured gather-issue rate."""
    n_sub = int(engine.sim.sub_index.frag_of_sub.shape[0])
    cap = int(engine.slice_capacity)
    gather_rate = measure_gather_rate(n_sub + 1, cap, reps=reps)
    rows_per_step = engine.n_neighbours * 2 * 24 * cap
    return {
        "backend": "seg",
        "gather_rate_rows_per_s": round(gather_rate),
        "rescore_rows_per_step": rows_per_step,
        "speed_of_light_steps_per_s": round(
            gather_rate / rows_per_step, 1
        ),
    }


def attach_pct(sol: dict, measured_steps_per_s: float) -> dict:
    sol = dict(sol)
    sol["measured_steps_per_s"] = round(float(measured_steps_per_s), 1)
    sol["pct_of_speed_of_light"] = round(
        100.0 * measured_steps_per_s / sol["speed_of_light_steps_per_s"],
        1,
    )
    return sol


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-sec", type=float, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731

    hic = ensure_bench_data(log=log)
    repo = pathlib.Path(__file__).resolve().parents[1]
    sim = Simulation(
        "hic", hic, "/root/reference/tests/data/yeast.contigs.fa.gz",
        4, output_folder=repo / ".bench_data" / "out",
    )
    params = sim.estimate_parameters_rippe()
    engine = SweepEngine(sim, sample_param=True)
    assert engine.backend == "block", engine.backend
    sol = block_speed_of_light(engine)
    log(f"block SoL: {sol}")

    steps_per_sec = args.steps_per_sec
    if steps_per_sec is None:
        state = explode_genome(
            sim.state, np.arange(sim.n_frags, dtype=np.int32)
        )
        ll = engine.initial_ll(state, params)
        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        state, params, ll, _ = engine.run_cycle(
            state, params, ll, sub, sample_param=True
        )
        t0 = time.perf_counter()
        for _ in range(2):
            key, sub = jax.random.split(key)
            state, params, ll, _ = engine.run_cycle(
                state, params, ll, sub, sample_param=True
            )
        steps_per_sec = 2 * sim.n_frags / (time.perf_counter() - t0)

    result = {"device": jax.devices()[0].platform}
    result.update(attach_pct(sol, steps_per_sec))
    result["note"] = (
        "ceilings measured with the step's exact ops at the step's "
        "shapes (broadcast grids / window gathers), chained-readback "
        "timed; demand counts the grids/gathers the compiled step "
        "executes, excluding its op-latency tail — so achieved < 100%"
    )
    line = json.dumps(result)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
