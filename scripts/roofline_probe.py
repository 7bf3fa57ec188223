#!/usr/bin/env python3
"""Speed-of-light (roofline) analysis for the sweep step on this chip.

BASELINE.md's headline metric is "likelihood evals/sec/chip
(speed-of-light analysis per chip)"; this probe supplies the
speed-of-light half. Two hardware ceilings are measured on the live
device (no spec-sheet constants):

1. pixel-pipeline ceiling: `pp_rows_fast` — the exact hot scoring
   math (fused single-exp Rippe form, 4 elementwise transcendentals
   per pixel) — evaluated over large contiguous arrays with no
   gathers. This is the attainable VPU rate for the scoring pipeline
   at perfect utilization; the block/seg backends' dense grids are
   engineered to approach it.
2. HBM stream bandwidth: a fused axpy (read + write), the bound that
   governs the gather-heavy delta backends.

Against them it states the block step's demand and the achieved
fraction of speed-of-light:

  demand/step = n_cand * 24 * bcap^2      (candidate member grids)
              + 2 * (n_sub+1)^2           (current-score + zero grids)
  SoL steps/s = pixel ceiling / demand
  achieved    = measured steps/s / SoL steps/s

Usage:  python scripts/roofline_probe.py [--steps-per-sec N] [--out F]
(--steps-per-sec: reuse a measured bench figure instead of re-timing
a full cycle here; without it the probe times 2 cycles itself.)
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


def measure_ceilings(n_pix: int = 1 << 24, reps: int = 5):
    """Measure (pixel-pipeline cells/s, HBM stream bytes/s) on the
    current default device. ~2 s total on a v5e chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.model.rippe import RippeParams
    from instagraal_tpu.sampler.device_sweep import PACK, pp_rows_fast

    p = RippeParams.make(50.0, 9.6, -1.5, 2.0, 300.0, 1.0, 0.01)
    rng = np.random.default_rng(0)
    ra = jnp.asarray(
        rng.uniform(0.0, 100.0, (n_pix, PACK)).astype(np.float32)
    )
    ca = jnp.asarray(
        rng.uniform(0.0, 100.0, (n_pix, PACK)).astype(np.float32)
    )
    dn = jnp.asarray(
        rng.poisson(2.0, (n_pix, 2)).astype(np.float32)
    )

    @jax.jit
    def pipeline(ra, ca, dn):
        # sum-reduce so XLA cannot elide any lane; the reduction adds
        # ~1 flop/pixel against the pipeline's ~15
        return jnp.sum(pp_rows_fast(ra, ca, dn, p, np.float32(1.0)))

    pipeline(ra, ca, dn).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pipeline(ra, ca, dn)
    out.block_until_ready()
    cells_per_s = n_pix * reps / (time.perf_counter() - t0)

    x = jnp.asarray(rng.uniform(size=1 << 26).astype(np.float32))

    @jax.jit
    def stream(x):
        return x * np.float32(1.0001) + np.float32(1.0)

    stream(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        y = stream(x)
    y.block_until_ready()
    # read + write, 4 B each
    bytes_per_s = (1 << 26) * 8 * reps / (time.perf_counter() - t0)
    return cells_per_s, bytes_per_s


def block_demand_per_step(engine):
    """Pixel-pipeline evaluations one block-backend sweep step issues."""
    n_sub1 = int(engine.sim.sub_index.frag_of_sub.shape[0]) + 1
    return (
        engine.n_neighbours * 24 * engine.block_capacity ** 2
        + 2 * n_sub1 * n_sub1
    )


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

    cells_per_s, bytes_per_s = measure_ceilings()
    log(
        f"pixel-pipeline ceiling {cells_per_s / 1e9:.2f} G cells/s, "
        f"HBM stream {bytes_per_s / 1e9:.1f} GB/s"
    )

    hic = ensure_bench_data(log=log)
    repo = pathlib.Path(__file__).resolve().parents[1]
    sim = Simulation(
        "hic", hic, "/root/reference/tests/data/yeast.contigs.fa.gz",
        4, output_folder=repo / ".bench_data" / "out",
    )
    params = sim.estimate_parameters_rippe()
    engine = SweepEngine(sim, sample_param=True)
    assert engine.backend == "block", engine.backend
    demand = block_demand_per_step(engine)
    sol_steps = cells_per_s / demand

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

    result = {
        "device": jax.devices()[0].platform,
        "pixel_pipeline_ceiling_cells_per_s": round(cells_per_s),
        "hbm_stream_bytes_per_s": round(bytes_per_s),
        "block_demand_cells_per_step": demand,
        "speed_of_light_steps_per_s": round(sol_steps, 1),
        "measured_steps_per_s": round(float(steps_per_sec), 1),
        "pct_of_speed_of_light": round(
            100.0 * steps_per_sec / sol_steps, 1
        ),
        "note": (
            "ceiling = the exact pp_rows_fast scoring math, "
            "contiguous + gather-free; demand counts the block "
            "step's dense-grid cells (5x24 member grids + "
            "current/zero grids)"
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
