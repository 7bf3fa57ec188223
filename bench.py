#!/usr/bin/env python3
"""Benchmark: MCMC sweep throughput on the REAL yeast level-4 workload.

Builds (or reuses, via the .bench_data cache) the full pre -> pyramid
pipeline from the reference yeast test assembly
(/root/reference/tests/data/yeast.contigs.fa.gz, S. cerevisiae W303,
~12 Mb) with simulated Hi-C pairs, then times full scaffolding cycles
at pyramid level 4 (489 frags, 1233 sub-frags, ~278k nnz pixels) on
whatever device JAX selects (the real TPU under the driver).

Each sweep step = contig renumbering + 5 candidates x 24 mutated
genomes scored with the exact cis/trans-split delta decomposition +
greedy accept + nuisance-parameter MH — one lax.scan iteration of a
single on-device cycle call (no host round trips inside a cycle).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference CUDA implementation performs ~40 kernel
launches and >=6 host<->device synchronisations per sweep step
(SURVEY.md §3.2, cuda_lib_gl_single.py:1401-1465); 100 steps/s is a
favourable estimate of its RTX-4090 throughput at this problem size
(>=10 ms/step launch+sync bound; the round-1 measured figure for this
very workload on this engine was 30 steps/s). vs_baseline = measured
steps/s / 100.

If the yeast pipeline cannot be built (reference data missing), falls
back to an equivalently-sized synthetic problem and says so in `unit`.
"""

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

REPO = pathlib.Path(__file__).resolve().parent
YEAST_FASTA = pathlib.Path(
    "/root/reference/tests/data/yeast.contigs.fa.gz"
)
BENCH_LEVEL = 4
N_CYCLES = 5
REFERENCE_STEPS_PER_SEC = 100.0
T_START = 0.0


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def _previous_bench_value():
    """Latest committed BENCH_r*.json flagship value, for the perf
    tripwire (VERDICT r3 #1: a >10% loss must not ship silently)."""
    beches = sorted(REPO.glob("BENCH_r*.json"))
    for path in reversed(beches):
        try:
            doc = json.loads(path.read_text())
            parsed = doc.get("parsed", doc)
            if parsed.get("metric") == "mcmc_sweep_steps_per_sec":
                return float(parsed["value"]), path.name
        except Exception:
            continue
    return None, None


def _build_yeast_sim():
    sys.path.insert(0, str(REPO))
    from scripts.yeast_probe import ensure_bench_data

    from instagraal_tpu.sampler.setup import Simulation

    hic = ensure_bench_data(log=lambda *a: print(*a, file=sys.stderr))
    sim = Simulation(
        "hic", hic, YEAST_FASTA, BENCH_LEVEL,
        output_folder=REPO / ".bench_data" / "out",
    )
    params = sim.estimate_parameters_rippe()
    return sim, params, "yeast-L4"


def _build_synthetic_sim():
    from instagraal_tpu.testing import SyntheticSim

    sim = SyntheticSim(n_frags=512, n_contigs=16, seed=0)
    return sim, sim.params, "synthetic-fallback"


def main():
    global T_START
    T_START = time.perf_counter()
    sys.path.insert(0, str(REPO))
    import jax
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine

    try:
        sim, params, workload = _build_yeast_sim()
    except Exception as e:  # pragma: no cover - data missing only
        print(f"bench: yeast pipeline unavailable ({e}); "
              "falling back to synthetic", file=sys.stderr)
        sim, params, workload = _build_synthetic_sim()

    nnz = int(sim.coo_rows.shape[0])
    engine = SweepEngine(sim, sample_param=True)  # backend="auto"

    # scaffold from the bombed (fully exploded) genome, as full_em does
    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    ll = engine.initial_ll(state, params)
    key = jax.random.PRNGKey(0)

    t_setup = time.perf_counter() - T_START
    print("bench: compiling cycle...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    key, sub = jax.random.split(key)
    state, params, ll, _ = engine.run_cycle(
        state, params, ll, sub, sample_param=True
    )
    t_compile = time.perf_counter() - t0

    print("bench: timing...", file=sys.stderr, flush=True)
    from instagraal_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    cycle_rates = []
    for _ in range(N_CYCLES):
        with timer.phase("prng_split"):
            key, sub = jax.random.split(key)
        with timer.phase("cycle_device"):
            tc = time.perf_counter()
            state, params, ll, traces = engine.run_cycle(
                state, params, ll, sub, sample_param=True
            )
            cycle_rates.append(
                sim.n_frags / (time.perf_counter() - tc)
            )
    print(timer.report(log=False), file=sys.stderr, flush=True)
    print(
        "bench: per-cycle steps/s = "
        + ", ".join(f"{r:.1f}" for r in cycle_rates),
        file=sys.stderr, flush=True,
    )

    # median of per-cycle rates: robust to a transient tunnel/device
    # stall in any single cycle (round 3's driver run recorded 336
    # steps/s on code that measures 440-450 in steady state)
    steps_per_sec = _median(cycle_rates)
    # BASELINE.json's named metric: each step scores n_neighbours x 24
    # full-genome candidate likelihoods (+1 nuisance MH evaluation)
    evals_per_sec = steps_per_sec * (engine.n_neighbours * 24 + 1)

    # speed-of-light per chip (BASELINE.md: "likelihood evals/sec/chip
    # (speed-of-light analysis per chip)"): ceilings measured with the
    # step's exact ops at the step's shapes (see
    # scripts/roofline_probe.py docstring); achieved must be < 100%
    sol = None
    try:
        from scripts.roofline_probe import (
            attach_pct,
            block_speed_of_light,
        )

        if engine.backend == "block":
            sol = attach_pct(
                block_speed_of_light(engine), steps_per_sec
            )
    except Exception as e:  # pragma: no cover - defensive
        print(f"bench: roofline skipped ({e})", file=sys.stderr)

    # beyond-envelope figure (VERDICT r2 #1): the block backend's dense
    # grid ends at 6,144 sub-frags; yeast level 2 (10,394 sub-frags,
    # ~978k nnz) exercises the seg backend that replaces the old
    # ~20-30 steps/s delta fallback past it. Skipped if the bench has
    # already spent most of a transport budget (cold tunnel).
    beyond = None
    if (
        workload == "yeast-L4"
        and time.perf_counter() - T_START < 520.0
        and os.environ.get("INSTAGRAAL_TPU_BENCH_BEYOND", "1") != "0"
    ):
        try:
            beyond = _bench_beyond_envelope()
        except Exception as e:  # pragma: no cover - defensive
            print(
                f"bench: beyond-envelope skipped ({e})", file=sys.stderr
            )

    result = {
        "metric": "mcmc_sweep_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": f"steps/s ({workload}: n_frags={sim.n_frags}, "
        f"nnz={nnz}, 5x24 mutations/step + nuisance MH, "
        f"scan engine, backend={engine.backend}, "
        f"cycles/hour={round(3600 * steps_per_sec / sim.n_frags)}, "
        f"genome_likelihood_evals/s/chip={round(evals_per_sec)}, "
        f"device={jax.devices()[0].platform})",
        "vs_baseline": round(
            steps_per_sec / REFERENCE_STEPS_PER_SEC, 3
        ),
        # time-to-first-step decomposition (VERDICT r4 #5): setup =
        # data/pyramid/param-fit host work, compile = first cycle call
        # (persistent XLA cache makes warm re-runs seconds)
        "setup_s": round(t_setup, 1),
        "first_cycle_compile_s": round(t_compile, 1),
    }
    if sol is not None:
        result["speed_of_light"] = sol
    if beyond is not None:
        result["beyond_envelope"] = beyond

    prev, prev_name = _previous_bench_value()
    if prev is not None and workload == "yeast-L4":
        ratio = steps_per_sec / prev
        result["vs_previous_round"] = {
            "previous": prev,
            "source": prev_name,
            "ratio": round(ratio, 3),
        }
        if ratio < 0.9:
            result["regression"] = (
                f"PERF REGRESSION: {steps_per_sec:.1f} steps/s is "
                f"{100 * (1 - ratio):.1f}% below {prev_name}'s {prev}"
            )
            print(result["regression"], file=sys.stderr, flush=True)
    print(json.dumps(result))


def _bench_beyond_envelope():
    """Time the seg backend at yeast level 2 (past the block
    envelope) through the chunked path: bounded device calls, ~90 s
    compile + a few seconds of timed steps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    hic = ensure_bench_data(log=lambda *a: print(*a, file=sys.stderr))
    sim = Simulation(
        "hic", hic, YEAST_FASTA, 2,
        output_folder=REPO / ".bench_data" / "out_l2",
    )
    params = sim.estimate_parameters_rippe()
    engine = SweepEngine(sim, sample_param=True, steps_per_call=256)
    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    ll = engine.initial_ll(state, params)

    spc = engine.steps_per_call
    key = jax.random.PRNGKey(0)
    k_perm, k_steps = jax.random.split(key)
    order = jax.random.permutation(k_perm, engine.n_frags).astype(
        jnp.int32
    )
    keys = jax.random.split(k_steps, engine.n_frags)
    flags = np.ones(engine.n_frags, dtype=bool)
    p = jax.tree.map(jnp.asarray, params)
    pp, nz_c = engine._init_cache(state, p)
    llj = jnp.float32(ll)
    st, p2, llj, pp, nz_c, _ = engine._run_chunk(  # compile
        state, p, llj, pp, nz_c, order[:spc], keys[:spc], flags[:spc]
    )
    jax.block_until_ready(llj)
    steps = 0
    t0 = time.perf_counter()
    for c in range(1, 4):
        s, e = c * spc, min((c + 1) * spc, engine.n_frags)
        if s >= e:
            break
        st, p2, llj, pp, nz_c, _ = engine._run_chunk(
            st, p2, llj, pp, nz_c, order[s:e], keys[s:e], flags[s:e]
        )
        steps += e - s
    jax.block_until_ready(llj)
    rate = steps / (time.perf_counter() - t0)
    n_sub = int(np.asarray(sim.sub_index.frag_of_sub).shape[0])
    out = {
        "workload": "yeast-L2",
        "backend": engine.backend,
        "n_frags": sim.n_frags,
        "n_sub": n_sub,
        "nnz": int(sim.coo_rows.shape[0]),
        "steps_per_sec": round(rate, 1),
        "vs_round2_fallback": round(rate / 25.0, 1),
        "note": "past the 6144-sub-frag block envelope; round-2 "
        "delta fallback measured 19-30 steps/s at comparable shapes",
    }
    # sharded row (VERDICT r4 #1 tripwire): the same seg chunk under
    # shard_nnz on a 1-device mesh — the exact graph BASELINE config
    # #5 runs per shard. Steady-state per-chunk times; ratio vs the
    # replicated row above must stay <= 1.5 (the round-4 regression
    # shipped because only the L4 flagship had a tripwire).
    if engine.backend == "seg":
        try:
            out["sharded"] = _bench_seg_sharded(
                sim, params, state, rate
            )
        except Exception as e:  # pragma: no cover - defensive
            print(f"bench: sharded seg row skipped ({e})",
                  file=sys.stderr)
    if engine.backend == "seg":
        out["capacities"] = {
            "tier1": int(engine.slice_capacity),
            "tier2": int(engine.seg_cap2),
            "row_windows": [int(c) for c in engine.seg_rowcaps],
            "calibration": "docs/seg_cap_probe.json "
            "(scripts/seg_cap_probe.py measures candidate caps on "
            "the running chip; pass the winner via --slice-cap)",
        }
        try:
            from scripts.roofline_probe import (
                attach_pct,
                seg_speed_of_light,
            )

            out["speed_of_light"] = attach_pct(
                seg_speed_of_light(engine), rate
            )
        except Exception as e:  # pragma: no cover - defensive
            print(
                f"bench: seg roofline skipped ({e})", file=sys.stderr
            )
    return out


def _bench_seg_sharded(sim, params, state, rep_rate):
    """Time the sharded (shard_nnz) seg chunk at yeast-L2 and compare
    against the replicated rate measured in the same session."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.parallel.mesh import make_mesh
    from instagraal_tpu.sampler.device_sweep import SweepEngine

    mesh = make_mesh(chains=1)
    eng = SweepEngine(
        sim, backend="seg", sample_param=True, mesh=mesh,
        shard_nnz=True, steps_per_call=256,
    )
    spc = eng.steps_per_call
    key = jax.random.PRNGKey(0)
    k_perm, k_steps = jax.random.split(key)
    order = jax.random.permutation(k_perm, eng.n_frags).astype(
        jnp.int32
    )
    keys = jax.random.split(k_steps, eng.n_frags)
    flags = np.ones(eng.n_frags, dtype=bool)
    p = jax.tree.map(jnp.asarray, params)
    pp, nz = eng._init_cache(state, p)
    llj = jnp.float32(0.0)
    st, p2, llj, pp, nz, _ = eng._run_chunk(  # compile
        state, p, llj, pp, nz, order[:spc], keys[:spc], flags[:spc]
    )
    jax.block_until_ready(llj)
    times = []
    for c in range(1, 4):
        s, e = c * spc, min((c + 1) * spc, eng.n_frags)
        if s >= e:
            break
        t0 = time.perf_counter()
        st, p2, llj, pp, nz, _ = eng._run_chunk(
            st, p2, llj, pp, nz, order[s:e], keys[s:e], flags[s:e]
        )
        jax.block_until_ready(llj)
        times.append((time.perf_counter() - t0) / (e - s) * 1e3)
    ms = min(times)
    ratio = (ms / 1e3) * rep_rate  # = sharded_ms / replicated_ms
    row = {
        "ms_per_step_runs": [round(t, 2) for t in times],
        "steps_per_sec": round(1e3 / ms, 1),
        "seg_local": bool(eng.seg_local),
        "sharded_over_replicated": round(ratio, 2),
    }
    if ratio > 1.5:
        row["regression"] = (
            f"SEG SHARD REGRESSION: sharded step is {ratio:.2f}x the "
            f"replicated step (target <= 1.5x)"
        )
        print(row["regression"], file=sys.stderr, flush=True)
    return row


if __name__ == "__main__":
    main()
