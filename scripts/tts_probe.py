#!/usr/bin/env python3
"""Time-to-solution: measured best-of-C cycles-to-target-likelihood.

Multi-chain throughput arithmetic ("C chains -> ~C x aggregate
cycles/hour") is NOT wall-clock-to-solution: best-of-C chains is not C
times fewer cycles to a target likelihood. This probe measures the
actual best-of-C curve the scaling claims must rest on
(BASELINE.md targets; docs/SCALING.md table).

Method: run C_max INDEPENDENT chains from the same bombed genome,
chain c seeded with fold_in(base_seed, c) — so chain c's trajectory
is identical in every configuration, and the best-of-C curves for
C in {1, 2, 4, ...} are nested prefixes computable from ONE run.
(MultiChainSweep's per-cycle split(key, C) would entangle chain keys
with C; on a pod all C chains advance concurrently, so cycles-to-
target IS wall-clock-to-solution there.)

Target: the likelihood chain 0 (the single-chain run) reaches after
--cycles cycles, discounted to --gain-frac of its total gain (default
0.98 — the last couple of percent is a long greedy tail every chain
crosses at its own pace, which would swamp the statistic with noise).

--exchange-every E (round 5): ALSO run C_max chains advanced in
lockstep with elitist exchange — every E cycles, chains trailing the
best by more than --exchange-thresh log-units adopt the best chain's
(state, params, ll), keeping their own PRNG streams
(MultiChainSweep.restart_from_best semantics, host-simulated here so
the per-cycle trajectories stay engine-exact). The exchanged best-of-C
curve lands next to the independent one, so the table answers "what
does exchange buy at C=8 over independence" directly.

Usage:
  python scripts/tts_probe.py [--chains-max 8] [--cycles 30]
         [--level 4] [--seed 0] [--gain-frac 0.98]
         [--exchange-every E [E ...]] [--exchange-thresh T]
         [--out FILE]

Writes one JSON line per C plus a markdown table (through a tunneled
TPU always use --out; pipes lose partial output).
"""

import argparse
import json
import os
import pathlib
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)

REPO = pathlib.Path(__file__).resolve().parent.parent
YEAST_FASTA = pathlib.Path(
    "/root/reference/tests/data/yeast.contigs.fa.gz"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-max", type=int, default=8)
    ap.add_argument("--cycles", type=int, default=30)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gain-frac", type=float, default=0.98)
    ap.add_argument(
        "--exchange-every", type=int, nargs="*", default=[],
        help="also measure elitist-exchange chains at these periods",
    )
    ap.add_argument("--exchange-thresh", type=float, default=0.0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = open(args.out, "w", buffering=1) if args.out else sys.stdout

    def log(*a):
        print(*a, file=out, flush=True)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    sys.path.insert(0, str(REPO))
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    hic = ensure_bench_data(
        log=lambda *a: print(*a, file=sys.stderr)
    )
    sim = Simulation(
        "hic", hic, YEAST_FASTA, args.level,
        output_folder=REPO / ".bench_data" / f"out_l{args.level}",
    )
    params0 = sim.estimate_parameters_rippe()
    engine = SweepEngine(sim, sample_param=True)
    state0 = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    ll0 = engine.initial_ll(state0, params0)
    log(
        json.dumps(
            {
                "workload": f"yeast-L{args.level}",
                "n_frags": sim.n_frags,
                "backend": engine.backend,
                "ll_bombed": round(float(ll0), 1),
                "chains_max": args.chains_max,
                "cycles": args.cycles,
            }
        )
    )

    # per-chain best-so-far likelihood after each cycle
    best = np.full((args.chains_max, args.cycles), -np.inf)
    t0 = time.perf_counter()
    for c in range(args.chains_max):
        key = jax.random.fold_in(
            jax.random.PRNGKey(args.seed), c
        )
        state, params, ll = state0, params0, float(ll0)
        hi = -np.inf
        for n in range(args.cycles):
            key, sub = jax.random.split(key)
            state, params, ll, _ = engine.run_cycle(
                state, params, ll, sub,
                sample_param=(n > 4),
            )
            hi = max(hi, ll)
            best[c, n] = hi
        print(
            f"chain {c}: final ll {ll:.1f} "
            f"(elapsed {time.perf_counter() - t0:.0f}s)",
            file=sys.stderr, flush=True,
        )

    # full per-chain best-so-far curves: any threshold is
    # post-processable without re-running the 8x30-cycle sweep
    log(
        json.dumps(
            {
                "best_curves": [
                    [round(v, 1) for v in row] for row in best
                ]
            }
        )
    )

    # ---- elitist-exchange runs (round 5): C_max chains in lockstep,
    # every E cycles lagging chains adopt the best chain's
    # (state, params, ll); per-chain keys stay fold_in(seed, c), so
    # E -> infinity reproduces the independent table above exactly.
    exchange_curves = {}
    for E in args.exchange_every:
        C = args.chains_max
        chains = [
            {
                "state": state0, "params": params0,
                "ll": float(ll0),
                "key": jax.random.fold_in(
                    jax.random.PRNGKey(args.seed), c
                ),
            }
            for c in range(C)
        ]
        curve = np.full(args.cycles, -np.inf)
        hi = -np.inf
        t_ex = time.perf_counter()
        for n in range(args.cycles):
            for ch in chains:
                ch["key"], sub = jax.random.split(ch["key"])
                (ch["state"], ch["params"], ch["ll"], _) = (
                    engine.run_cycle(
                        ch["state"], ch["params"], ch["ll"], sub,
                        sample_param=(n > 4),
                    )
                )
            lls_now = np.array([ch["ll"] for ch in chains])
            hi = max(hi, float(lls_now.max()))
            curve[n] = hi
            if (n + 1) % E == 0:
                best_c = int(np.argmax(lls_now))
                lag = lls_now[best_c] - lls_now
                for c, ch in enumerate(chains):
                    if c != best_c and lag[c] > args.exchange_thresh:
                        ch["state"] = chains[best_c]["state"]
                        ch["params"] = chains[best_c]["params"]
                        ch["ll"] = chains[best_c]["ll"]
        exchange_curves[E] = curve
        print(
            f"exchange E={E}: final best {hi:.1f} "
            f"(elapsed {time.perf_counter() - t_ex:.0f}s)",
            file=sys.stderr, flush=True,
        )
        log(
            json.dumps(
                {
                    "exchange_every": E,
                    "exchange_thresh": args.exchange_thresh,
                    "chains": C,
                    "best_curve": [round(v, 1) for v in curve],
                }
            )
        )

    c_values = [c for c in (1, 2, 4, 8, 16) if c <= args.chains_max]
    gain1 = best[0, -1] - float(ll0)
    fracs = sorted({args.gain_frac, 0.98, 0.995, 0.999, 1.0})
    for frac in fracs:
        target = float(ll0) + frac * gain1
        rows = []
        for C in c_values:
            # best-of-C = max over the first C chains (nested
            # prefixes)
            curve = best[:C].max(axis=0)
            reached = np.nonzero(curve >= target)[0]
            cyc = int(reached[0]) + 1 if reached.size else None
            rows.append((C, cyc, float(curve[-1])))
            log(
                json.dumps(
                    {
                        "gain_frac": frac,
                        "chains": C,
                        "cycles_to_target": cyc,
                        "target_ll": round(target, 1),
                        "best_final_ll": round(float(curve[-1]), 1),
                        "speedup_vs_1_chain": (
                            round(rows[0][1] / cyc, 2)
                            if cyc and rows[0][1]
                            else None
                        ),
                    }
                )
            )
        for E, curve in exchange_curves.items():
            reached = np.nonzero(curve >= target)[0]
            cyc = int(reached[0]) + 1 if reached.size else None
            log(
                json.dumps(
                    {
                        "gain_frac": frac,
                        "chains": args.chains_max,
                        "exchange_every": E,
                        "cycles_to_target": cyc,
                        "target_ll": round(target, 1),
                        "best_final_ll": round(float(curve[-1]), 1),
                        "speedup_vs_1_chain": (
                            round(rows[0][1] / cyc, 2)
                            if cyc and rows[0][1]
                            else None
                        ),
                    }
                )
            )

        log("")
        log(
            f"| chains C | cycles to {frac:.1%} of 1-chain "
            "gain | best final ll | cycle speedup |"
        )
        log("|---|---|---|---|")
        base = rows[0][1]
        for C, cyc, fin in rows:
            sp = (
                f"{base / cyc:.2f}x" if cyc and base else "n/a"
            )
            log(f"| {C} | {cyc} | {fin:.1f} | {sp} |")
        log("")


if __name__ == "__main__":
    main()
