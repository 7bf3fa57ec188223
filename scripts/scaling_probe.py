#!/usr/bin/env python3
"""Measure MCMC-cycle scaling efficiency over chains (BASELINE.md:25-26).

Runs the multi-chain scan engine on the real yeast workload at several
chain counts and reports per-configuration aggregate chain-cycles/hour
and efficiency vs the single-chain run:

- on one chip, C chains batch through the chain vmap: efficiency > 1/C
  means the batch fills otherwise-idle vector lanes;
- on a mesh (real pod or XLA_FLAGS=--xla_force_host_platform_device_count
  virtual CPU mesh), chains shard across the "chains" axis and
  --shard-nnz additionally splits the contact matrix across the
  "shards" axis (the composed layout).

Usage:
  python scripts/scaling_probe.py [--chains 1,2,4] [--cycles 2]
         [--level L] [--backend B] [--shard-nnz] [--out FILE]

Writes one JSON line per configuration to --out (default stdout);
through a tunneled TPU, write to a file (pipes lose partial output).
"""

import argparse
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

REPO = pathlib.Path(__file__).resolve().parent.parent
YEAST_FASTA = pathlib.Path("/root/reference/tests/data/yeast.contigs.fa.gz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", default="1,2,4")
    ap.add_argument("--cycles", type=int, default=2)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--shard-nnz", action="store_true")
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
    from scripts.yeast_probe import ensure_bench_data  # noqa: E402

    import numpy as np  # noqa: E402

    from instagraal_tpu.core.ops import explode_genome  # noqa: E402
    from instagraal_tpu.parallel.mesh import make_mesh  # noqa: E402
    from instagraal_tpu.sampler.device_sweep import (  # noqa: E402
        MultiChainSweep,
        SweepEngine,
    )
    from instagraal_tpu.sampler.setup import Simulation  # noqa: E402

    hic = ensure_bench_data(log=log)
    sim = Simulation(
        "hic", hic, YEAST_FASTA, args.level,
        output_folder=REPO / ".bench_data" / "out",
    )
    params = sim.estimate_parameters_rippe()
    n_dev = len(jax.devices())
    log(f"devices: {n_dev} x {jax.devices()[0].platform}, "
        f"level {args.level}: {sim.n_frags} frags, "
        f"{sim.coo_rows.shape[0]} nnz")

    state0 = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )

    base_rate = None
    for C in [int(c) for c in args.chains.split(",")]:
        mesh = None
        ekw = {}
        if n_dev > 1 and args.shard_nnz:
            # pixels sharded in EVERY config (incl. the C=1 baseline,
            # so efficiency compares like layouts); chains ride the
            # mesh's chains axis when divisible, else batch locally
            c_axis = C if (C > 1 and n_dev % C == 0) else 1
            mesh = make_mesh(chains=c_axis)
            ekw = {"mesh": mesh, "shard_nnz": True}
        elif n_dev > 1 and C > 1 and n_dev % C == 0:
            # one chain per device; a (C, n/C) mesh would rerun
            # each chain redundantly on every shards column
            mesh = make_mesh(n_devices=C, chains=C)
        engine = SweepEngine(
            sim, backend=args.backend, sample_param=True, **ekw
        )
        if C == 1:
            carry = [state0, params, engine.initial_ll(state0, params)]

            def run(key, engine=engine, carry=carry):
                s, p, ll, _ = engine.run_cycle(
                    carry[0], carry[1], carry[2], key, sample_param=True
                )
                carry[:] = [s, p, ll]
        else:
            ms = MultiChainSweep(
                engine,
                mesh=None if engine.shard_nnz else mesh,
                n_chains=C,
            )
            carry = [
                ms.broadcast_state(state0),
                ms.broadcast_params(params),
                np.full(C, engine.initial_ll(state0, params)),
            ]

            def run(key, ms=ms, carry=carry):
                s, p, lls, _ = ms.run_cycle(
                    carry[0], carry[1], carry[2], key, sample_param=True
                )
                carry[:] = [s, p, lls]

        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        run(sub)  # compile + first cycle
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.cycles):
            key, sub = jax.random.split(key)
            run(sub)
        dt = time.perf_counter() - t0
        # aggregate chain-cycles per hour: C chains each advance
        # `cycles` cycles in dt seconds
        rate = 3600.0 * C * args.cycles / dt
        if base_rate is None:
            # baseline = the FIRST configuration's per-chain rate
            # (pass --chains 1,... for efficiency vs a single chain)
            base_c, base_rate = C, rate / C
        eff = rate / (C * base_rate)
        log(json.dumps({
            "chains": C,
            "shard_nnz": bool(ekw),
            "mesh": dict(mesh.shape) if mesh is not None else None,
            "chain_cycles_per_hour": round(rate, 1),
            "sec_per_cycle_call": round(dt / args.cycles, 3),
            "efficiency_vs_first": round(eff, 3),
            "baseline_chains": base_c,
            "compile_s": round(compile_s, 1),
        }))


if __name__ == "__main__":
    main()
