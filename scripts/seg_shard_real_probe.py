#!/usr/bin/env python3
"""Sharded-vs-replicated seg step cost on the REAL chip at yeast-L2.

The round-4 close-out found the committed "sharded == replicated"
parity record does not reproduce (docs/seg_shard_probe.json
`reproduction_r4_late`): the shard_map seg graph measured 17-27x
slower than the unwrapped scan even on a 1-device mesh. This probe is
the reproducible instrument for closing that: identical chunked
methodology for every engine variant, 3 timed chunks per variant (the
spread is recorded, not discarded), and optional XProf tracing of the
sharded chunk so the regression is decomposed, not guessed.

Emits one JSON object with the exact reproduce command, commit hash,
and per-variant 3-run spreads (VERDICT r4 #7).

Usage: python scripts/seg_shard_real_probe.py [--level 2] [--steps 256]
       [--trace DIR] [--variants rep,shard,shard_local] [--out FILE]
"""

import argparse
import gzip
import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)


def _time_chunks(eng, sim, params, steps, n_chunks=3):
    """Run the engine's chunk fn over `steps`-step chunks; return
    per-chunk ms/step (first entry after a compiled warmup chunk)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome

    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    p = jax.tree.map(jnp.asarray, params)
    key = jax.random.PRNGKey(0)
    k_perm, k_steps = jax.random.split(key)
    order = jax.random.permutation(k_perm, eng.n_frags).astype(jnp.int32)
    keys = jax.random.split(k_steps, eng.n_frags)
    flags = np.ones(eng.n_frags, dtype=bool)
    pp, nz = eng._init_cache(state, p)
    llj = jnp.float32(0.0)
    # tile the per-step operands far enough for warmup + n_chunks
    need = steps * (n_chunks + 1)
    reps = -(-need // eng.n_frags)
    order = jnp.tile(order, reps)[:need]
    keys = jnp.tile(keys, (reps, 1))[:need]
    flags = np.tile(flags, reps)[:need]
    st = state
    # compiled warmup chunk
    st, p2, llj, pp, nz, _ = eng._run_chunk(
        st, p, llj, pp, nz, order[:steps], keys[:steps], flags[:steps]
    )
    jax.block_until_ready(llj)
    times = []
    for c in range(1, n_chunks + 1):
        s = slice(c * steps, (c + 1) * steps)
        t0 = time.perf_counter()
        st, p2, llj, pp, nz, _ = eng._run_chunk(
            st, p2, llj, pp, nz, order[s], keys[s], flags[s]
        )
        jax.block_until_ready(llj)
        times.append((time.perf_counter() - t0) / steps * 1e3)
    return times


def _trace_chunk(eng, sim, params, steps, trace_dir):
    """XProf one steady-state chunk; return top device ops."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome

    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    p = jax.tree.map(jnp.asarray, params)
    key = jax.random.PRNGKey(0)
    k_perm, k_steps = jax.random.split(key)
    order = jax.random.permutation(k_perm, eng.n_frags).astype(jnp.int32)
    keys = jax.random.split(k_steps, eng.n_frags)
    flags = np.ones(eng.n_frags, dtype=bool)
    pp, nz = eng._init_cache(state, p)
    llj = jnp.float32(0.0)
    st, p2, llj, pp, nz, _ = eng._run_chunk(
        state, p, llj, pp, nz, order[:steps], keys[:steps], flags[:steps]
    )
    jax.block_until_ready(llj)
    jax.profiler.start_trace(trace_dir)
    st, p2, llj, pp, nz, _ = eng._run_chunk(
        st, p2, llj, pp, nz,
        order[steps:2 * steps], keys[steps:2 * steps],
        flags[steps:2 * steps],
    )
    jax.block_until_ready(llj)
    jax.profiler.stop_trace()
    traces = sorted(
        pathlib.Path(trace_dir).rglob("*.trace.json.gz"),
        key=lambda f: f.stat().st_mtime,
    )
    if not traces:
        return []
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    dev_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "Device" in name or "/device" in name
    }
    totals: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e.get("dur", 0.0)
    total = sum(totals.values()) or 1.0
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:30]
    return [
        {"op": n, "ms": round(us / 1e3, 1),
         "pct": round(100 * us / total, 1)}
        for n, us in top
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--trace", default=None)
    ap.add_argument(
        "--variants", default="rep,shard",
        help="comma list from rep,shard,shard_local,shard_sorted",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from instagraal_tpu.parallel.mesh import make_mesh
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    repo = pathlib.Path(__file__).resolve().parents[1]
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=repo,
        capture_output=True, text=True,
    ).stdout.strip()
    hic = ensure_bench_data(log=log)
    sim = Simulation(
        "hic", hic, "/root/reference/tests/data/yeast.contigs.fa.gz",
        args.level,
        output_folder=repo / ".bench_data" / f"out_l{args.level}",
    )
    params = sim.estimate_parameters_rippe()
    nnz = int(sim.coo_rows.shape[0])
    log(f"yeast-L{args.level}: {sim.n_frags} frags, nnz={nnz}, "
        f"device={jax.devices()[0].platform}")

    variants = {}
    want = args.variants.split(",")
    mesh = make_mesh(chains=1)
    for name in want:
        if name == "rep":
            eng = SweepEngine(
                sim, backend="seg", sample_param=True,
                steps_per_call=args.steps, seg_local=False,
            )
        elif name == "shard":
            eng = SweepEngine(
                sim, backend="seg", sample_param=True, mesh=mesh,
                shard_nnz=True, steps_per_call=args.steps,
                seg_local=False,
            )
        elif name == "shard_local":
            eng = SweepEngine(
                sim, backend="seg", sample_param=True, mesh=mesh,
                shard_nnz=True, steps_per_call=args.steps,
                seg_local=True,
            )
        elif name == "shard_sorted":
            os.environ["INSTAGRAAL_TPU_SEG_SORTED"] = "1"
            try:
                eng = SweepEngine(
                    sim, backend="seg", sample_param=True, mesh=mesh,
                    shard_nnz=True, steps_per_call=args.steps,
                    seg_local=False,
                )
            finally:
                del os.environ["INSTAGRAAL_TPU_SEG_SORTED"]
        else:
            raise SystemExit(f"unknown variant {name}")
        times = _time_chunks(eng, sim, params, args.steps)
        variants[name] = {
            "ms_per_step_runs": [round(t, 2) for t in times],
            "ms_per_step": round(min(times), 2),
        }
        log(f"{name}: {[round(t, 2) for t in times]} ms/step")
        if args.trace and name.startswith("shard"):
            variants[name]["top_ops"] = _trace_chunk(
                eng, sim, params, args.steps,
                args.trace + "_" + name,
            )
        del eng

    result = {
        "what": "sharded-vs-replicated seg chunked step cost, "
                "real chip",
        "commit": commit,
        "reproduce": "python scripts/seg_shard_real_probe.py "
        + " ".join(sys.argv[1:]),
        "workload": f"yeast-L{args.level}: {sim.n_frags} frags, "
                    f"{nnz} nnz",
        "device": str(jax.devices()[0]),
        "steps_per_chunk": args.steps,
        "variants": variants,
    }
    if "rep" in variants and "shard" in variants:
        result["sharded_over_replicated"] = round(
            variants["shard"]["ms_per_step"]
            / variants["rep"]["ms_per_step"], 2,
        )
    line = json.dumps(result, indent=1)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
