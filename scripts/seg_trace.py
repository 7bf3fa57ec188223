#!/usr/bin/env python3
"""XProf-trace one seg chunk at yeast L2 and print the top device ops.

Writes a jax.profiler trace around a steady-state chunk, then parses
the perfetto trace.json.gz for TPU op durations so the step's cost
decomposition is measured, not guessed (round-2 block analysis
methodology, applied to the round-3 seg backend).
"""

import gzip
import json
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
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    level = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/seg_trace"
    repo = pathlib.Path(__file__).resolve().parents[1]
    hic = ensure_bench_data(log=lambda *a: print(*a, file=sys.stderr))
    sim = Simulation(
        "hic", hic, "/root/reference/tests/data/yeast.contigs.fa.gz",
        level, output_folder=repo / ".bench_data" / f"out_l{level}",
    )
    params = sim.estimate_parameters_rippe()
    eng = SweepEngine(sim, sample_param=True, steps_per_call=256)
    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    ll = eng.initial_ll(state, params)
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
    llj = jnp.float32(ll)
    args = (state, p, llj, pp, nz)
    st, p2, llj, pp, nz, _ = eng._run_chunk(  # compile + warm
        *args, order[:spc], keys[:spc], flags[:spc]
    )
    jax.block_until_ready(llj)
    print("tracing...", file=sys.stderr, flush=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    st, p2, llj, pp, nz, _ = eng._run_chunk(
        st, p2, llj, pp, nz,
        order[spc: 2 * spc], keys[spc: 2 * spc], flags[spc: 2 * spc],
    )
    jax.block_until_ready(llj)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(
        f"chunk of {spc} steps: {dt:.2f}s = {spc / dt:.1f} steps/s",
        flush=True,
    )

    # parse the perfetto trace for device-lane op durations
    traces = sorted(
        pathlib.Path(trace_dir).rglob("*.trace.json.gz"),
        key=lambda f: f.stat().st_mtime,
    )
    if not traces:
        print("no trace.json.gz found", file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # device lanes: pick pids whose process name mentions TPU/device
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    dev_pids = {
        pid
        for pid, name in pid_names.items()
        if "TPU" in name or "Device" in name or "/device" in name
    }
    totals: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e.get("dur", 0.0)
    total = sum(totals.values())
    print(f"device op time total: {total / 1e6:.3f} s over {spc} steps")
    for name, us in sorted(
        totals.items(), key=lambda kv: -kv[1]
    )[:40]:
        print(f"{us / 1e3:10.1f} ms  {100 * us / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
