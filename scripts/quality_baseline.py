#!/usr/bin/env python3
"""Scaffold-quality regression net (VERDICT r3 #9 + r4 #6).

Runs full scaffold configurations on the real chip and records a
quality row per config in docs/quality_baseline.json + a table in
docs/QUALITY.md. `--check` re-runs the configs and FAILS (exit 1)
when a metric leaves its stated band — the net under hot-path
rewrites. Default configs:

  l4        reference default: 100 cycles, level 4, block backend
            (reference README.md:60-68)
  l2-seg    100 cycles, level 2 — the seg backend past the block
            envelope (10,394 subs)
  l4-chains 100 cycles, level 4, 4 chains, best-chain export

Bands (why these): contigs >100 kb must land on 16 +/- tolerance
(one per yeast chromosome — the biological truth); final likelihood
must stay within a stated margin of the recorded value (greedy MCMC
with a fixed seed is reproducible up to f32 noise and backend
reductions).

Usage: python scripts/quality_baseline.py [--configs l4 l2-seg ...]
       [--cycles 100] [--check]
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache")
)

JSON_PATH = REPO / "docs" / "quality_baseline.json"
MD_PATH = REPO / "docs" / "QUALITY.md"

CONFIGS = {
    "l4": {"level": 4, "chains": 1, "backend": None},
    # steps_per_call pinned to 256: the auto-calibrated 1024-step seg
    # call crashed the TPU worker in three consecutive runs
    # (quality_baseline.json l2_seg_attempts); every successful seg
    # measurement used <=256-step calls
    "l2-seg": {"level": 2, "chains": 1, "backend": "seg",
               "steps_per_call": 256},
    "l4-chains": {"level": 4, "chains": 4, "backend": None},
}

# regression bands: gt_100kb within +/-6 of recorded (reference CI
# itself accepts 15-45 at 2 cycles); likelihood within 5% of the
# recorded |final|
GT100_TOL = 6
LL_REL_TOL = 0.05


def _contig_stats(lengths_bp):
    import numpy as np

    lengths = np.sort(np.asarray(lengths_bp))[::-1]
    total = int(lengths.sum())
    cum = np.cumsum(lengths)
    n50 = int(lengths[np.searchsorted(cum, total / 2)])
    return {
        "n_contigs": int(len(lengths)),
        "total_bp": total,
        "longest_bp": int(lengths[0]),
        "n50_bp": n50,
        "gt_100kb": int((lengths > 100_000).sum()),
    }


def run_config(name, cfg, cycles, seed, log):
    import numpy as np

    from instagraal_tpu.sampler.driver import Scaffolder
    from scripts.yeast_probe import ensure_bench_data

    hic = ensure_bench_data(log=log)
    fasta = pathlib.Path(
        "/root/reference/tests/data/yeast.contigs.fa.gz"
    )
    out = REPO / ".bench_data" / f"quality_{name}"
    t0 = time.perf_counter()
    kw = {}
    if cfg["backend"] == "seg":
        # force past the block envelope by level choice; the engine
        # resolves seg on its own at L2 — asserted below
        pass
    if cfg.get("steps_per_call"):
        kw["steps_per_call"] = cfg["steps_per_call"]
    scaf = Scaffolder(
        "hic", hic, fasta, level=cfg["level"], output_folder=out,
        seed=seed, chains=cfg["chains"], **kw,
    )
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    scaf.full_em(n_cycles=cycles, bomb=True)
    t_run = time.perf_counter() - t0
    if cfg["backend"] is not None:
        eng = scaf._sweep_engine
        got = eng.engine.backend if hasattr(eng, "engine") else eng.backend
        assert got == cfg["backend"], (name, got)

    lls = np.loadtxt(scaf.out / "list_likelihood.txt")
    id_c = np.asarray(scaf.sampler.state.id_c)
    frag_len_bp = np.asarray(
        scaf.simulation.level.S_o_A_frags["len_bp"]
    ).astype(np.int64)
    contig_bp = {}
    for f, c in enumerate(id_c):
        contig_bp[int(c)] = contig_bp.get(int(c), 0) + int(
            frag_len_bp[f]
        )
    final = _contig_stats(list(contig_bp.values()))
    return {
        "config": name,
        "workload": f"yeast-L{cfg['level']}",
        "chains": cfg["chains"],
        "backend": (
            scaf._sweep_engine.backend
            if hasattr(scaf._sweep_engine, "backend")
            else "scan"
        ),
        "cycles": cycles,
        "seed": seed,
        "setup_s": round(t_setup, 1),
        "run_s": round(t_run, 1),
        "cycles_per_hour": round(3600.0 * cycles / t_run, 1),
        "final_likelihood": float(np.atleast_1d(lls)[-1]),
        "best_likelihood": float(np.max(lls)),
        "scaffold": final,
    }


def check_row(row, recorded):
    """Compare a fresh row against its recorded band; return a list
    of violations (empty = pass)."""
    bad = []
    got = row["scaffold"]["gt_100kb"]
    want = recorded["scaffold"]["gt_100kb"]
    if abs(got - want) > GT100_TOL:
        bad.append(
            f"{row['config']}: gt_100kb {got} vs recorded {want} "
            f"(tol {GT100_TOL})"
        )
    ll, ll0 = row["best_likelihood"], recorded["best_likelihood"]
    if abs(ll - ll0) > LL_REL_TOL * abs(ll0):
        bad.append(
            f"{row['config']}: best_likelihood {ll:.0f} vs recorded "
            f"{ll0:.0f} (tol {LL_REL_TOL:.0%})"
        )
    return bad


def write_md(rows):
    lines = [
        "# Quality regression net (yeast, real chip)",
        "",
        "Full scaffold runs from a bombed draft, fixed seed; "
        "regenerate with `python scripts/quality_baseline.py`, "
        "regress with `--check` (fails past the stated bands: "
        f"contigs>100kb +/-{GT100_TOL}, best likelihood "
        f"+/-{LL_REL_TOL:.0%}). S. cerevisiae truth: 16 chromosomes.",
        "",
        "| config | backend | chains | cycles | contigs>100kb | N50 "
        "(bp) | best ll | cycles/hour |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        s = r["scaffold"]
        lines.append(
            f"| {r['config']} ({r['workload']}) | {r['backend']} | "
            f"{r['chains']} | {r['cycles']} | {s['gt_100kb']} | "
            f"{s['n50_bp']:,} | {r['best_likelihood']:.0f} | "
            f"{r['cycles_per_hour']:.0f} |"
        )
    lines += [
        "",
        "The reference's own CI gate is 15-45 contigs >100 kb after "
        "2 cycles at L5 (test_instagraal_gpu.py:60-61), asserted by "
        "tests/test_yeast_integration.py; these 100-cycle rows are "
        "the finer regression anchors.",
        "",
    ]
    MD_PATH.write_text("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--configs", nargs="*", default=list(CONFIGS),
        choices=list(CONFIGS),
    )
    ap.add_argument("--cycles", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()

    recorded = {}
    if JSON_PATH.exists():
        doc = json.loads(JSON_PATH.read_text())
        rows = doc.get("rows", [doc] if doc.get("scaffold") else [])
        for r in rows:
            # normalize legacy (round-4 single-row) records
            r.setdefault("config", "l4")
            r.setdefault("workload", r.get("workload", "yeast-L4"))
            r.setdefault("chains", 1)
            r.setdefault("backend", "block")
        recorded = {r["config"]: r for r in rows}

    fresh = []
    violations = []
    for name in args.configs:
        log(f"=== config {name} ===")
        row = run_config(
            name, CONFIGS[name], args.cycles, args.seed, log
        )
        print(json.dumps(row), flush=True)
        fresh.append(row)
        if args.check and name in recorded:
            violations += check_row(row, recorded[name])
        elif not args.check:
            # crash-proof: persist after EVERY config (a TPU worker
            # crash 30 min into the next config must not lose this
            # row — it did, twice, on 2026-08-21)
            recorded[name] = row
            rows_now = [recorded[k] for k in CONFIGS if k in recorded]
            JSON_PATH.write_text(
                json.dumps(
                    {
                        "commit": commit,
                        "reproduce":
                            "python scripts/quality_baseline.py "
                            + " ".join(sys.argv[1:]),
                        "bands": {
                            "gt_100kb_tol": GT100_TOL,
                            "ll_rel_tol": LL_REL_TOL,
                        },
                        "rows": rows_now,
                    },
                    indent=1,
                )
                + "\n"
            )
            write_md(rows_now)

    if args.check:
        if violations:
            print(
                "QUALITY REGRESSION:\n  " + "\n  ".join(violations),
                file=sys.stderr,
            )
            sys.exit(1)
        print("quality check passed", file=sys.stderr)
        return

    # record mode: merge fresh rows over recorded ones
    for r in fresh:
        recorded[r["config"]] = r
    rows = [recorded[k] for k in CONFIGS if k in recorded]
    JSON_PATH.write_text(
        json.dumps(
            {
                "commit": commit,
                "reproduce": "python scripts/quality_baseline.py "
                + " ".join(sys.argv[1:]),
                "bands": {
                    "gt_100kb_tol": GT100_TOL,
                    "ll_rel_tol": LL_REL_TOL,
                },
                "rows": rows,
            },
            indent=1,
        )
        + "\n"
    )
    write_md(rows)
    log("wrote docs/QUALITY.md + docs/quality_baseline.json")


if __name__ == "__main__":
    main()
