#!/usr/bin/env python3
"""Reference-config quality baseline (VERDICT r3 #9, BASELINE config
#2): one full scaffold run on the real chip at the reference's default
working level — 100 cycles, level 4, bombed yeast draft — recording
final likelihood, contig stats vs the draft, the reference GPU-CI
quality gate, and wall time, for future rounds to regress against.

Writes docs/QUALITY.md (table) + docs/quality_baseline.json.
Usage: python scripts/quality_baseline.py [--cycles 100] [--level 4]
"""

import argparse
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache")
)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=100)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from instagraal_tpu.sampler.driver import Scaffolder
    from scripts.yeast_probe import ensure_bench_data

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    hic = ensure_bench_data(log=log)
    fasta = pathlib.Path(
        "/root/reference/tests/data/yeast.contigs.fa.gz"
    )
    out = REPO / ".bench_data" / "quality_out"
    t0 = time.perf_counter()
    scaf = Scaffolder(
        "hic", hic, fasta, level=args.level, output_folder=out,
        seed=args.seed,
    )
    t_setup = time.perf_counter() - t0

    # draft (input assembly) stats, from the genome's own contigs
    import gzip

    draft_lengths = []
    cur = 0
    with gzip.open(fasta, "rt") as fh:
        for line in fh:
            if line.startswith(">"):
                if cur:
                    draft_lengths.append(cur)
                cur = 0
            else:
                cur += len(line.strip())
    if cur:
        draft_lengths.append(cur)

    t0 = time.perf_counter()
    scaf.full_em(n_cycles=args.cycles, bomb=True)
    t_run = time.perf_counter() - t0

    lls = np.loadtxt(scaf.out / "list_likelihood.txt")
    # final scaffold contig lengths from the final genome structure
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
    draft = _contig_stats(draft_lengths)

    result = {
        "workload": f"yeast-L{args.level}",
        "cycles": args.cycles,
        "seed": args.seed,
        "setup_s": round(t_setup, 1),
        "run_s": round(t_run, 1),
        "cycles_per_hour": round(3600.0 * args.cycles / t_run, 1),
        "final_likelihood": float(lls[-1]),
        "best_likelihood": float(np.max(lls)),
        "draft": draft,
        "scaffold": final,
        "reference_gate": {
            "description": "reference GPU-CI: 15-45 contigs >100kb "
            "after 2 cycles at L5 from the bombed genome "
            "(test_instagraal_gpu.py:60-61); stated here for the "
            "L4/100-cycle config",
            "gt_100kb": final["gt_100kb"],
        },
    }
    line = json.dumps(result)
    print(line)
    (REPO / "docs" / "quality_baseline.json").write_text(line + "\n")

    md = f"""# Quality baseline (yeast, reference default config)

One full run of the reference's default configuration (100 cycles,
level {args.level}, bombed start — reference README.md:60-68) on the
real TPU chip, seed {args.seed}. Future rounds regress against this
table; regenerate with `python scripts/quality_baseline.py`.

| metric | draft | scaffold (100 cycles) |
|---|---|---|
| contigs | {draft["n_contigs"]} | {final["n_contigs"]} |
| total bp | {draft["total_bp"]:,} | {final["total_bp"]:,} |
| longest (bp) | {draft["longest_bp"]:,} | {final["longest_bp"]:,} |
| N50 (bp) | {draft["n50_bp"]:,} | {final["n50_bp"]:,} |
| contigs > 100 kb | {draft["gt_100kb"]} | {final["gt_100kb"]} |

- final likelihood: {result["final_likelihood"]:.1f} (best
  {result["best_likelihood"]:.1f})
- wall time: {t_run:.0f} s for {args.cycles} cycles
  ({result["cycles_per_hour"]:.0f} cycles/hour), setup {t_setup:.0f} s
- reference quality gate (15-45 contigs > 100 kb after 2 cycles at
  L5, test_instagraal_gpu.py:60-61) is asserted by
  tests/test_yeast_integration.py; the 100-cycle L4 figure here is
  the regression anchor: **{final["gt_100kb"]} contigs > 100 kb**
  (S. cerevisiae has 16 chromosomes; the draft has
  {draft["gt_100kb"]}).
"""
    (REPO / "docs" / "QUALITY.md").write_text(md)
    log("wrote docs/QUALITY.md")


if __name__ == "__main__":
    main()
