#!/usr/bin/env python3
"""Fragment a chromosome-level FASTA into an in-silico contig assembly.

Equivalent of reference scripts/make_insilico_assembly.py: Poisson break
process (default 10 breaks/Mb, seed 42), fragments shorter than 100 bp
dropped, contigs renamed contig_NNN with true coordinates recorded in
the description (``from_<chrom>:<start>-<end>``) — the format that
instagraal_tpu.testing.simulate_pairs consumes to generate ground-truth
Hi-C pairs.

Usage: python scripts/make_insilico_assembly.py input.fa output.contigs.fa.gz
"""

import argparse
import gzip
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from instagraal_tpu.io.fasta import read_fasta  # noqa: E402

RANDOM_SEED = 42
BREAK_RATE = 10  # expected breaks per Mb
MIN_CONTIG_LEN = 100


def fragment_genome(fasta_path, break_rate, min_len, seed):
    rng = np.random.default_rng(seed)
    contigs = []
    idx = 1
    for chrom, seq in read_fasta(fasta_path).items():
        n = len(seq)
        n_breaks = int(rng.poisson(break_rate * n / 1_000_000))
        if n_breaks == 0:
            bounds = [(0, n)]
        else:
            cuts = sorted(rng.integers(1, n, n_breaks).tolist())
            bounds = list(zip([0, *cuts], [*cuts, n]))
        for start, end in bounds:
            if end - start < min_len:
                continue
            contigs.append(
                (f"contig_{idx:03d} from_{chrom}:{start}-{end}", seq[start:end])
            )
            idx += 1
    return contigs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_fasta")
    ap.add_argument("output_fasta")
    ap.add_argument("--break-rate", type=float, default=BREAK_RATE)
    ap.add_argument("--min-len", type=int, default=MIN_CONTIG_LEN)
    ap.add_argument("--seed", type=int, default=RANDOM_SEED)
    ap.add_argument(
        "--shuffle", action="store_true",
        help="shuffle contig order (harder scaffolding test)",
    )
    args = ap.parse_args()

    contigs = fragment_genome(
        args.input_fasta, args.break_rate, args.min_len, args.seed
    )
    if args.shuffle:
        np.random.default_rng(args.seed).shuffle(contigs)
    opener = gzip.open if args.output_fasta.endswith(".gz") else open
    with opener(args.output_fasta, "wt") as fh:
        for header, seq in contigs:
            fh.write(f">{header}\n")
            for i in range(0, len(seq), 61):
                fh.write(seq[i : i + 61] + "\n")
    print(f"{len(contigs)} contigs written to {args.output_fasta}")


if __name__ == "__main__":
    main()
