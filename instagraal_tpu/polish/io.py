"""info_frags.txt / BED parsing and FASTA reconstruction.

Equivalent of reference _scaffold_io.py (no Biopython). A "scaffold
dict" maps scaffold name -> list of bins, each bin being
[init_contig, frag_id, start, end, ori].
"""

from __future__ import annotations

from ..io.fasta import read_fasta, revcomp

DEFAULT_MIN_SCAFFOLD_SIZE = 0
DEFAULT_NEW_INFO_FRAGS_NAME = "new_info_frags.txt"
DEFAULT_NEW_GENOME_NAME = "new_genome.fa"
DEFAULT_JUNCTION_SEQUENCE = "NNNNNN"


def parse_info_frags(info_frags) -> dict[str, list]:
    """Parse an info_frags.txt into a scaffold dict
    (reference _scaffold_io.py:49-74)."""
    scaffolds: dict[str, list] = {}
    current = None
    with open(info_frags) as fh:
        for line in fh:
            if line.startswith(">"):
                current = line[1:].rstrip("\n")
                scaffolds[current] = []
            elif line.startswith("init_contig"):
                continue
            else:
                init_contig, id_frag, ori, start, end = line.rstrip(
                    "\n"
                ).split("\t")
                start, end, ori = int(start), int(end), int(ori)
                assert start < end
                assert ori in (-1, 1)
                scaffolds[current].append(
                    [init_contig, int(id_frag), start, end, ori]
                )
    return scaffolds


def parse_bed(bed_file) -> dict[str, list]:
    """Parse a BED file into a scaffold dict
    (reference _scaffold_io.py:77-101)."""
    scaffolds: dict[str, list] = {}
    with open(bed_file) as fh:
        for line in fh:
            chrom, start, end, query, qual, strand = line.split()[:6]
            if strand == "+":
                ori = 1
            elif strand == "-":
                ori = -1
            else:
                raise ValueError(f"Bad strand orientation: {strand}")
            if int(qual) > 0:
                scaffolds.setdefault(chrom, []).append(
                    [query, -2, int(start), int(end), ori]
                )
    return scaffolds


def format_info_frags(info_frags) -> dict[str, list]:
    """Accept either a scaffold dict or an info_frags.txt path."""
    if isinstance(info_frags, dict):
        return info_frags
    return parse_info_frags(info_frags)


def write_info_frags(scaffolds, output=DEFAULT_NEW_INFO_FRAGS_NAME) -> None:
    """Write a scaffold dict back to info_frags format
    (reference _scaffold_io.py:124-144)."""
    scaffolds = format_info_frags(scaffolds)
    with open(output, "w") as fh:
        for name, scaffold in scaffolds.items():
            fh.write(f">{name}\n")
            fh.write("init_contig\tid_frag\torientation\tstart\tend\n")
            for init_contig, id_frag, start, end, ori in scaffold:
                assert ori in (-1, 1)
                fh.write(f"{init_contig}\t{id_frag}\t{ori}\t{start}\t{end}\n")


def write_fasta(
    init_fasta,
    info_frags,
    output=DEFAULT_NEW_GENOME_NAME,
    junction: str | bool = False,
) -> None:
    """Rebuild the genome FASTA from an info_frags file and the original
    assembly; optionally insert a junction sequence between bins coming
    from different source contigs (reference _scaffold_io.py:147-200).
    """
    genome = read_fasta(init_fasta)
    records: list[tuple[str, str]] = []
    current_id = None
    parts: list[str] = []
    prev_contig = None
    with open(info_frags) as fh:
        for line in fh:
            if line.startswith(">"):
                if current_id is not None:
                    records.append((current_id, "".join(parts)))
                current_id = line[1:].strip()
                parts = []
                prev_contig = None
            elif line.startswith("init_contig"):
                prev_contig = None
            else:
                init_contig, _id, ori, start, end = line.rstrip("\n").split(
                    "\t"
                )
                start, end, ori = int(start), int(end), int(ori)
                assert start < end
                assert ori in (-1, 1)
                if junction and prev_contig not in (None, init_contig):
                    parts.append(str(junction))
                seq = genome[init_contig][start:end]
                parts.append(seq if ori == 1 else revcomp(seq))
                prev_contig = init_contig
    if current_id is not None:
        records.append((current_id, "".join(parts)))

    with open(output, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                fh.write(seq[i : i + 60] + "\n")
