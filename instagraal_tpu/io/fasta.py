"""Minimal, fast FASTA reading/writing (plain or gzip), no Biopython.

Replaces the reference's Bio.SeqIO usage (reference pre.py:37-45) and the
FASTA writer of pyramid_sparse.level.generate_new_fasta
(reference pyramid_sparse.py:1963-2033).
"""

from __future__ import annotations

import gzip
import io
import pathlib

_COMPLEMENT = bytes.maketrans(
    b"ACGTUacgtuRYSWKMBDHVNryswkmbdhvn",
    b"TGCAAtgcaaYRSWMKVHDBNyrswmkvhdbn",
)


def _opener(path: str | pathlib.Path, mode: str = "rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path: str | pathlib.Path) -> dict[str, str]:
    """Load a FASTA file into an ordered dict {contig name -> sequence}.

    The contig name is the first whitespace-delimited token of the header.
    Handles plain and gzip-compressed files.
    """
    records: dict[str, str] = {}
    name: str | None = None
    chunks: list[str] = []
    with _opener(path) as fh:
        for line in fh:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    records[name] = "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            records[name] = "".join(chunks)
    return records


def write_fasta(
    records: dict[str, str] | list[tuple[str, str]],
    path: str | pathlib.Path,
    line_width: int = 61,
) -> None:
    """Write sequences as FASTA with fixed line width.

    The default width of 61 matches the reference's output convention
    (reference pyramid_sparse.py:2021 `len_line = 61`).
    """
    items = records.items() if isinstance(records, dict) else records
    with _opener(path, "wt") as fh:
        for name, seq in items:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), line_width):
                fh.write(seq[i : i + line_width] + "\n")


def revcomp(seq: str) -> str:
    """Reverse-complement a DNA sequence (IUPAC-aware, case-preserving)."""
    return seq.encode()[::-1].translate(_COMPLEMENT).decode()


def format_fasta(records: list[tuple[str, str]], line_width: int = 61) -> str:
    """Render records to a FASTA string (for tests / in-memory use)."""
    buf = io.StringIO()
    for name, seq in records:
        buf.write(f">{name}\n")
        for i in range(0, len(seq), line_width):
            buf.write(seq[i : i + line_width] + "\n")
    return buf.getvalue()
