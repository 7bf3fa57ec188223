"""Assembly statistics: N50/L50, N90/L90, GC, length summaries.

Equivalent of reference assembly_stats.py (257 LoC): computes standard
contiguity metrics from a FASTA (plain or gzip) and renders side-by-side
comparison tables.
"""

from __future__ import annotations

import pathlib

import numpy as np

from .io.fasta import read_fasta
from .io.digest import gc_content


def compute_assembly_stats(fasta_path) -> dict:
    """All stats for one assembly FASTA."""
    records = read_fasta(fasta_path)
    lengths = np.array(
        sorted((len(s) for s in records.values()), reverse=True),
        dtype=np.int64,
    )
    if lengths.size == 0:
        return {
            "n_contigs": 0, "total_length": 0, "max_length": 0,
            "min_length": 0, "mean_length": 0.0, "median_length": 0.0,
            "n50": 0, "l50": 0, "n90": 0, "l90": 0, "gc_content": 0.0,
        }
    total = int(lengths.sum())
    cumul = np.cumsum(lengths)

    def nx(frac):
        target = total * frac
        i = int(np.searchsorted(cumul, target))
        return int(lengths[i]), i + 1

    n50, l50 = nx(0.5)
    n90, l90 = nx(0.9)
    gc = sum(
        gc_content(s) * len(s) for s in records.values()
    ) / max(total, 1)
    return {
        "n_contigs": int(lengths.size),
        "total_length": total,
        "max_length": int(lengths[0]),
        "min_length": int(lengths[-1]),
        "mean_length": float(lengths.mean()),
        "median_length": float(np.median(lengths)),
        "n50": n50,
        "l50": l50,
        "n90": n90,
        "l90": l90,
        "gc_content": float(gc),
    }


_ROWS = [
    ("Contigs", "n_contigs", "{:,}"),
    ("Total length", "total_length", "{:,}"),
    ("Longest contig", "max_length", "{:,}"),
    ("Shortest contig", "min_length", "{:,}"),
    ("Mean length", "mean_length", "{:,.0f}"),
    ("Median length", "median_length", "{:,.0f}"),
    ("N50", "n50", "{:,}"),
    ("L50", "l50", "{:,}"),
    ("N90", "n90", "{:,}"),
    ("L90", "l90", "{:,}"),
    ("GC content", "gc_content", "{:.2%}"),
]


def format_stats_table(stats: dict, label: str = "Assembly") -> str:
    lines = [f"{label}", "-" * max(len(label), 24)]
    for title, key, fmt in _ROWS:
        lines.append(f"{title:<18}{fmt.format(stats[key])}")
    return "\n".join(lines)


def format_comparison_table(
    stats_list: list[dict], labels: list[str]
) -> str:
    """Side-by-side comparison (reference assembly_stats.py comparison)."""
    width = 16
    head = f"{'Metric':<18}" + "".join(f"{lb:>{width}}" for lb in labels)
    lines = [head, "-" * len(head)]
    for title, key, fmt in _ROWS:
        row = f"{title:<18}" + "".join(
            f"{fmt.format(s[key]):>{width}}" for s in stats_list
        )
        lines.append(row)
    return "\n".join(lines)


def print_assembly_stats(fasta_path, label: str = "Assembly") -> dict:
    stats = compute_assembly_stats(fasta_path)
    print(format_stats_table(stats, f"{label}: {pathlib.Path(fasta_path).name}"))
    return stats


def compare_assemblies(paths: list, labels: list[str] | None = None) -> None:
    labels = labels or [pathlib.Path(p).stem for p in paths]
    stats = [compute_assembly_stats(p) for p in paths]
    print(format_comparison_table(stats, labels))
