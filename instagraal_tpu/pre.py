"""Pre-processing pipeline: FASTA + Hi-C pairs -> instaGRAAL input files.

TPU-framework equivalent of reference pre.py:345-427 (`run_pre`). Outputs:
fragments_list.txt, info_contigs.txt, abs_fragments_contacts_weighted.txt,
a .cool contact map and a Hi-C heatmap PNG.
"""

from __future__ import annotations

import pathlib

import numpy as np

from .io import digest, fasta as fio, formats, pairs as pio
from .io.cool import write_cool
from .log import logger


def plot_hic_map(
    cool_path: pathlib.Path,
    output_path: pathlib.Path,
    title: str = "",
    max_display_bins: int = 1000,
) -> None:
    """Genome-wide Hi-C heatmap from a .cool file (reference pre.py:299-337).

    Aggregates fragment-level pixels into a bounded display matrix, log1p
    colour scale clipped at the 98th percentile.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .io.cool import read_cool_pixels

    bins, pixels, attrs = read_cool_pixels(cool_path)
    n_bins = int(attrs.get("nbins", len(bins)))
    agg = max(1, (n_bins + max_display_bins - 1) // max_display_bins)
    display_n = (n_bins + agg - 1) // agg

    mat = np.zeros((display_n, display_n), dtype=np.float32)
    b1 = (pixels["bin1_id"].to_numpy() // agg).astype(np.int64)
    b2 = (pixels["bin2_id"].to_numpy() // agg).astype(np.int64)
    c = pixels["count"].to_numpy().astype(np.float32)
    np.add.at(mat, (b1, b2), c)
    off = b1 != b2
    np.add.at(mat, (b2[off], b1[off]), c[off])

    mat = np.log1p(mat)
    nz = mat[mat > 0]
    vmax = float(np.percentile(nz, 98)) if nz.size else 1.0

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.matshow(mat, cmap="YlOrRd", vmin=0, vmax=vmax, aspect="auto", origin="upper")
    ax.set_title(title or pathlib.Path(cool_path).stem, pad=10)
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(str(output_path), dpi=150, bbox_inches="tight")
    plt.close(fig)


def run_pre(
    fasta: pathlib.Path,
    pairs: pathlib.Path,
    enzymes: list[str],
    output_dir: pathlib.Path,
    cool_name: str | None = None,
    plot: bool = True,
) -> dict:
    """Run the full pre-processing pipeline; returns summary stats."""
    fasta = pathlib.Path(fasta)
    pairs = pathlib.Path(pairs)
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    logger.info("[1/5] Opening genome: %s", fasta)
    records = fio.read_fasta(fasta)

    logger.info("[2/5] Digesting genome with enzyme(s): %s", ", ".join(enzymes))
    bins = digest.digest_genome(records, enzymes)
    n_frags = len(bins)
    logger.info("      -> %d restriction fragments", n_frags)

    logger.info("[3/5] Computing GC content per fragment")
    bins = digest.add_gc_content(bins, records)

    logger.info("[4/5] Binning pairs into fragment contact matrix: %s", pairs)
    pixels, total = pio.pairs_to_pixels(pairs, bins)
    logger.info("      -> %d valid pairs, %d non-zero pixels", total, len(pixels))

    if cool_name is None:
        stem = pairs.name
        for _ in range(2):
            p = pathlib.Path(stem)
            if not p.suffix:
                break
            stem = p.stem
        cool_name = stem
    cool_path = output_dir / f"{cool_name}.cool"

    logger.info("[5/5] Writing outputs to %s", output_dir)
    chromsizes = {c: len(s) for c, s in records.items()}
    write_cool(
        cool_path,
        bins[["chrom", "start", "end"]],
        pixels,
        chromsizes=chromsizes,
        assembly=fasta.stem.removesuffix(".fa").removesuffix(".fasta"),
    )
    if plot:
        plot_hic_map(
            cool_path,
            output_dir / f"{cool_name}_hic_map.png",
            title=f"{cool_name} - pre-assembly Hi-C map",
        )

    formats.write_fragments_list(bins, output_dir / "fragments_list.txt")
    formats.write_info_contigs(bins, records, output_dir / "info_contigs.txt")
    formats.write_abs_contacts(
        pixels, n_frags, output_dir / "abs_fragments_contacts_weighted.txt"
    )
    return {"n_frags": n_frags, "n_pairs": total, "nnz": len(pixels)}
