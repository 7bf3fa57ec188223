"""Readers/writers for the instaGRAAL text file formats.

File formats (all tab-separated), byte-compatible with the reference:

fragments_list.txt (reference pre.py:244-259)::

    id  chrom  start_pos  end_pos  size  gc_content
    # id resets to 1 for every new contig

info_contigs.txt (reference pre.py:262-275)::

    contig  length  n_frags  cumul_length

abs_fragments_contacts_weighted.txt (reference pre.py:279-291)::

    <nfrags>  <nfrags>  <n_pixels>      <- header line
    bin1_id  bin2_id  count             <- 0-based upper-triangular rows

Pyramid-internal files use the extended fragment list with
accu_frag/frag_start/frag_end (+ sub_frag columns at level>0) and the
"id_frag_a id_frag_b n_contact" COO header — see instagraal_tpu.pyramid.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pandas as pd


def write_fragments_list(bins: pd.DataFrame, path: str | pathlib.Path) -> None:
    with open(path, "w") as fh:
        fh.write("id\tchrom\tstart_pos\tend_pos\tsize\tgc_content\n")
        for _chrom, grp in bins.groupby("chrom", sort=False):
            for i, row in enumerate(grp.itertuples(index=False), start=1):
                fh.write(
                    f"{i}\t{row.chrom}\t{row.start}\t{row.end}\t"
                    f"{row.end - row.start}\t{row.gc_content}\n"
                )


def write_info_contigs(
    bins: pd.DataFrame,
    fasta_records: dict[str, str],
    path: str | pathlib.Path,
) -> None:
    with open(path, "w") as fh:
        fh.write("contig\tlength\tn_frags\tcumul_length\n")
        cumul = 0
        for chrom, grp in bins.groupby("chrom", sort=False):
            fh.write(f"{chrom}\t{len(fasta_records[chrom])}\t{len(grp)}\t{cumul}\n")
            cumul += len(grp)


def write_abs_contacts(
    pixels: pd.DataFrame, n_frags: int, path: str | pathlib.Path
) -> None:
    with open(path, "w") as fh:
        fh.write(f"{n_frags}\t{n_frags}\t{len(pixels)}\n")
        for row in pixels.itertuples(index=False):
            fh.write(f"{row.bin1_id}\t{row.bin2_id}\t{row.count}\n")


def read_fragments_list(path: str | pathlib.Path) -> pd.DataFrame:
    """Read either the pre-level (6-col) or pyramid-level (9/11-col) format."""
    return pd.read_csv(path, sep="\t")


def read_info_contigs(path: str | pathlib.Path) -> pd.DataFrame:
    return pd.read_csv(path, sep="\t")


def read_abs_contacts(
    path: str | pathlib.Path,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read an abs contacts file (either header flavour) into COO arrays.

    Returns (rows, cols, counts) int64 arrays. Works for both the pre
    output ("nfrags nfrags npix" header) and the pyramid internal files
    ("id_frag_a id_frag_b n_contact" header): both have exactly one header
    line followed by 3 integer columns.
    """
    dat = pd.read_csv(path, sep="\t", skiprows=1, header=None)
    if len(dat) == 0:
        z = np.array([], dtype=np.int64)
        return z, z.copy(), z.copy()
    arr = dat.to_numpy(dtype=np.int64)
    return arr[:, 0], arr[:, 1], arr[:, 2]
