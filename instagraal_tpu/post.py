"""Post-processing: liftover of Hi-C pairs onto the polished assembly.

Equivalent of reference post.py (1601 LoC), with the per-line Python
parsing replaced by chunked pandas/NumPy passes (the reference streams
the pairs file 4-5 times line by line — its dominant cost, SURVEY.md §3.5)
and cooler.zoomify/balance replaced by our own aggregation + ICE
implementation (cooler is not available in this environment).

Outputs of run_post (reference post.py:1439-1601):
  <name>_lifted.pairs.gz        pairs remapped to new-assembly coordinates
  <name>_contigs.cool           original pairs, contig-level bins in
                                new-assembly order
  <name>_scaffolds.cool         lifted pairs, one bin per scaffold
  <name>_scaffolds_binned.mcool lifted pairs at fixed resolutions (ICE
                                balanced)
  <name>_ps_curves.png          P(s) curves original vs new
  *_hic_map PNGs
"""

from __future__ import annotations

import gzip
import pathlib

import numpy as np
import pandas as pd

from .io.cool import write_cool, _write_cool_group
from .io.pairs import read_pairs_header
from .log import logger
from .polish import parse_info_frags

DEFAULT_JUNCTION_LEN = 6

# log-spaced genomic-distance breaks for P(s) binning. The reference
# hardcodes a ~400-entry table (post.py:444-863); we generate an
# equivalent log-spaced scheme.
PS_BREAK_POS = np.unique(
    np.round(10 ** np.arange(0.0, 8.3, 0.05)).astype(np.int64)
)
PS_BINWIDTH = np.diff(np.append(PS_BREAK_POS, PS_BREAK_POS[-1] * 2))


# ---------------------------------------------------------------------------
# New-assembly bins + liftover
# ---------------------------------------------------------------------------


def build_new_bins(
    new_scaffolds: dict, junction_len: int = DEFAULT_JUNCTION_LEN
) -> pd.DataFrame:
    """Fragment bins of the new assembly (reference post.py:73-135).

    Fragments are laid out sequentially per scaffold with a junction gap
    whenever the source contig changes (matching polish.write_fasta).
    """
    rows = []
    for scaffold, fragments in new_scaffolds.items():
        cursor = 0
        prev_contig = None
        for init_contig, _fid, orig_start, orig_end, ori in fragments:
            if junction_len and prev_contig not in (None, init_contig):
                cursor += junction_len
            rows.append(
                (
                    scaffold,
                    cursor,
                    cursor + (orig_end - orig_start),
                    init_contig,
                    orig_start,
                    orig_end,
                    ori,
                )
            )
            cursor += orig_end - orig_start
            prev_contig = init_contig
    return pd.DataFrame(
        rows,
        columns=[
            "chrom", "start", "end",
            "_orig_chrom", "_orig_start", "_orig_end", "_orientation",
        ],
    )


class LiftoverIndex:
    """Vectorized original-assembly -> new-assembly coordinate mapping
    (reference post.py:143-240, batched)."""

    def __init__(self, bins_extended: pd.DataFrame):
        self.bins = bins_extended
        self.scaffolds = list(dict.fromkeys(bins_extended["chrom"]))
        self._by_contig: dict[str, dict[str, np.ndarray]] = {}
        for contig, grp in bins_extended.groupby("_orig_chrom", sort=False):
            g = grp.sort_values("_orig_start")
            self._by_contig[contig] = {
                "orig_starts": g["_orig_start"].to_numpy(np.int64),
                "orig_ends": g["_orig_end"].to_numpy(np.int64),
                "bin_ids": g.index.to_numpy(np.int64),
                "new_chroms": g["chrom"].to_numpy(),
                "new_starts": g["start"].to_numpy(np.int64),
                "orientations": g["_orientation"].to_numpy(np.int64),
            }

    def lift(
        self, chroms: np.ndarray, pos_1based: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch liftover. Returns (new_chrom names (object, '' if
        unmapped), new 1-based positions, fragment bin ids); -1 where a
        position cannot be lifted."""
        n = len(chroms)
        out_chrom = np.full(n, "", dtype=object)
        out_pos = np.full(n, -1, dtype=np.int64)
        out_bin = np.full(n, -1, dtype=np.int64)
        order = np.argsort(chroms, kind="stable")
        sc = chroms[order]
        bounds = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        bounds = np.r_[bounds, n]
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            contig = sc[b0]
            entry = self._by_contig.get(contig)
            if entry is None:
                continue
            idx = order[b0:b1]
            pos0 = pos_1based[idx] - 1
            i = (
                np.searchsorted(entry["orig_starts"], pos0, side="right")
                - 1
            )
            ok = (i >= 0) & (pos0 < entry["orig_ends"][np.clip(i, 0, None)])
            sel = idx[ok]
            ii = i[ok]
            offset = pos0[ok] - entry["orig_starts"][ii]
            frag_len = entry["orig_ends"][ii] - entry["orig_starts"][ii]
            fwd = entry["orientations"][ii] == 1
            new_pos0 = entry["new_starts"][ii] + np.where(
                fwd, offset, frag_len - 1 - offset
            )
            out_chrom[sel] = entry["new_chroms"][ii]
            out_pos[sel] = new_pos0 + 1
            out_bin[sel] = entry["bin_ids"][ii]
        return out_chrom, out_pos, out_bin


def _iter_pairs_chunks(pairs_path, chunksize=1_000_000):
    """Yield raw string-dtype row chunks + the 4 coordinate column idxs."""
    _, cols = read_pairs_header(pairs_path)
    reader = pd.read_csv(
        pairs_path,
        sep="\t",
        comment="#",
        header=None,
        dtype=str,
        chunksize=chunksize,
        engine="c",
    )
    for chunk in reader:
        yield chunk, cols


def _aggregate_pixel_keys(keys: list[np.ndarray], n: int) -> pd.DataFrame:
    if not keys or sum(len(k) for k in keys) == 0:
        return pd.DataFrame(
            {
                "bin1_id": np.array([], dtype=np.int32),
                "bin2_id": np.array([], dtype=np.int32),
                "count": np.array([], dtype=np.int32),
            }
        )
    allk = np.concatenate(keys)
    uniq, counts = np.unique(allk, return_counts=True)
    return pd.DataFrame(
        {
            "bin1_id": (uniq // n).astype(np.int32),
            "bin2_id": (uniq % n).astype(np.int32),
            "count": counts.astype(np.int32),
        }
    )


def pairs_to_lifted_pixels(
    pairs_path, index: LiftoverIndex
) -> tuple[pd.DataFrame, int]:
    """Remap pairs to new-assembly fragment bins (reference post.py:248)."""
    n_bins = len(index.bins)
    keys = []
    total = 0
    for chunk, cols in _iter_pairs_chunks(pairs_path):
        chr1 = chunk.iloc[:, cols["chr1"]].to_numpy(dtype=object)
        pos1 = pd.to_numeric(
            chunk.iloc[:, cols["pos1"]], errors="coerce"
        ).fillna(-1).to_numpy(np.int64)
        chr2 = chunk.iloc[:, cols["chr2"]].to_numpy(dtype=object)
        pos2 = pd.to_numeric(
            chunk.iloc[:, cols["pos2"]], errors="coerce"
        ).fillna(-1).to_numpy(np.int64)
        _, _, b1 = index.lift(chr1, pos1)
        _, _, b2 = index.lift(chr2, pos2)
        ok = (b1 >= 0) & (b2 >= 0)
        total += int(ok.sum())
        lo = np.minimum(b1[ok], b2[ok])
        hi = np.maximum(b1[ok], b2[ok])
        keys.append(lo * n_bins + hi)
    return _aggregate_pixel_keys(keys, n_bins), total


def write_lifted_pairs(
    pairs_path, index: LiftoverIndex, bins_extended, output_path
) -> tuple[int, int]:
    """Write a pairs file in new-assembly coordinates, updating the
    chromsize header lines (reference post.py:332-436)."""
    new_chromsizes: dict[str, int] = {}
    for row in bins_extended.itertuples(index=False):
        new_chromsizes[row.chrom] = max(
            new_chromsizes.get(row.chrom, 0), int(row.end)
        )
    header, cols = read_pairs_header(pairs_path)
    format_line = "## pairs format v1.0"
    columns_line = "#columns: readID chr1 pos1 chr2 pos2 strand1 strand2"
    other = []
    for line in header:
        if line.startswith("## "):
            format_line = line
        elif line.startswith("#columns:"):
            columns_line = line
        elif line.startswith(("#chromsize:", "#chromosomes:", "#sorted:")):
            continue
        else:
            other.append(line)

    total = 0
    remapped = 0
    with gzip.open(output_path, "wt") as out:
        out.write(format_line + "\n")
        out.write("#sorted: none\n")
        for line in other:
            out.write(line + "\n")
        out.write(f"#chromosomes: {' '.join(new_chromsizes)}\n")
        for chrom, size in new_chromsizes.items():
            out.write(f"#chromsize: {chrom} {size}\n")
        out.write(columns_line + "\n")
        for chunk, ccols in _iter_pairs_chunks(pairs_path):
            total += len(chunk)
            chr1 = chunk.iloc[:, ccols["chr1"]].to_numpy(dtype=object)
            pos1 = pd.to_numeric(
                chunk.iloc[:, ccols["pos1"]], errors="coerce"
            ).fillna(-1).to_numpy(np.int64)
            chr2 = chunk.iloc[:, ccols["chr2"]].to_numpy(dtype=object)
            pos2 = pd.to_numeric(
                chunk.iloc[:, ccols["pos2"]], errors="coerce"
            ).fillna(-1).to_numpy(np.int64)
            nc1, np1, _ = index.lift(chr1, pos1)
            nc2, np2, _ = index.lift(chr2, pos2)
            ok = (np1 > 0) & (np2 > 0)
            remapped += int(ok.sum())
            sub = chunk.loc[ok].copy()
            sub.iloc[:, ccols["chr1"]] = nc1[ok]
            sub.iloc[:, ccols["pos1"]] = np1[ok].astype(str)
            sub.iloc[:, ccols["chr2"]] = nc2[ok]
            sub.iloc[:, ccols["pos2"]] = np2[ok].astype(str)
            sub.to_csv(out, sep="\t", header=False, index=False)
    return total, remapped


# ---------------------------------------------------------------------------
# P(s) curves
# ---------------------------------------------------------------------------


def compute_ps(pairs_path) -> pd.DataFrame:
    """Normalised P(s) per strand combination (reference post.py:866-941)."""
    dist_parts = []
    strand_parts = []
    _, cols = read_pairs_header(pairs_path)
    # strand columns default to 5/6 in 4DN order
    header, _ = read_pairs_header(pairs_path)
    s1_idx, s2_idx = 5, 6
    for line in header:
        if line.startswith("#columns:"):
            names = line.split()[1:]
            if "strand1" in names:
                s1_idx = names.index("strand1")
            if "strand2" in names:
                s2_idx = names.index("strand2")
    for chunk, ccols in _iter_pairs_chunks(pairs_path):
        chr1 = chunk.iloc[:, ccols["chr1"]].to_numpy(dtype=object)
        chr2 = chunk.iloc[:, ccols["chr2"]].to_numpy(dtype=object)
        same = chr1 == chr2
        if not same.any():
            continue
        pos1 = pd.to_numeric(
            chunk.iloc[:, ccols["pos1"]], errors="coerce"
        ).fillna(0).to_numpy(np.int64)
        pos2 = pd.to_numeric(
            chunk.iloc[:, ccols["pos2"]], errors="coerce"
        ).fillna(0).to_numpy(np.int64)
        dist_parts.append(np.abs(pos2 - pos1)[same])
        if s1_idx < chunk.shape[1] and s2_idx < chunk.shape[1]:
            strand_parts.append(
                (
                    chunk.iloc[:, s1_idx].astype(str)
                    + chunk.iloc[:, s2_idx].astype(str)
                ).to_numpy(dtype=object)[same]
            )
        else:
            strand_parts.append(np.full(int(same.sum()), "++", dtype=object))

    if not dist_parts:
        return pd.DataFrame(
            columns=["binned_distance", "strand_combo", "norm_p"]
        )
    dist = np.concatenate(dist_parts)
    strands = np.concatenate(strand_parts)
    idx = np.clip(
        np.searchsorted(PS_BREAK_POS, dist, side="right") - 1,
        0,
        len(PS_BREAK_POS) - 2,
    )
    df = pd.DataFrame(
        {
            "binned_distance": PS_BREAK_POS[idx],
            "strand_combo": strands,
            "binwidth": PS_BINWIDTH[idx],
        }
    )
    grouped = (
        df.groupby(["strand_combo", "binned_distance", "binwidth"])
        .size()
        .reset_index(name="ninter")
    )
    total = grouped.groupby("strand_combo")["ninter"].transform("sum")
    grouped["norm_p"] = grouped["ninter"] / total / grouped["binwidth"]
    return grouped[["binned_distance", "strand_combo", "norm_p"]]


def plot_ps_curves(original_pairs, new_pairs, output_path) -> None:
    """Side-by-side log-log P(s) plots (reference post.py:944-993)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = {"++": "C0", "--": "C1", "+-": "C2", "-+": "C3"}
    fig, axes = plt.subplots(1, 2, figsize=(10, 4), sharey=True)
    for ax, path, title in zip(
        axes, [original_pairs, new_pairs], ["Original", "New assembly"]
    ):
        df = compute_ps(path)
        if df.empty:
            ax.set_title(f"{title} (no data)")
            continue
        for strand, grp in df.groupby("strand_combo"):
            g = grp.sort_values("binned_distance")
            ax.plot(
                g["binned_distance"],
                g["norm_p"],
                label=strand,
                color=colors.get(strand),
                linewidth=1.5,
                alpha=0.85,
            )
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_xlabel("Genomic distance (bp)")
        ax.set_ylabel("P(s) / bp")
        ax.set_title(title)
        ax.legend(title="Strands", fontsize=8)
    fig.suptitle("P(s) - contact probability vs. genomic distance", y=1.01)
    fig.tight_layout()
    fig.savefig(str(output_path), dpi=150, bbox_inches="tight")
    plt.close(fig)


# ---------------------------------------------------------------------------
# cool builders
# ---------------------------------------------------------------------------


def read_chromsizes_from_pairs(pairs_path) -> dict[str, int]:
    header, _ = read_pairs_header(pairs_path)
    sizes = {}
    for line in header:
        if line.startswith("#chromsize:"):
            parts = line.split()
            if len(parts) >= 3:
                sizes[parts[1]] = int(parts[2])
    return sizes


def build_contig_ordered_bins(
    chromsizes: dict[str, int], new_scaffolds: dict
) -> pd.DataFrame:
    """One bin per original contig, ordered by new-assembly appearance
    (reference post.py:1123-1159)."""
    seen = set()
    ordered = []
    for fragments in new_scaffolds.values():
        for entry in fragments:
            contig = entry[0]
            if contig not in seen and contig in chromsizes:
                seen.add(contig)
                ordered.append(contig)
    for contig in chromsizes:
        if contig not in seen:
            ordered.append(contig)
    return pd.DataFrame(
        {
            "chrom": ordered,
            "start": 0,
            "end": [chromsizes[c] for c in ordered],
        }
    )


def pairs_to_contig_pixels(
    pairs_path, contig_bins: pd.DataFrame
) -> tuple[pd.DataFrame, int]:
    """Contig-level binning: chrom -> bin, no position arithmetic
    (reference post.py:1162-1227)."""
    chrom_to_bin = {c: i for i, c in enumerate(contig_bins["chrom"])}
    n = len(contig_bins)
    keys = []
    total = 0
    for chunk, cols in _iter_pairs_chunks(pairs_path):
        chr1 = chunk.iloc[:, cols["chr1"]].map(chrom_to_bin)
        chr2 = chunk.iloc[:, cols["chr2"]].map(chrom_to_bin)
        ok = chr1.notna() & chr2.notna()
        b1 = chr1[ok].to_numpy(np.int64)
        b2 = chr2[ok].to_numpy(np.int64)
        total += int(ok.sum())
        keys.append(np.minimum(b1, b2) * n + np.maximum(b1, b2))
    return _aggregate_pixel_keys(keys, n), total


def scaffold_bins_from_extended(bins_extended: pd.DataFrame) -> pd.DataFrame:
    scaffolds = list(dict.fromkeys(bins_extended["chrom"]))
    end = bins_extended.groupby("chrom", sort=False)["end"].max()
    return pd.DataFrame(
        {
            "chrom": scaffolds,
            "start": 0,
            "end": [int(end[s]) for s in scaffolds],
        }
    )


def fragment_pixels_to_scaffold_pixels(
    fragment_pixels, bins_extended, scaffold_bins
) -> pd.DataFrame:
    """Aggregate fragment pixels to scaffold pixels
    (reference post.py:1255-1305)."""
    if fragment_pixels.empty:
        return pd.DataFrame(columns=["bin1_id", "bin2_id", "count"])
    scaffold_idx = {c: i for i, c in enumerate(scaffold_bins["chrom"])}
    frag2scaf = (
        bins_extended["chrom"].map(scaffold_idx).to_numpy(np.int64)
    )
    b1 = frag2scaf[fragment_pixels["bin1_id"].to_numpy()]
    b2 = frag2scaf[fragment_pixels["bin2_id"].to_numpy()]
    out = pd.DataFrame(
        {
            "bin1_id": np.minimum(b1, b2).astype(np.int32),
            "bin2_id": np.maximum(b1, b2).astype(np.int32),
            "count": fragment_pixels["count"].to_numpy(),
        }
    )
    out = out.groupby(["bin1_id", "bin2_id"], as_index=False)["count"].sum()
    out["count"] = out["count"].astype(np.int32)
    return out.sort_values(["bin1_id", "bin2_id"]).reset_index(drop=True)


def binnify(chromsizes: dict[str, int], binsize: int) -> pd.DataFrame:
    """Fixed-size bins, last bin truncated (reference post.py:1313-1335)."""
    rows = []
    for chrom, length in chromsizes.items():
        starts = np.arange(0, length, binsize)
        for s in starts:
            rows.append((chrom, int(s), int(min(s + binsize, length))))
    return pd.DataFrame(rows, columns=["chrom", "start", "end"])


def pairs_to_fixed_bin_pixels(
    pairs_path, index: LiftoverIndex, fixed_bins: pd.DataFrame
) -> tuple[pd.DataFrame, int]:
    """Lift pairs and bin at fixed size (reference post.py:1338-1431)."""
    chrom_lookup: dict[str, tuple[np.ndarray, int]] = {}
    offset = 0
    for chrom, grp in fixed_bins.groupby("chrom", sort=False):
        starts = grp["start"].to_numpy(np.int64)
        chrom_lookup[chrom] = (starts, offset)
        offset += len(starts)
    n = len(fixed_bins)

    def to_bins(chroms, pos_1based):
        out = np.full(len(chroms), -1, dtype=np.int64)
        for chrom, (starts, off) in chrom_lookup.items():
            m = chroms == chrom
            if not m.any():
                continue
            i = np.searchsorted(starts, pos_1based[m] - 1, side="right") - 1
            ok = i >= 0
            sel = np.flatnonzero(m)[ok]
            out[sel] = i[ok] + off
        return out

    keys = []
    total = 0
    for chunk, cols in _iter_pairs_chunks(pairs_path):
        chr1 = chunk.iloc[:, cols["chr1"]].to_numpy(dtype=object)
        pos1 = pd.to_numeric(
            chunk.iloc[:, cols["pos1"]], errors="coerce"
        ).fillna(-1).to_numpy(np.int64)
        chr2 = chunk.iloc[:, cols["chr2"]].to_numpy(dtype=object)
        pos2 = pd.to_numeric(
            chunk.iloc[:, cols["pos2"]], errors="coerce"
        ).fillna(-1).to_numpy(np.int64)
        nc1, np1, _ = index.lift(chr1, pos1)
        nc2, np2, _ = index.lift(chr2, pos2)
        b1 = to_bins(nc1, np1)
        b2 = to_bins(nc2, np2)
        ok = (b1 >= 0) & (b2 >= 0) & (np1 > 0) & (np2 > 0)
        total += int(ok.sum())
        keys.append(
            np.minimum(b1[ok], b2[ok]) * n + np.maximum(b1[ok], b2[ok])
        )
    return _aggregate_pixel_keys(keys, n), total


# ---------------------------------------------------------------------------
# mcool: zoomify + ICE balancing (cooler-free)
# ---------------------------------------------------------------------------


def ice_balance(
    bins: pd.DataFrame,
    pixels: pd.DataFrame,
    max_iters: int = 200,
    mad_max: float = 5.0,
    tol: float = 1e-5,
) -> np.ndarray:
    """Iterative correction (ICE) weights for a symmetric-upper matrix.

    Replaces cooler.balance_cooler (reference post.py:1093-1096): rows
    with coverage below median - mad_max*MAD (log space) are masked;
    weights converge so the balanced matrix has uniform row sums.
    """
    n = len(bins)
    if pixels.empty:
        return np.full(n, np.nan)
    b1 = pixels["bin1_id"].to_numpy()
    b2 = pixels["bin2_id"].to_numpy()
    c = pixels["count"].to_numpy(np.float64)

    coverage = np.zeros(n)
    np.add.at(coverage, b1, c)
    off = b1 != b2
    np.add.at(coverage, b2[off], c[off])
    nz = coverage > 0
    logc = np.log(coverage[nz])
    med = np.median(logc)
    mad = np.median(np.abs(logc - med)) + 1e-12
    mask = nz.copy()
    mask[nz] = logc > med - mad_max * mad * 1.4826

    w = np.ones(n)
    w[~mask] = 0.0
    for _ in range(max_iters):
        s = np.zeros(n)
        v = c * w[b1] * w[b2]
        np.add.at(s, b1, v)
        np.add.at(s, b2[off], v[off])
        sm = s[mask]
        mean_s = sm.mean() if sm.size else 1.0
        adj = np.ones(n)
        adj[mask] = np.where(sm > 0, sm / mean_s, 1.0)
        w = w / np.sqrt(adj)
        var = (sm / mean_s - 1) if sm.size else np.array([0.0])
        if float(np.abs(var).max()) < tol:
            break
    # normalize like cooler: scale so balanced counts ~ 1-ish
    scale = np.sqrt(1.0 / max(np.mean(c), 1e-12))
    w = w * scale
    w[~mask] = np.nan
    return w


def coarsen_pixels(
    fine_bins: pd.DataFrame, pixels: pd.DataFrame, coarse_bins: pd.DataFrame
) -> pd.DataFrame:
    """Aggregate base-resolution pixels onto coarser fixed bins."""
    # map fine bin -> coarse bin by (chrom, start)
    coarse_lookup: dict[str, tuple[np.ndarray, int]] = {}
    offset = 0
    for chrom, grp in coarse_bins.groupby("chrom", sort=False):
        coarse_lookup[chrom] = (grp["start"].to_numpy(np.int64), offset)
        offset += len(grp)
    fine2coarse = np.full(len(fine_bins), -1, dtype=np.int64)
    for chrom, grp in fine_bins.groupby("chrom", sort=False):
        starts, off = coarse_lookup[chrom]
        i = np.searchsorted(
            starts, grp["start"].to_numpy(np.int64), side="right"
        ) - 1
        fine2coarse[grp.index.to_numpy()] = i + off
    b1 = fine2coarse[pixels["bin1_id"].to_numpy()]
    b2 = fine2coarse[pixels["bin2_id"].to_numpy()]
    out = pd.DataFrame(
        {
            "bin1_id": np.minimum(b1, b2),
            "bin2_id": np.maximum(b1, b2),
            "count": pixels["count"].to_numpy(),
        }
    )
    out = out.groupby(["bin1_id", "bin2_id"], as_index=False)["count"].sum()
    return out.sort_values(["bin1_id", "bin2_id"]).reset_index(drop=True)


def write_mcool_with_balance(
    mcool_path,
    base_bins: pd.DataFrame,
    base_pixels: pd.DataFrame,
    chromsizes: dict[str, int],
    resolutions: list[int],
    balance: bool = True,
    balance_args: dict | None = None,
) -> None:
    """Write an .mcool with one group per resolution + ICE weights."""
    import h5py

    base_res = min(resolutions)
    with h5py.File(mcool_path, "w") as f:
        f.attrs["format"] = "HDF5::MCOOL"
        f.attrs["format-version"] = 2
        f.create_group("resolutions")
    for res in sorted(resolutions):
        if res == base_res:
            bins, pixels = base_bins, base_pixels
        else:
            bins = binnify(chromsizes, res)
            pixels = coarsen_pixels(base_bins, base_pixels, bins)
        _write_cool_group(
            mcool_path, f"/resolutions/{res}", bins, pixels, chromsizes,
            None, res,
        )
        if balance:
            w = ice_balance(bins, pixels, **(balance_args or {}))
            with h5py.File(mcool_path, "a") as f:
                grp = f[f"/resolutions/{res}/bins"]
                if "weight" in grp:
                    del grp["weight"]
                grp.create_dataset("weight", data=w)


# ---------------------------------------------------------------------------
# Main pipeline
# ---------------------------------------------------------------------------


def run_post(
    pairs,
    new_info_frags,
    output_dir,
    resolutions="10000",
    cool_name=None,
    junction_len: int = DEFAULT_JUNCTION_LEN,
    balance: bool = True,
    balance_args: dict | None = None,
    plot: bool = True,
) -> dict:
    """Full post pipeline (reference post.py:1439-1601)."""
    from .pre import plot_hic_map

    pairs = pathlib.Path(pairs)
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if isinstance(resolutions, str):
        resolutions = [int(r) for r in resolutions.split(",") if r.strip()]
    resolutions = list(resolutions)
    min_res = min(resolutions)

    if cool_name is None:
        stem = pairs.name
        for _ in range(2):
            p = pathlib.Path(stem)
            if not p.suffix:
                break
            stem = p.stem
        cool_name = stem

    logger.info("[1/6] Parsing new_info_frags: %s", new_info_frags)
    new_scaffolds = parse_info_frags(str(new_info_frags))

    logger.info("[2/6] Building fragment bins and liftover index")
    bins_extended = build_new_bins(new_scaffolds, junction_len)
    index = LiftoverIndex(bins_extended)

    logger.info("[3/6] Remapping pairs: %s", pairs)
    fragment_pixels, total = pairs_to_lifted_pixels(pairs, index)
    pairs_out = output_dir / f"{cool_name}_lifted.pairs.gz"
    total_p, remapped = write_lifted_pairs(
        pairs, index, bins_extended, pairs_out
    )
    logger.info("      %d/%d pairs remapped", remapped, total_p)
    if plot:
        plot_ps_curves(
            pairs, pairs_out, output_dir / f"{cool_name}_ps_curves.png"
        )

    logger.info("[4/6] Contig-ordered cool")
    chromsizes = read_chromsizes_from_pairs(pairs)
    contigs_cool = None
    if chromsizes:
        contig_bins = build_contig_ordered_bins(chromsizes, new_scaffolds)
        contig_pixels, _ = pairs_to_contig_pixels(pairs, contig_bins)
        contigs_cool = output_dir / f"{cool_name}_contigs.cool"
        write_cool(contigs_cool, contig_bins, contig_pixels, chromsizes)
        if plot:
            plot_hic_map(
                contigs_cool,
                output_dir / f"{cool_name}_contigs.png",
                title=f"{cool_name} - contigs (new-assembly order)",
            )

    logger.info("[5/6] Scaffold-level cool")
    scaffold_bins = scaffold_bins_from_extended(bins_extended)
    scaffold_pixels = fragment_pixels_to_scaffold_pixels(
        fragment_pixels, bins_extended, scaffold_bins
    )
    scaffold_sizes = {
        r.chrom: int(r.end) for r in scaffold_bins.itertuples(index=False)
    }
    scaffolds_cool = output_dir / f"{cool_name}_scaffolds.cool"
    write_cool(scaffolds_cool, scaffold_bins, scaffold_pixels, scaffold_sizes)
    if plot:
        plot_hic_map(
            scaffolds_cool,
            output_dir / f"{cool_name}_scaffolds.png",
            title=f"{cool_name} - scaffolds (post-assembly)",
        )

    logger.info("[6/6] Fixed-bin mcool at %s", resolutions)
    fixed_bins = binnify(scaffold_sizes, min_res)
    fixed_pixels, fixed_total = pairs_to_fixed_bin_pixels(
        pairs, index, fixed_bins
    )
    mcool_path = output_dir / f"{cool_name}_scaffolds_binned.mcool"
    write_mcool_with_balance(
        mcool_path,
        fixed_bins,
        fixed_pixels,
        scaffold_sizes,
        resolutions,
        balance=balance,
        balance_args=balance_args,
    )
    logger.info("Done.")
    return {
        "n_scaffolds": len(scaffold_bins),
        "n_fragments": len(bins_extended),
        "remapped": remapped,
        "total": total_p,
        "mcool": mcool_path,
        "scaffolds_cool": scaffolds_cool,
        "contigs_cool": contigs_cool,
        "lifted_pairs": pairs_out,
    }
