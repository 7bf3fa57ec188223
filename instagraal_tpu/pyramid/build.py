"""Pyramid construction: filter pass + 3x binning per level, HDF5 cache.

Vectorized (pandas/NumPy) re-implementation of the reference's
line-by-line builders:

- build()                      <- reference pyramid_sparse.py:178-277
- remove_problematic_fragments <- reference pyramid_sparse.py:731-1029
- subsample_data_set           <- reference pyramid_sparse.py:468-724
- fill_sparse_pyramid_level    <- reference pyramid_sparse.py:331-396

File layout (identical to the reference so cached pyramids interoperate)::

    <out>/pyramids/pyramid_1_no_thresh/level_0/0_{contig_info,fragments_list,
                                                  abs_frag_contacts}.txt
    <out>/pyramids/pyramid_1_no_thresh/pyramid.hdf5
    <out>/pyramids/pyramid_<N>_thresh_auto/level_<i>/i_*.txt
                                          /level_<i>/i_sub_2_super_index_frag.txt
    <out>/pyramids/pyramid_<N>_thresh_auto/pyramid.hdf5

Known reference bug NOT reproduced: reference pyramid_sparse.py:679-683
consumes the contacts header and then also skips the first data line when
re-binning contacts for levels >= 2, silently dropping one pixel per
level. We keep every pixel.
"""

from __future__ import annotations

import os
import pathlib
import shutil

import h5py
import numpy as np
import pandas as pd
import scipy.sparse as sp

from ..log import logger

PYRAMID_SIZE = 9  # reference simu_single.py:541
PYRAMID_FACTOR = 3  # reference simu_single.py:542
THRESH_SHORT_BP = 50  # reference pyramid_sparse.py:808
THRESH_MAX_STDS = 50  # reference pyramid_sparse.py:775

FRAG_COLS_L0 = [
    "id", "chrom", "start_pos", "end_pos", "size", "gc_content",
    "accu_frag", "frag_start", "frag_end",
]
FRAG_COLS_SUB = [
    "id", "chrom", "start_pos", "end_pos", "size", "gc_content",
    "accu_frag", "init_frag_start", "init_frag_end",
    "sub_frag_start", "sub_frag_end",
]


# ---------------------------------------------------------------------------
# Text-file helpers
# ---------------------------------------------------------------------------


def _read_contig_info(path) -> pd.DataFrame:
    return pd.read_csv(path, sep="\t")


def _read_frag_list(path) -> pd.DataFrame:
    # round_trip: pandas' default float parser (xstrtod) can land one
    # ulp away from Python float(); the reference parses gc_content
    # with float(), and merged-gc byte-parity depends on reading the
    # exact same doubles back
    return pd.read_csv(path, sep="\t", float_precision="round_trip")


def _read_contacts(path) -> pd.DataFrame:
    df = pd.read_csv(path, sep="\t", skiprows=1, header=None)
    df.columns = ["fa", "fb", "nc"] if len(df.columns) == 3 else df.columns
    return df


def _write_contacts(df: pd.DataFrame, path) -> None:
    with open(path, "w") as fh:
        fh.write("id_frag_a\tid_frag_b\tn_contact\n")
        np.savetxt(
            fh,
            df[["fa", "fb", "nc"]].to_numpy(dtype=np.int64),
            fmt="%d",
            delimiter="\t",
        )


def _aggregate_coo(fa, fb, nc) -> pd.DataFrame:
    """Sort mates, aggregate duplicates, order by (fa, fb)."""
    lo = np.minimum(fa, fb)
    hi = np.maximum(fa, fb)
    df = pd.DataFrame({"fa": lo, "fb": hi, "nc": nc})
    out = df.groupby(["fa", "fb"], sort=True, as_index=False)["nc"].sum()
    return out


def init_frag_list(fragments_list, new_frag_list) -> int:
    """Extend the 6-col pre output with accu_frag/frag_start/frag_end.

    Mirrors reference pyramid_sparse.py:399-465; returns the fragment count.
    """
    df = pd.read_csv(
        fragments_list, sep="\t", float_precision="round_trip"
    )
    out = pd.DataFrame(
        {
            "id": df["id"],
            "chrom": df["chrom"],
            "start_pos": df["start_pos"],
            "end_pos": df["end_pos"],
            "size": df["size"],
            "gc_content": df["gc_content"].astype(float),
            "accu_frag": 1,
            "frag_start": df["id"],
            "frag_end": df["id"],
        }
    )
    out.to_csv(new_frag_list, sep="\t", index=False)
    return len(out)


def fill_sparse_pyramid_level(pyramid_handle, level, contact_file, nfrags) -> None:
    """Store a level's aggregated COO into the pyramid HDF5.

    Layout matches reference pyramid_sparse.py:331-396: group "<level>"
    holding "data" (3, nnz) int32 and "nfrags" (1, 1) int32.
    """
    fa, fb, nc = (
        _read_contacts(contact_file)[k].to_numpy(dtype=np.int64)
        for k in ("fa", "fb", "nc")
    )
    agg = _aggregate_coo(fa, fb, nc)
    grp = pyramid_handle.create_group(str(level))
    data = np.stack(
        [
            agg["fa"].to_numpy(dtype=np.int32),
            agg["fb"].to_numpy(dtype=np.int32),
            agg["nc"].to_numpy(dtype=np.int32),
        ]
    )
    grp.create_dataset("data", data=data, dtype="i")
    nf = grp.create_dataset("nfrags", (1, 1), "i")
    nf[:] = nfrags


# ---------------------------------------------------------------------------
# Filter pass
# ---------------------------------------------------------------------------


def remove_problematic_fragments(
    contig_info,
    fragments_list,
    abs_fragments_contacts,
    new_contig_list_file,
    new_fragments_list_file,
    new_abs_fragments_contacts_file,
    pyramid_handle: h5py.File,
    thresh_factor: float = 1.0,
    output_dir: str | os.PathLike | None = None,
) -> float:
    """Drop low-coverage / over-covered / short fragments, merging dropped
    fragments into the next kept fragment of the same contig.

    Semantics follow reference pyramid_sparse.py:731-1029:

    - "sparsity" of a fragment = nnz of its row in the symmetrized matrix
      divided by nfrags; drop if <= mean - thresh_factor*std or
      > mean + 50*std;
    - drop fragments shorter than 50 bp, and any with size <= 1;
    - a dropped fragment's span/gc/accu are folded into the next kept
      fragment downstream in the same contig; trailing dropped fragments
      at a contig end are destroyed (their contacts discarded);
    - contigs left with zero fragments are removed.

    Returns the sparsity threshold used.
    """
    level0 = pyramid_handle["0"]
    coo = level0["data"][:]
    nfrags = int(level0["nfrags"][0, 0])
    mat = sp.csr_matrix(
        (coo[2, :], (coo[0, :], coo[1, :])), shape=(nfrags, nfrags)
    )
    full = mat + mat.transpose()
    sparsity = np.diff(full.indptr).astype(np.float32) / np.float32(nfrags)
    mean_s, std_s = sparsity.mean(), sparsity.std()
    thresh = mean_s - thresh_factor * std_s
    thresh_max = mean_s + THRESH_MAX_STDS * std_s
    logger.info("filter: n frags = %d", nfrags)
    logger.info("filter: mean sparsity = %g std = %g", mean_s, std_s)
    logger.info("filter: thresh = %g, thresh_max = %g", thresh, thresh_max)

    frags = _read_frag_list(fragments_list)
    sizes = (frags["end_pos"] - frags["start_pos"]).to_numpy()
    bad = (
        (sparsity <= thresh)
        | (sparsity > thresh_max)
        | (sizes < THRESH_SHORT_BP)
        | (frags["size"].to_numpy() <= 1)
    )

    # QC plots (reference pyramid_sparse.py:765-771)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plot_dir = pathlib.Path(output_dir) if output_dir else pathlib.Path(".")
        fig = plt.figure()
        plt.scatter(range(len(sparsity)), sparsity, s=2)
        plt.axhline(thresh, color="r")
        plt.xlabel("fragment")
        plt.ylabel("sparsity")
        fig.savefig(plot_dir / "sparsity_plot.pdf")
        plt.close(fig)
        fig = plt.figure()
        plt.hist(sparsity, 100)
        fig.savefig(plot_dir / "sparsity_hist.pdf")
        plt.close(fig)
    except Exception as e:  # plotting must never break the pipeline
        logger.debug("sparsity plot skipped: %s", e)

    # --- forward merge of dropped fragments, per contig (vectorized) ---
    chrom = frags["chrom"].to_numpy()
    new_contig = np.r_[True, chrom[1:] != chrom[:-1]]
    keep = ~bad

    # each kept fragment absorbs the dropped run before it (within its
    # contig): owner[i] = index of the next kept fragment in the same
    # contig; trailing dropped -> destroyed (-1). Suffix-min of kept
    # positions per contig block (vectorized per contig; the contig loop
    # is O(n_contigs), not O(n_frags)).
    n = len(frags)
    cstart = np.flatnonzero(new_contig)
    cend = np.r_[cstart[1:], n]
    sentinel = n + 1
    kept_pos = np.where(keep, np.arange(n), sentinel)
    owner = np.full(n, -1, dtype=np.int64)
    for s, e in zip(cstart, cend):
        suffix = np.minimum.accumulate(kept_pos[s:e][::-1])[::-1]
        owner[s:e] = np.where(suffix < sentinel, suffix, -1)

    kept_idx = np.flatnonzero(keep)
    n_kept = len(kept_idx)
    # 1-based new abs id per kept index
    new_abs = np.zeros(n, dtype=np.int64)
    new_abs[kept_idx] = np.arange(1, n_kept + 1)
    old_2_new = np.where(owner >= 0, new_abs[np.clip(owner, 0, None)], 0)

    # --- build new fragment list (member runs are contiguous) ---
    start_pos = frags["start_pos"].to_numpy()
    end_pos = frags["end_pos"].to_numpy()
    gc = frags["gc_content"].to_numpy(dtype=np.float64)
    accu = frags["accu_frag"].to_numpy()

    # group start of kept fragment k = previous kept index in the same
    # contig + 1, else its contig's start
    contig_start_of = np.repeat(cstart, cend - cstart)
    prev_kept = np.r_[-1, kept_idx[:-1]]
    same_contig_prev = (
        contig_start_of[kept_idx]
        == contig_start_of[np.clip(prev_kept, 0, None)]
    ) & (prev_kept >= 0)
    group_start = np.where(
        same_contig_prev, prev_kept + 1, contig_start_of[kept_idx]
    )

    csum_accu = np.r_[0, np.cumsum(accu)]
    n_members = kept_idx - group_start + 1
    # merged gc = plain mean over the group's members, computed per
    # group (not via a global cumsum, whose subtraction rounds one ulp
    # away from np.mean and breaks byte-parity with the reference
    # filter output, pyramid_sparse.py:944). Singleton groups — the
    # vast majority — copy through exactly; only merged groups loop.
    g_gc = gc[kept_idx].astype(np.float64, copy=True)
    for i in np.flatnonzero(n_members > 1):
        g_gc[i] = gc[group_start[i]: kept_idx[i] + 1].mean()
    g_accu = csum_accu[kept_idx + 1] - csum_accu[group_start]
    g_start = start_pos[group_start]
    g_end = end_pos[kept_idx]
    g_size = g_end - g_start

    # per-contig 1-based relative ids
    kc = contig_start_of[kept_idx]
    new_c = np.r_[True, kc[1:] != kc[:-1]]
    kstart = np.flatnonzero(new_c)
    ksizes = np.diff(np.r_[kstart, n_kept])
    rel = np.arange(n_kept) - np.repeat(kstart, ksizes) + 1

    out_frags = pd.DataFrame(
        {
            "id": rel,
            "chrom": chrom[kept_idx],
            "start_pos": g_start,
            "end_pos": g_end,
            "size": g_size,
            "gc_content": g_gc,
            "accu_frag": g_accu,
            "frag_start": rel,
            "frag_end": rel,
        }
    )
    out_frags.to_csv(new_fragments_list_file, sep="\t", index=False)
    contig_counts = {
        c: int(v)
        for c, v in zip(chrom[kept_idx][kstart], ksizes)
    }
    contig_len = {}
    for c in contig_counts:
        contig_len[c] = int(g_size[chrom[kept_idx] == c].sum())

    # --- contig info ---
    cinfo = _read_contig_info(contig_info)
    with open(new_contig_list_file, "w") as fh:
        fh.write("contig\tlength_kb\tn_frags\tcumul_length\n")
        cumul = 0
        for row in cinfo.itertuples(index=False):
            name = row[0]
            nf = contig_counts.get(name, 0)
            if nf > 0:
                fh.write(f"{name}\t{contig_len[name]}\t{nf}\t{cumul}\n")
                cumul += nf
            else:
                logger.info("%s has been deleted...", name)

    # --- remap contacts ---
    cdf = _read_contacts(abs_fragments_contacts)
    fa = old_2_new[cdf["fa"].to_numpy()] - 1
    fb = old_2_new[cdf["fb"].to_numpy()] - 1
    ok = (fa >= 0) & (fb >= 0)
    agg = _aggregate_coo(fa[ok], fb[ok], cdf["nc"].to_numpy()[ok])
    _write_contacts(agg, new_abs_fragments_contacts_file)
    return float(thresh)


# ---------------------------------------------------------------------------
# 3x binning
# ---------------------------------------------------------------------------


def subsample_data_set(
    contig_info,
    fragments_list,
    fact_sub_sample,
    abs_fragments_contacts,
    new_abs_fragments_contacts_file,
    min_bin_per_contig,
    new_contig_list_file,
    new_fragments_list_file,
    old_2_new_file,
) -> int:
    """Bin fragments by groups of `fact_sub_sample` within each contig.

    Contigs with fewer than fact_sub_sample * min_bin_per_contig fragments
    are carried over 1:1 (reference pyramid_sparse.py:523). Writes the new
    fragment list (11 columns incl. init/sub fragment spans), contig info,
    re-binned contacts and the sub->super index map. Returns the new
    fragment count.
    """
    frags = _read_frag_list(fragments_list)
    cinfo = _read_contig_info(contig_info)
    n = len(frags)

    chrom = frags["chrom"].to_numpy()
    # per-contig relative index (0-based)
    new_c = np.r_[True, chrom[1:] != chrom[:-1]]
    contig_start = np.flatnonzero(new_c)
    contig_sizes = np.diff(np.r_[contig_start, n])
    rel0 = np.arange(n) - np.repeat(contig_start, contig_sizes)

    do_bin = np.repeat(
        (contig_sizes / np.float32(fact_sub_sample)) >= min_bin_per_contig,
        contig_sizes,
    ) & (fact_sub_sample > 1)
    group_rel = np.where(do_bin, rel0 // fact_sub_sample, rel0)

    # global group id: cumulative over contigs
    per_contig_groups = np.zeros(len(contig_start), dtype=np.int64)
    for ci in range(len(contig_start)):
        s, e = contig_start[ci], contig_start[ci] + contig_sizes[ci]
        per_contig_groups[ci] = group_rel[s:e].max() + 1
    group_offset = np.r_[0, np.cumsum(per_contig_groups)[:-1]]
    group_id = group_rel + np.repeat(group_offset, contig_sizes)  # 0-based

    n_new = int(group_id.max()) + 1 if n else 0

    # old->new map (1-based on both sides, like the reference file)
    with open(old_2_new_file, "w") as fh:
        fh.write("current_id\tsuper_id\n")
        np.savetxt(
            fh,
            np.stack([np.arange(1, n + 1), group_id + 1], axis=1),
            fmt="%d",
            delimiter="\t",
        )

    if fact_sub_sample <= 1:
        shutil.copy(fragments_list, new_fragments_list_file)
        shutil.copy(contig_info, new_contig_list_file)
        shutil.copy(abs_fragments_contacts, new_abs_fragments_contacts_file)
        return n

    # --- new fragment list ---
    start_pos = frags["start_pos"].to_numpy()
    end_pos = frags["end_pos"].to_numpy()
    gc = frags["gc_content"].to_numpy(dtype=np.float64)
    # init (level-0) fragment span comes from cols 7/8 of the current list
    init_start = frags.iloc[:, 7].to_numpy()
    init_end = frags.iloc[:, 8].to_numpy()

    first = np.r_[True, group_id[1:] != group_id[:-1]]
    last = np.r_[group_id[1:] != group_id[:-1], True]
    first_idx = np.flatnonzero(first)
    last_idx = np.flatnonzero(last)

    g_chrom = chrom[first_idx]
    g_start = start_pos[first_idx]
    g_end = end_pos[last_idx]
    g_size = g_end - g_start
    csum_gc = np.r_[0.0, np.cumsum(gc)]
    g_gc = (csum_gc[last_idx + 1] - csum_gc[first_idx]) / (
        last_idx - first_idx + 1
    )
    g_init_start = init_start[first_idx]
    g_init_end = init_end[last_idx]
    g_accu = g_init_end - g_init_start + 1
    g_sub_start = first_idx + 1  # 1-based abs ids at the finer level
    g_sub_end = last_idx + 1

    # per-contig 1-based relative id of each group
    g_new_contig = np.r_[True, g_chrom[1:] != g_chrom[:-1]]
    g_cstart = np.flatnonzero(g_new_contig)
    g_csizes = np.diff(np.r_[g_cstart, n_new])
    g_rel = np.arange(n_new) - np.repeat(g_cstart, g_csizes) + 1

    out = pd.DataFrame(
        {
            "id": g_rel,
            "chrom": g_chrom,
            "start_pos": g_start,
            "end_pos": g_end,
            "size": g_size,
            "gc_content": g_gc,
            "accu_frag": g_accu,
            "init_frag_start": g_init_start,
            "init_frag_end": g_init_end,
            "sub_frag_start": g_sub_start,
            "sub_frag_end": g_sub_end,
        }
    )
    out.to_csv(new_fragments_list_file, sep="\t", index=False)

    # --- contig info ---
    with open(new_contig_list_file, "w") as fh:
        fh.write("contig\tlength_kb\tn_frags\tcumul_length\n")
        cumul = 0
        lengths = dict(zip(cinfo.iloc[:, 0], cinfo.iloc[:, 1]))
        for ci, name in enumerate(g_chrom[g_cstart]):
            nf = int(g_csizes[ci])
            fh.write(f"{name}\t{lengths.get(name, 0)}\t{nf}\t{cumul}\n")
            cumul += nf

    # --- re-binned contacts ---
    cdf = _read_contacts(abs_fragments_contacts)
    fa = group_id[cdf["fa"].to_numpy()]
    fb = group_id[cdf["fb"].to_numpy()]
    agg = _aggregate_coo(fa, fb, cdf["nc"].to_numpy())
    _write_contacts(agg, new_abs_fragments_contacts_file)

    logger.info(
        "subsample: %d -> %d fragments (factor %d)", n, n_new, fact_sub_sample
    )
    return n_new


# ---------------------------------------------------------------------------
# Pyramid drivers
# ---------------------------------------------------------------------------


def build(
    base_folder,
    size_pyramid,
    factor,
    min_bin_per_contig,
    output_folder=None,
) -> pathlib.Path:
    """Build an unfiltered pyramid (reference pyramid_sparse.py:178-277).

    Resumable: existing level files / HDF5 "done" attrs are reused.
    Returns the pyramid folder path.
    """
    base = pathlib.Path(base_folder)
    root = pathlib.Path(output_folder) if output_folder else base
    pyr_dir = root / "pyramids" / f"pyramid_{size_pyramid}_no_thresh"
    pyr_dir.mkdir(parents=True, exist_ok=True)

    current = {
        "contigs": base / "info_contigs.txt",
        "frags": base / "fragments_list.txt",
        "contacts": base / "abs_fragments_contacts_weighted.txt",
    }

    with h5py.File(pyr_dir / "pyramid.hdf5", "a") as handle:
        for level in range(size_pyramid):
            lvl_dir = pyr_dir / f"level_{level}"
            lvl_dir.mkdir(exist_ok=True)
            p = lambda stem: lvl_dir / f"{level}_{stem}.txt"  # noqa: E731
            files = {
                "contigs": p("contig_info"),
                "frags": p("fragments_list"),
                "contacts": p("abs_frag_contacts"),
            }
            if level == 0:
                if not files["frags"].exists():
                    shutil.copyfile(current["contigs"], files["contigs"])
                    shutil.copyfile(current["contacts"], files["contacts"])
                    nfrags = init_frag_list(current["frags"], files["frags"])
                else:
                    nfrags = len(_read_frag_list(files["frags"]))
            else:
                if all(f.exists() for f in files.values()):
                    logger.info("level %d already built", level)
                    nfrags = len(_read_frag_list(files["frags"]))
                else:
                    prev_dir = pyr_dir / f"level_{level - 1}"
                    nfrags = subsample_data_set(
                        current["contigs"],
                        current["frags"],
                        factor,
                        current["contacts"],
                        files["contacts"],
                        min_bin_per_contig,
                        files["contigs"],
                        files["frags"],
                        prev_dir / f"{level - 1}_sub_2_super_index_frag.txt",
                    )
            if handle.attrs.get(str(level)) != "done":
                fill_sparse_pyramid_level(
                    handle, level, files["contacts"], nfrags
                )
                handle.attrs[str(level)] = "done"
            current = files
    logger.info("pyramid built: %s", pyr_dir)
    return pyr_dir


def build_and_filter(
    base_folder,
    size_pyramid=PYRAMID_SIZE,
    factor=PYRAMID_FACTOR,
    thresh_factor=1.0,
    output_folder=None,
):
    """Filtered pyramid (reference pyramid_sparse.py:30-175).

    Step 1: single-level unfiltered pyramid to measure coverage sparsity.
    Step 2: filter fragments; step 3: N-level pyramid on the filtered data.
    Returns a Pyramid over the filtered pyramid folder.
    """
    from .level import Pyramid

    base = pathlib.Path(base_folder)
    root = pathlib.Path(output_folder) if output_folder else base
    all_dir = root / "pyramids"
    all_dir.mkdir(parents=True, exist_ok=True)

    init_dir = all_dir / "pyramid_1_no_thresh"
    if not init_dir.exists():
        build(base, 1, factor, 1, output_folder=root)
    init_lvl0 = init_dir / "level_0"

    pyr_dir = all_dir / f"pyramid_{size_pyramid}_thresh_auto"
    lvl0 = pyr_dir / "level_0"
    lvl0.mkdir(parents=True, exist_ok=True)
    filtered = {
        "contigs": lvl0 / "0_contig_info.txt",
        "frags": lvl0 / "0_fragments_list.txt",
        "contacts": lvl0 / "0_abs_frag_contacts.txt",
    }
    if not all(f.exists() for f in filtered.values()):
        logger.info("start filtering")
        with h5py.File(init_dir / "pyramid.hdf5", "r") as pyr0:
            remove_problematic_fragments(
                init_lvl0 / "0_contig_info.txt",
                init_lvl0 / "0_fragments_list.txt",
                init_lvl0 / "0_abs_frag_contacts.txt",
                filtered["contigs"],
                filtered["frags"],
                filtered["contacts"],
                pyr0,
                thresh_factor=thresh_factor,
                output_dir=root,
            )
    else:
        logger.info("filtering already done...")

    # build remaining levels from the filtered level 0
    current = filtered
    with h5py.File(pyr_dir / "pyramid.hdf5", "a") as handle:
        for level in range(size_pyramid):
            lvl_dir = pyr_dir / f"level_{level}"
            lvl_dir.mkdir(exist_ok=True)
            p = lambda stem: lvl_dir / f"{level}_{stem}.txt"  # noqa: E731
            files = {
                "contigs": p("contig_info"),
                "frags": p("fragments_list"),
                "contacts": p("abs_frag_contacts"),
            }
            if level == 0:
                nfrags = len(_read_frag_list(files["frags"]))
            elif all(f.exists() for f in files.values()):
                logger.info("level %d already built", level)
                nfrags = len(_read_frag_list(files["frags"]))
            else:
                prev_dir = pyr_dir / f"level_{level - 1}"
                nfrags = subsample_data_set(
                    current["contigs"],
                    current["frags"],
                    factor,
                    current["contacts"],
                    files["contacts"],
                    1,
                    files["contigs"],
                    files["frags"],
                    prev_dir / f"{level - 1}_sub_2_super_index_frag.txt",
                )
            if handle.attrs.get(str(level)) != "done":
                fill_sparse_pyramid_level(handle, level, files["contacts"], nfrags)
                handle.attrs[str(level)] = "done"
            current = files

    logger.info("pyramid built.")
    return Pyramid(pyr_dir, size_pyramid)


def abs_contact_2_coo_file(abs_contact_file, coo_file) -> None:
    """Convert old-style GRAAL contact maps (1-based pair-per-line) to the
    instaGRAAL COO format (reference pyramid_sparse.py:280-327). Useful
    for datasets generated by Hi-C box.
    """
    df = pd.read_csv(abs_contact_file, sep=r"\s+", skiprows=1, header=None)
    fa = df.iloc[:, 0].to_numpy(np.int64) - 1
    fb = df.iloc[:, 1].to_numpy(np.int64) - 1
    agg = _aggregate_coo(fa, fb, np.ones(len(fa), dtype=np.int64))
    _write_contacts(agg, coo_file)
