"""Pyramid and Level: loaded views over a built pyramid.

NumPy/pandas re-design of reference pyramid_sparse.py:1351-2033 (`pyramid`
and `level` classes): per-level fragment SoA arrays, sparse matrices,
sub/super index navigation and the scaffold FASTA exporter.
"""

from __future__ import annotations

import pathlib

import h5py
import numpy as np
import pandas as pd
import scipy.sparse as sp

from ..io.fasta import read_fasta, revcomp
from ..log import logger

SOA_FIELDS = [
    "pos", "sub_pos", "id_c", "start_bp", "len_bp", "sub_len", "circ",
    "id", "prev", "next", "l_cont", "sub_l_cont", "l_cont_bp", "n_accu",
]


class Pyramid:
    """A built pyramid on disk: fragment tables + HDF5 contact levels."""

    def __init__(self, pyramid_folder, n_levels: int):
        self.folder = pathlib.Path(pyramid_folder)
        self.n_levels = n_levels
        self.hdf5_path = self.folder / "pyramid.hdf5"
        self.frags: dict[int, pd.DataFrame] = {}
        self.sub_2_super: dict[int, np.ndarray] = {}
        for i in range(n_levels):
            lvl = self.folder / f"level_{i}"
            self.frags[i] = pd.read_csv(
                lvl / f"{i}_fragments_list.txt", sep="\t"
            )
            s2s = lvl / f"{i}_sub_2_super_index_frag.txt"
            if i < n_levels - 1 and s2s.exists():
                df = pd.read_csv(s2s, sep="\t")
                # 1-based current_id -> 1-based super_id
                arr = np.zeros(len(self.frags[i]) + 1, dtype=np.int64)
                arr[df.iloc[:, 0].to_numpy()] = df.iloc[:, 1].to_numpy()
                self.sub_2_super[i] = arr
        # contig naming follows order of first appearance at level 0
        self.contig_names = list(dict.fromkeys(self.frags[0]["chrom"]))
        self.contig_ids = {c: i + 1 for i, c in enumerate(self.contig_names)}
        self.sequences: dict[str, str] | None = None

    # ---------------- navigation (reference pyramid_sparse.py:1512-1628) --

    def sub_range(self, level: int, frag_1based: int) -> tuple[int, int]:
        """Inclusive 1-based span of level-1 fragments under a fragment."""
        row = self.frags[level].iloc[frag_1based - 1]
        if level == 0 or "sub_frag_start" not in row:
            return int(row["id"]), int(row["id"])
        return int(row["sub_frag_start"]), int(row["sub_frag_end"])

    def zoom_in_frag(self, curr_frag):
        frag, level = curr_frag
        if level <= 0:
            return [curr_frag]
        lo, hi = self.sub_range(level, frag)
        return [(i, level - 1) for i in range(lo, hi + 1)]

    def zoom_out_frag(self, curr_frag):
        frag, level = curr_frag
        if level >= self.n_levels - 1 or level not in self.sub_2_super:
            return curr_frag
        return (int(self.sub_2_super[level][frag]), level + 1)

    def zoom_in_pixel(self, curr_pixel):
        lo_f, hi_f, level = curr_pixel
        if level <= 0:
            return list(curr_pixel)
        a = self.sub_range(level, lo_f)
        b = self.sub_range(level, hi_f)
        vals = [*a, *b]
        return [min(vals), max(vals), level - 1]

    def zoom_out_pixel(self, curr_pixel):
        lo_f, hi_f, level = curr_pixel
        if level >= self.n_levels - 1 or level not in self.sub_2_super:
            return list(curr_pixel)
        lo = int(self.sub_2_super[level][lo_f])
        hi = int(self.sub_2_super[level][hi_f])
        return [min(lo, hi), max(lo, hi), level + 1]

    def zoom_in_area(self, area):
        x, y = area
        level = x[2]
        if level != y[2] or level <= 0:
            return area
        hx = self.zoom_in_pixel(x)
        hy = self.zoom_in_pixel(y)
        return [
            [min(hx[0], hy[0]), min(hx[1], hy[1]), level - 1],
            [max(hx[0], hy[0]), max(hx[1], hy[1]), level - 1],
        ]

    def load_reference_sequence(self, genome_fasta) -> None:
        logger.info("import reference genome")
        self.sequences = read_fasta(genome_fasta)

    def get_level(self, level: int) -> "Level":
        return Level(self, level)


class Level:
    """One pyramid level: fragment SoA + sparse contact matrix."""

    def __init__(self, pyramid: Pyramid, level: int):
        self.pyramid = pyramid
        self.level = level
        self._load()

    def _load(self) -> None:
        pyr = self.pyramid
        frags = pyr.frags[self.level]
        with h5py.File(pyr.hdf5_path, "r") as f:
            grp = f[str(self.level)]
            self.n_frags = int(grp["nfrags"][0, 0])
            coo = grp["data"][:]
        self.sparse_mat_csr = sp.csr_matrix(
            (coo[2, :], (coo[0, :], coo[1, :])),
            shape=(self.n_frags, self.n_frags),
        )
        self.sparse_mat_csc = self.sparse_mat_csr.tocsc()

        n = len(frags)
        assert n == self.n_frags, (n, self.n_frags)
        chrom = frags["chrom"].to_numpy()
        id_c = np.array([pyr.contig_ids[c] for c in chrom], dtype=np.int32)

        # per-contig grouping (files are contig-contiguous)
        new_c = np.r_[True, chrom[1:] != chrom[:-1]]
        cstart = np.flatnonzero(new_c)
        csizes = np.diff(np.r_[cstart, n])
        rel = np.arange(n) - np.repeat(cstart, csizes)

        size = frags["size"].to_numpy(dtype=np.int64)
        if "sub_frag_start" in frags.columns:
            sub_len = (
                frags["sub_frag_end"].to_numpy()
                - frags["sub_frag_start"].to_numpy()
                + 1
            ).astype(np.int32)
        else:
            sub_len = np.ones(n, dtype=np.int32)

        # exclusive cumsum of sub_len within contig
        cum = np.cumsum(sub_len)
        sub_pos = cum - sub_len
        sub_pos = sub_pos - np.repeat(sub_pos[cstart], csizes)

        l_cont = np.repeat(csizes, csizes).astype(np.int32)
        l_cont_bp = np.repeat(
            np.add.reduceat(size, cstart), csizes
        ).astype(np.int32)
        sub_l_cont = np.repeat(
            np.add.reduceat(sub_len.astype(np.int64), cstart), csizes
        ).astype(np.int32)

        ids = np.arange(n, dtype=np.int32)
        prev = ids - 1
        nxt = ids + 1
        prev[cstart] = -1
        nxt[cstart + csizes - 1] = -1

        self.S_o_A_frags: dict[str, np.ndarray] = {
            "pos": rel.astype(np.int32),
            "sub_pos": sub_pos.astype(np.int32),
            "id_c": id_c,
            "start_bp": frags["start_pos"].to_numpy(dtype=np.int32),
            "len_bp": size.astype(np.int32),
            "sub_len": sub_len,
            "circ": np.zeros(n, dtype=np.int32),
            "id": ids,
            "prev": prev.astype(np.int32),
            "next": nxt.astype(np.int32),
            "l_cont": l_cont,
            "sub_l_cont": sub_l_cont,
            "l_cont_bp": l_cont_bp,
            "n_accu": frags["accu_frag"].to_numpy(dtype=np.int32),
        }
        self.frags_init_contigs = list(chrom)
        self.n_contigs = len(cstart)
        self.distri_frag = size.astype(np.float64)
        self._frag_table = frags
        self._compute_mean_value_trans(id_c)

    def _compute_mean_value_trans(self, id_c: np.ndarray) -> None:
        """Mean count of inter-contig pixel pairs.

        Mirrors reference pyramid_sparse.py:1875-1898: total inter-contig
        contacts divided by the number of inter-contig pixel pairs; falls
        back to min(data)/10 when there is a single contig.
        """
        coo = self.sparse_mat_csr.tocoo()
        intra = id_c[coo.row] == id_c[coo.col]
        total_trans = float(coo.data[~intra].sum())
        counts = np.bincount(id_c, minlength=id_c.max() + 1).astype(np.float64)
        n = float(self.n_frags)
        n_tot = n * (n - 1) / 2.0 - float((counts * (counts - 1) / 2.0).sum())
        if n_tot <= 0 or not np.isfinite(total_trans / n_tot):
            self.mean_value_trans = (
                float(self.sparse_mat_csr.data.min()) / 10.0
                if self.sparse_mat_csr.nnz
                else 0.1
            )
        else:
            self.mean_value_trans = total_trans / np.float32(n_tot)
        logger.debug("mean trans value = %s", self.mean_value_trans)

    # ------------------------------------------------------------------
    def build_seq_per_bin(self, genome_fasta) -> None:
        """Load per-fragment sequences (reference pyramid_sparse.py:1938)."""
        self.pyramid.load_reference_sequence(genome_fasta)
        seqs = self.pyramid.sequences
        self.list_seq = [
            seqs[row.chrom][row.start_pos : row.end_pos]
            for row in self._frag_table.itertuples(index=False)
        ]

    def generate_new_fasta(self, vect_frags, new_fasta, info_frags) -> None:
        """Write the scaffolded genome + info_frags.txt.

        Matches reference pyramid_sparse.py:1963-2033: contigs ordered by
        ascending contig id in info_frags.txt, by decreasing sequence
        length in the FASTA; headers ">3C-assembly|contig_N" (info) and
        ">3C-assembly-contig_N" (FASTA); 61-char FASTA lines. (The
        reference drops the final base when len % 61 == 1 — reference
        pyramid_sparse.py:2028; we write the full sequence.)
        """
        seqs = self.pyramid.sequences
        assert seqs is not None, "call build_seq_per_bin first"
        id_c = np.asarray(vect_frags.id_c)
        pos = np.asarray(vect_frags.pos)
        ori = np.asarray(vect_frags.ori)
        activ = np.asarray(vect_frags.activ)
        id_d = np.asarray(vect_frags.id_d)

        starts = self._frag_table["start_pos"].to_numpy()
        ends = self._frag_table["end_pos"].to_numpy()

        contig_seqs: dict[int, str] = {}
        with open(info_frags, "w") as info:
            for cid in np.unique(id_c):
                members = np.flatnonzero(id_c == cid)
                if not np.all(activ[members] == 1):
                    continue
                info.write(f">3C-assembly|contig_{cid}\n")
                info.write("init_contig\tid_frag\torientation\tstart\tend\n")
                ordered = members[np.argsort(pos[members])]
                parts = []
                for f in ordered:
                    init_id = int(id_d[f])
                    init_contig = self.frags_init_contigs[init_id]
                    s, e = int(starts[init_id]), int(ends[init_id])
                    seq = seqs[init_contig][s:e]
                    if ori[f] == -1:
                        seq = revcomp(seq)
                    info.write(
                        f"{init_contig}\t{init_id}\t{int(ori[f])}\t{s}\t{e}\n"
                    )
                    parts.append(seq)
                contig_seqs[int(cid)] = "".join(parts)

        with open(new_fasta, "w") as fa:
            for cid in sorted(
                contig_seqs, key=lambda c: len(contig_seqs[c]), reverse=True
            ):
                seq = contig_seqs[cid]
                fa.write(f">3C-assembly-contig_{cid}\n")
                for i in range(0, len(seq), 61):
                    fa.write(seq[i : i + 61] + "\n")
