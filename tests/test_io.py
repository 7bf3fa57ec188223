"""Unit tests for the host data layer (FASTA, digest, pairs, formats, cool)."""

import gzip

import pandas as pd
import pytest

from instagraal_tpu.io import (
    digest_genome,
    pairs_to_pixels,
    read_fasta,
    revcomp,
    write_fasta,
)
from instagraal_tpu.io.cool import read_cool_pixels, write_cool
from instagraal_tpu.io.digest import cut_sites, gc_content
from instagraal_tpu.io import formats


class TestFasta:
    def test_roundtrip(self, tmp_path):
        recs = {"a": "ACGT" * 40, "b": "TTTT"}
        path = tmp_path / "x.fa"
        write_fasta(recs, path)
        assert read_fasta(path) == recs

    def test_gzip_roundtrip(self, tmp_path):
        recs = {"c1": "GATCGATC" * 20}
        path = tmp_path / "x.fa.gz"
        write_fasta(recs, path)
        assert read_fasta(path) == recs

    def test_line_width_61(self, tmp_path):
        recs = {"a": "A" * 130}
        path = tmp_path / "x.fa"
        write_fasta(recs, path)
        lines = path.read_text().splitlines()
        assert lines[0] == ">a"
        assert [len(x) for x in lines[1:]] == [61, 61, 8]

    def test_header_token(self, tmp_path):
        path = tmp_path / "x.fa"
        path.write_text(">name extra stuff\nACGT\n")
        assert read_fasta(path) == {"name": "ACGT"}

    def test_revcomp(self):
        assert revcomp("GATC") == "GATC"
        assert revcomp("AACG") == "CGTT"
        assert revcomp("acgt") == "acgt"
        assert revcomp("ANNT") == "ANNT"


class TestDigest:
    def test_dpnii_cut_positions(self):
        #          0123456789
        seq = "AAGATCAAAGATCAA"
        cuts = cut_sites(seq, ["DpnII"])
        # DpnII cuts before the G of GATC -> 0-based offsets 2 and 9
        assert cuts.tolist() == [2, 9]

    def test_hinfi_wildcard(self):
        # HinfI = G^ANTC, cut offset 1
        seq = "TTGACTCTT"  # GACTC at offset 2 -> cut at 3
        cuts = cut_sites(seq, ["HinfI"])
        assert cuts.tolist() == [3]

    def test_unknown_enzyme(self):
        with pytest.raises(ValueError):
            cut_sites("ACGT", ["NotAnEnzyme"])

    def test_multi_enzyme_merge(self):
        seq = "AAGATCAAGACTCAA"
        single = set(cut_sites(seq, ["DpnII"]).tolist()) | set(
            cut_sites(seq, ["HinfI"]).tolist()
        )
        merged = set(cut_sites(seq, ["DpnII", "HinfI"]).tolist())
        assert merged == single

    def test_fragments_cover_genome(self):
        records = {"c1": "AAGATCAA" * 10, "c2": "ACGT" * 25}
        bins = digest_genome(records, ["DpnII"])
        for chrom, seq in records.items():
            sub = bins[bins.chrom == chrom]
            assert sub.iloc[0].start == 0
            assert sub.iloc[-1].end == len(seq)
            # contiguous, non-overlapping
            assert (sub.start.values[1:] == sub.end.values[:-1]).all()
            assert (sub.end > sub.start).all()

    def test_gc(self):
        assert gc_content("") == 0.0
        assert gc_content("GGCC") == 1.0
        assert gc_content("GATC") == 0.5
        assert gc_content("gatc") == 0.5


class TestPairs:
    def _bins(self):
        return pd.DataFrame(
            {
                "chrom": ["c1", "c1", "c2"],
                "start": [0, 50, 0],
                "end": [50, 100, 80],
            }
        )

    def _write(self, tmp_path, lines, header=True):
        path = tmp_path / "p.pairs"
        with open(path, "w") as fh:
            if header:
                fh.write("## pairs format v1.0\n")
                fh.write(
                    "#columns: readID chr1 pos1 chr2 pos2 strand1 strand2\n"
                )
            for ln in lines:
                fh.write(ln + "\n")
        return path

    def test_basic_binning(self, tmp_path):
        path = self._write(
            tmp_path,
            [
                "r1\tc1\t10\tc1\t60\t+\t-",  # bins 0,1
                "r2\tc1\t10\tc1\t20\t+\t-",  # bins 0,0
                "r3\tc2\t5\tc1\t5\t+\t-",  # bins 2,0 -> upper tri (0,2)
            ],
        )
        pixels, total = pairs_to_pixels(path, self._bins())
        assert total == 3
        got = {
            (r.bin1_id, r.bin2_id): r.count
            for r in pixels.itertuples(index=False)
        }
        assert got == {(0, 1): 1, (0, 0): 1, (0, 2): 1}

    def test_boundary_assignment(self, tmp_path):
        # 1-based pos 50 = last base of fragment [0,50) -> left fragment
        path = self._write(
            tmp_path,
            ["r1\tc1\t50\tc1\t51\t+\t-"],
        )
        pixels, total = pairs_to_pixels(path, self._bins())
        assert total == 1
        assert (pixels.bin1_id[0], pixels.bin2_id[0]) == (0, 1)

    def test_unknown_chrom_skipped(self, tmp_path):
        path = self._write(
            tmp_path,
            ["r1\tcX\t10\tc1\t10\t+\t-", "r2\tc1\t1\tc1\t2\t+\t-"],
        )
        pixels, total = pairs_to_pixels(path, self._bins())
        assert total == 1

    def test_column_reordering(self, tmp_path):
        path = tmp_path / "p.pairs"
        with open(path, "w") as fh:
            fh.write("#columns: readID chr2 pos2 chr1 pos1\n")
            fh.write("r1\tc2\t5\tc1\t7\n")
        pixels, total = pairs_to_pixels(path, self._bins())
        assert total == 1
        assert (pixels.bin1_id[0], pixels.bin2_id[0]) == (0, 2)

    def test_gzip_input(self, tmp_path):
        path = tmp_path / "p.pairs.gz"
        with gzip.open(path, "wt") as fh:
            fh.write("#columns: readID chr1 pos1 chr2 pos2\n")
            fh.write("r1\tc1\t10\tc1\t60\n")
        pixels, total = pairs_to_pixels(path, self._bins())
        assert total == 1


class TestFormats:
    def test_abs_contacts_roundtrip(self, tmp_path):
        pixels = pd.DataFrame(
            {
                "bin1_id": [0, 0, 2],
                "bin2_id": [1, 2, 5],
                "count": [3, 1, 7],
            }
        )
        path = tmp_path / "abs.txt"
        formats.write_abs_contacts(pixels, 6, path)
        first = path.read_text().splitlines()[0]
        assert first == "6\t6\t3"
        r, c, d = formats.read_abs_contacts(path)
        assert r.tolist() == [0, 0, 2]
        assert c.tolist() == [1, 2, 5]
        assert d.tolist() == [3, 1, 7]

    def test_fragments_list_per_contig_ids(self, tmp_path):
        bins = pd.DataFrame(
            {
                "chrom": ["a", "a", "b"],
                "start": [0, 10, 0],
                "end": [10, 30, 20],
                "gc_content": [0.5, 0.25, 0.75],
            }
        )
        path = tmp_path / "frags.txt"
        formats.write_fragments_list(bins, path)
        df = pd.read_csv(path, sep="\t")
        assert df["id"].tolist() == [1, 2, 1]
        assert df["size"].tolist() == [10, 20, 20]


class TestCool:
    def test_roundtrip(self, tmp_path):
        bins = pd.DataFrame(
            {
                "chrom": ["a", "a", "b"],
                "start": [0, 10, 0],
                "end": [10, 30, 20],
            }
        )
        pixels = pd.DataFrame(
            {"bin1_id": [0, 1], "bin2_id": [1, 2], "count": [4, 9]}
        )
        path = tmp_path / "x.cool"
        write_cool(path, bins, pixels, chromsizes={"a": 30, "b": 20})
        rb, rp, attrs = read_cool_pixels(path)
        assert attrs["nbins"] == 3
        assert attrs["nnz"] == 2
        assert attrs["sum"] == 13
        assert rb["chrom"].tolist() == ["a", "a", "b"]
        assert rp["count"].tolist() == [4, 9]

    def test_indexes(self, tmp_path):
        import h5py

        bins = pd.DataFrame(
            {"chrom": ["a", "b"], "start": [0, 0], "end": [5, 5]}
        )
        pixels = pd.DataFrame(
            {"bin1_id": [0, 1], "bin2_id": [0, 1], "count": [1, 1]}
        )
        path = tmp_path / "x.cool"
        write_cool(path, bins, pixels)
        with h5py.File(path) as f:
            assert f["indexes/chrom_offset"][:].tolist() == [0, 1, 2]
            assert f["indexes/bin1_offset"][:].tolist() == [0, 1, 2]


class TestSimulatedData:
    def test_toy_pipeline(self, toy_pre):
        stats = toy_pre["stats"]
        assert stats["n_frags"] > 50
        assert stats["n_pairs"] > 100_000
        d = toy_pre["dir"]
        for name in (
            "fragments_list.txt",
            "info_contigs.txt",
            "abs_fragments_contacts_weighted.txt",
        ):
            assert (d / name).exists()
        r, c, dat = formats.read_abs_contacts(
            d / "abs_fragments_contacts_weighted.txt"
        )
        assert (r <= c).all()
        assert (dat > 0).all()
        # cis enrichment sanity: diagonal-adjacent pixels dominate
        frags = formats.read_fragments_list(d / "fragments_list.txt")
        assert len(frags) == stats["n_frags"]


def test_write_cool_many_contigs(tmp_path):
    """A fragmented draft (thousands of contigs) must not blow the
    HDF5 64 KB object-header cap through the bins/chrom enum dtype —
    cooler's own fallback is plain int ids + chroms/name lookup
    (hit at 6,000 contigs in the config-#5 scale run)."""
    import h5py
    import pandas as pd

    from instagraal_tpu.io.cool import write_cool

    n = 6000
    names = [f"contig_{i:05d}_from_chr{i % 16}:1-1000" for i in range(n)]
    bins = pd.DataFrame(
        {"chrom": names, "start": 0, "end": 1000}
    )
    pixels = pd.DataFrame(
        {"bin1_id": [0, 1], "bin2_id": [1, 2], "count": [3, 4]}
    )
    path = tmp_path / "many.cool"
    write_cool(path, bins, pixels)
    with h5py.File(path) as f:
        chrom = f["bins/chrom"][:]
        assert chrom.shape == (n,)
        assert f["chroms/name"].shape == (n,)
        # ids resolve through chroms/name
        assert (
            f["chroms/name"][int(chrom[0])].decode()
            == names[0]
        )
    # small assemblies keep the enum dtype
    small = tmp_path / "small.cool"
    write_cool(small, bins.iloc[:5].copy(), pixels)
    with h5py.File(small) as f:
        assert h5py.check_enum_dtype(f["bins/chrom"].dtype) is not None
