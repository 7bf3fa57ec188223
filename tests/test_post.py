"""Tests for the post-processing liftover and contact-map outputs."""

import gzip

import h5py
import numpy as np
import pandas as pd
import pytest

from instagraal_tpu.post import (
    LiftoverIndex,
    binnify,
    build_contig_ordered_bins,
    build_new_bins,
    compute_ps,
    coarsen_pixels,
    fragment_pixels_to_scaffold_pixels,
    ice_balance,
    pairs_to_contig_pixels,
    pairs_to_lifted_pixels,
    run_post,
    scaffold_bins_from_extended,
    write_lifted_pairs,
)


@pytest.fixture
def scaffolds():
    return {
        "scafA": [
            ["c1", 0, 0, 100, 1],
            ["c1", 1, 100, 250, 1],
            ["c2", 0, 0, 80, -1],
        ],
        "scafB": [
            ["c3", 0, 20, 120, 1],
        ],
    }


@pytest.fixture
def pairs_file(tmp_path):
    path = tmp_path / "orig.pairs"
    lines = [
        "## pairs format v1.0",
        "#chromsize: c1 250",
        "#chromsize: c2 80",
        "#chromsize: c3 150",
        "#columns: readID chr1 pos1 chr2 pos2 strand1 strand2",
        "r1\tc1\t50\tc1\t150\t+\t-",  # frag 0 x frag 1
        "r2\tc1\t10\tc2\t40\t+\t+",  # frag 0 x frag 2
        "r3\tc3\t50\tc3\t100\t-\t-",  # frag 3 x frag 3
        "r4\tc3\t10\tc1\t60\t+\t-",  # c3:10 is before frag 3 span -> dropped
        "r5\tcX\t10\tc1\t60\t+\t-",  # unknown contig -> dropped
    ]
    path.write_text("\n".join(lines) + "\n")
    return path


class TestBins:
    def test_layout_with_junction(self, scaffolds):
        bins = build_new_bins(scaffolds, junction_len=6)
        a = bins[bins.chrom == "scafA"]
        assert a["start"].tolist() == [0, 100, 256]  # junction before c2
        assert a["end"].tolist() == [100, 250, 336]
        b = bins[bins.chrom == "scafB"]
        assert b["start"].tolist() == [0]
        assert b["end"].tolist() == [100]

    def test_no_junction_between_same_contig(self, scaffolds):
        bins = build_new_bins(scaffolds, junction_len=6)
        a = bins[bins.chrom == "scafA"]
        assert a.iloc[1]["start"] == a.iloc[0]["end"]


class TestLiftover:
    def test_forward(self, scaffolds):
        index = LiftoverIndex(build_new_bins(scaffolds, 6))
        c, p, b = index.lift(
            np.array(["c1"], dtype=object), np.array([150], dtype=np.int64)
        )
        # c1:150 (1-based) -> frag 1 (orig 100..250), offset 49
        assert c[0] == "scafA"
        assert p[0] == 150
        assert b[0] == 1

    def test_reverse_mirrored(self, scaffolds):
        index = LiftoverIndex(build_new_bins(scaffolds, 6))
        # c2 placed at scafA 256..336 reversed; c2:1 -> end of fragment
        c, p, b = index.lift(
            np.array(["c2"], dtype=object), np.array([1], dtype=np.int64)
        )
        assert c[0] == "scafA"
        assert p[0] == 336  # 256 + (80-1-0) + 1
        c, p, _ = index.lift(
            np.array(["c2"], dtype=object), np.array([80], dtype=np.int64)
        )
        assert p[0] == 257

    def test_uncovered_dropped(self, scaffolds):
        index = LiftoverIndex(build_new_bins(scaffolds, 6))
        c, p, b = index.lift(
            np.array(["c3", "cX"], dtype=object),
            np.array([10, 5], dtype=np.int64),
        )
        assert (b == -1).all()  # c3:10 before span 20..120; cX unknown

    def test_lifted_pixels(self, scaffolds, pairs_file):
        index = LiftoverIndex(build_new_bins(scaffolds, 6))
        pixels, total = pairs_to_lifted_pixels(pairs_file, index)
        assert total == 3
        got = {
            (r.bin1_id, r.bin2_id): r.count
            for r in pixels.itertuples(index=False)
        }
        assert got == {(0, 1): 1, (0, 2): 1, (3, 3): 1}

    def test_write_lifted_pairs(self, scaffolds, pairs_file, tmp_path):
        index = LiftoverIndex(build_new_bins(scaffolds, 6))
        out = tmp_path / "lifted.pairs.gz"
        total, remapped = write_lifted_pairs(
            pairs_file, index, build_new_bins(scaffolds, 6), out
        )
        assert total == 5
        assert remapped == 3
        with gzip.open(out, "rt") as fh:
            content = fh.read()
        assert "#chromsize: scafA 336" in content
        assert "#sorted: none" in content
        body = [
            ln for ln in content.splitlines() if not ln.startswith("#")
        ]
        assert len(body) == 3
        assert body[0].split("\t")[1] == "scafA"


class TestCoolBuilders:
    def test_contig_ordered_bins(self, scaffolds):
        sizes = {"c3": 150, "c1": 250, "c2": 80, "c9": 40}
        bins = build_contig_ordered_bins(sizes, scaffolds)
        # order follows new assembly, then leftovers
        assert bins["chrom"].tolist() == ["c1", "c2", "c3", "c9"]

    def test_contig_pixels(self, scaffolds, pairs_file):
        sizes = {"c1": 250, "c2": 80, "c3": 150}
        bins = build_contig_ordered_bins(sizes, scaffolds)
        pixels, total = pairs_to_contig_pixels(pairs_file, bins)
        assert total == 4  # r5 dropped (unknown chrom)
        got = {
            (r.bin1_id, r.bin2_id): r.count
            for r in pixels.itertuples(index=False)
        }
        # c1=0, c2=1, c3=2
        assert got == {(0, 0): 1, (0, 1): 1, (2, 2): 1, (0, 2): 1}

    def test_scaffold_aggregation(self, scaffolds):
        bins = build_new_bins(scaffolds, 6)
        sbins = scaffold_bins_from_extended(bins)
        assert sbins["chrom"].tolist() == ["scafA", "scafB"]
        assert sbins["end"].tolist() == [336, 100]
        frag_pixels = pd.DataFrame(
            {
                "bin1_id": [0, 0, 3],
                "bin2_id": [1, 3, 3],
                "count": [5, 2, 1],
            }
        )
        out = fragment_pixels_to_scaffold_pixels(frag_pixels, bins, sbins)
        got = {
            (r.bin1_id, r.bin2_id): r.count
            for r in out.itertuples(index=False)
        }
        assert got == {(0, 0): 5, (0, 1): 2, (1, 1): 1}

    def test_binnify(self):
        bins = binnify({"s": 250}, 100)
        assert bins["start"].tolist() == [0, 100, 200]
        assert bins["end"].tolist() == [100, 200, 250]

    def test_coarsen(self):
        fine = binnify({"s": 400}, 100)
        coarse = binnify({"s": 400}, 200)
        pixels = pd.DataFrame(
            {"bin1_id": [0, 1, 2], "bin2_id": [1, 2, 3], "count": [1, 2, 4]}
        )
        out = coarsen_pixels(fine, pixels, coarse)
        got = {
            (r.bin1_id, r.bin2_id): r.count
            for r in out.itertuples(index=False)
        }
        assert got == {(0, 0): 1, (0, 1): 2, (1, 1): 4}


class TestIce:
    def test_weights_balance_rows(self):
        rng = np.random.default_rng(0)
        n = 30
        rows, cols = np.triu_indices(n)
        bias = rng.uniform(0.5, 2.0, n)
        counts = rng.poisson(10 * bias[rows] * bias[cols]) + 1
        bins = pd.DataFrame(
            {"chrom": "s", "start": np.arange(n), "end": np.arange(n) + 1}
        )
        pixels = pd.DataFrame(
            {"bin1_id": rows, "bin2_id": cols, "count": counts}
        )
        w = ice_balance(bins, pixels, max_iters=500)
        assert np.isfinite(w).all()
        # balanced row sums approximately uniform
        s = np.zeros(n)
        v = counts * w[rows] * w[cols]
        np.add.at(s, rows, v)
        off = rows != cols
        np.add.at(s, cols[off], v[off])
        assert s.std() / s.mean() < 0.1


class TestPs:
    def test_intra_only(self, pairs_file):
        df = compute_ps(pairs_file)
        assert not df.empty
        assert (df["norm_p"] > 0).all()


class TestRunPost:
    def test_full_pipeline(self, scaffolds, pairs_file, tmp_path):
        from instagraal_tpu.polish import write_info_frags

        info = tmp_path / "new_info_frags.txt"
        write_info_frags(scaffolds, info)
        out = tmp_path / "post"
        result = run_post(
            pairs_file,
            info,
            out,
            resolutions="50,100",
            plot=False,
        )
        assert result["n_scaffolds"] == 2
        assert result["remapped"] == 3
        assert result["mcool"].exists()
        assert result["scaffolds_cool"].exists()
        assert result["contigs_cool"].exists()
        assert result["lifted_pairs"].exists()
        with h5py.File(result["mcool"]) as f:
            assert "resolutions/50" in f
            assert "resolutions/100" in f
            assert "weight" in f["resolutions/50/bins"]
