"""Tests for the polish layer (scaffold correction heuristics)."""

import pytest

from instagraal_tpu.polish import (
    correct_spurious_inversions,
    find_lost_dna,
    integrate_lost_dna,
    is_block,
    parse_bed,
    parse_info_frags,
    rearrange_intra_scaffolds,
    remove_spurious_insertions,
    reorient_consecutive_blocks,
    write_fasta,
    write_info_frags,
)
from instagraal_tpu.io.fasta import read_fasta, write_fasta as write_plain_fasta


@pytest.fixture
def spurious_scaffolds():
    return {
        "scaffold1": [
            ["contig1", 0, 0, 100, 1],
            ["contig1", 1, 100, 200, 1],
            ["contig23", 53, 1845, 2058, -1],  # insertion
            ["contig1", 4, 254, 408, 1],
            ["contig1", 7, 805, 1253, 1],
            ["contig5", 23, 1500, 1605, -1],
            ["contig65", 405, 32145, 45548, -1],  # insertion
            ["contig5", 22, 1385, 1499, -1],
        ],
        "scaffold2": [
            ["contig8", 0, 0, 250, 1],
            ["contig17", 1, 2454, 8754, -1],  # insertion
            ["contig8", 2, 320, 480, 1],
        ],
    }


class TestRemoveSpuriousInsertions:
    def test_reference_example(self, spurious_scaffolds):
        out = remove_spurious_insertions(spurious_scaffolds)
        assert [b[0] for b in out["scaffold1"]] == [
            "contig1", "contig1", "contig1", "contig1", "contig5", "contig5",
        ]
        assert [b[0] for b in out["scaffold2"]] == ["contig8", "contig8"]

    def test_short_scaffold_untouched(self):
        sc = {"s": [["a", 0, 0, 10, 1], ["b", 0, 0, 10, 1]]}
        assert remove_spurious_insertions(sc) == sc

    def test_leading_insertion_removed(self):
        sc = {
            "s": [
                ["x", 0, 0, 10, 1],  # leading insertion
                ["a", 0, 0, 10, 1],
                ["a", 1, 10, 20, 1],
            ]
        }
        out = remove_spurious_insertions(sc)
        assert [b[0] for b in out["s"]] == ["a", "a"]

    def test_trailing_insertion_removed(self):
        sc = {
            "s": [
                ["a", 0, 0, 10, 1],
                ["a", 1, 10, 20, 1],
                ["x", 0, 0, 10, 1],  # trailing insertion
            ]
        }
        out = remove_spurious_insertions(sc)
        assert [b[0] for b in out["s"]] == ["a", "a"]


@pytest.fixture
def inversion_scaffolds():
    return {
        "scaffold1": [
            ["contig1", 1, 100, 200, 1],
            ["contig1", 2, 200, 300, 1],
            ["contig1", 3, 300, 400, -1],  # inversion (contiguous)
            ["contig1", 4, 400, 500, 1],
            ["contig1", 10, 1500, 1605, 1],
            ["contig1", 12, 1750, 1850, -1],  # inversion (colinear)
            ["contig1", 23, 2100, 2499, 1],
            ["contig1", 28, 2850, 3000, 1],
            ["contig1", 0, 0, 100, -1],  # inversion (cis)
            ["contig2", 554, 1850, 1900, -1],
        ],
    }


class TestCorrectSpuriousInversions:
    def test_cis(self, inversion_scaffolds):
        out = correct_spurious_inversions(inversion_scaffolds, "cis")
        oris = [b[4] for b in out["scaffold1"]]
        assert oris == [1, 1, 1, 1, 1, 1, 1, 1, 1, -1]

    def test_colinear(self, inversion_scaffolds):
        out = correct_spurious_inversions(inversion_scaffolds, "colinear")
        oris = [b[4] for b in out["scaffold1"]]
        assert oris == [1, 1, 1, 1, 1, 1, 1, 1, -1, -1]

    def test_contiguous(self, inversion_scaffolds):
        out = correct_spurious_inversions(inversion_scaffolds, "contiguous")
        oris = [b[4] for b in out["scaffold1"]]
        assert oris == [1, 1, 1, 1, 1, -1, 1, 1, -1, -1]

    def test_majority_negative(self):
        sc = {
            "s": [
                ["a", 0, 0, 10, -1],
                ["a", 1, 10, 20, -1],
                ["a", 2, 20, 30, 1],
            ]
        }
        out = correct_spurious_inversions(sc, "cis")
        assert [b[4] for b in out["s"]] == [-1, -1, -1]


class TestRearrange:
    def test_small_group_moves_to_large(self):
        sc = {
            "s": [
                ["a", 0, 0, 10, 1],
                ["b", 0, 0, 10, 1],
                ["b", 1, 10, 20, 1],
                ["a", 1, 10, 20, 1],
                ["a", 2, 20, 30, 1],
            ]
        }
        out = rearrange_intra_scaffolds(sc)
        # 'a' has runs of 1 and 2 bins; anchor = position of the longest
        # run (order 2); 'b' anchors at order 1
        assert [b[0] for b in out["s"]] == ["b", "b", "a", "a", "a"]
        assert [b[1] for b in out["s"]] == [0, 1, 0, 1, 2]


class TestReorient:
    def test_blocks_mode_sorts_by_id(self):
        sc = {
            "s": [
                ["a", 2, 20, 30, 1],
                ["a", 0, 0, 10, 1],
                ["a", 1, 10, 20, -1],
            ]
        }
        out = reorient_consecutive_blocks(sc, mode="blocks")
        assert [b[1] for b in out["s"]] == [0, 1, 2]
        assert all(b[4] == 1 for b in out["s"])

    def test_blocks_mode_negative_majority_reverses(self):
        sc = {
            "s": [
                ["a", 0, 0, 10, -1],
                ["a", 2, 20, 30, -1],
                ["a", 1, 10, 20, 1],
            ]
        }
        out = reorient_consecutive_blocks(sc, mode="blocks")
        assert [b[1] for b in out["s"]] == [2, 1, 0]
        assert all(b[4] == -1 for b in out["s"])

    def test_sequences_mode(self):
        sc = {
            "s": [
                ["a", 0, 0, 10, -1],
                ["a", 1, 10, 20, -1],
                ["a", 2, 20, 30, -1],
            ]
        }
        out = reorient_consecutive_blocks(sc, mode="sequences")
        # ascending ids -> forward orientation inferred
        assert [b[4] for b in out["s"]] == [1, 1, 1]


class TestLostDna:
    def test_find_and_integrate(self, tmp_path):
        fasta = tmp_path / "ref.fa"
        write_plain_fasta({"c1": "A" * 100, "c2": "C" * 50}, fasta)
        scaffolds = {
            "s1": [["c1", 0, 0, 59, 1]],  # uses c1[0:60) (inclusive removal)
        }
        lost = find_lost_dna(fasta, scaffolds)
        # c1 60..100 and all of c2 are lost
        assert [b[2:4] for b in lost["c1"]] == [[60, 100]]
        assert [b[2:4] for b in lost["c2"]] == [[0, 50]]

        merged = integrate_lost_dna(scaffolds, lost)
        # c1 chunk borders the placed bin (end 59 == lost_start-1) -> inserted
        s1 = merged["s1"]
        assert len(s1) == 2
        assert s1[1][0] == "c1" and s1[1][2] == 59
        # c2 leftover becomes its own scaffold
        assert "c2" in merged

    def test_lost_fasta_output(self, tmp_path):
        fasta = tmp_path / "ref.fa"
        write_plain_fasta({"c1": "ACGT" * 30}, fasta)
        out = tmp_path / "lost.fa"
        find_lost_dna(fasta, {"s": [["c1", 0, 0, 19, 1]]}, output_file=out)
        rec = read_fasta(out)
        assert list(rec) == ["c1_20_120"]
        assert len(rec["c1_20_120"]) == 100


class TestIsBlock:
    def test_block(self):
        assert is_block([["a", 3, 0, 1, 1], ["a", 4, 0, 1, 1], ["a", 5, 0, 1, 1]])

    def test_not_block(self):
        assert not is_block([["a", 3, 0, 1, 1], ["a", 5, 0, 1, 1]])


class TestIO:
    def test_info_frags_roundtrip(self, tmp_path, spurious_scaffolds):
        path = tmp_path / "info.txt"
        write_info_frags(spurious_scaffolds, path)
        back = parse_info_frags(path)
        assert back == spurious_scaffolds

    def test_parse_bed(self, tmp_path):
        bed = tmp_path / "x.bed"
        bed.write_text(
            "s1\t0\t100\tq1\t60\t+\n"
            "s1\t100\t200\tq2\t60\t-\n"
            "s2\t0\t50\tq3\t0\t+\n"  # qual 0 -> dropped
        )
        out = parse_bed(bed)
        assert len(out["s1"]) == 2
        assert out["s1"][1][4] == -1
        assert "s2" not in out

    def test_write_fasta_with_junction(self, tmp_path):
        ref = tmp_path / "ref.fa"
        write_plain_fasta({"c1": "AAAA", "c2": "CCCC"}, ref)
        info = tmp_path / "info.txt"
        write_info_frags(
            {
                "3C-assembly|contig_1": [
                    ["c1", 0, 0, 4, 1],
                    ["c2", 0, 0, 4, -1],
                ]
            },
            info,
        )
        out = tmp_path / "new.fa"
        write_fasta(ref, info, out, junction="NNN")
        rec = read_fasta(out)
        assert rec["3C-assembly|contig_1"] == "AAAANNNGGGG"


class TestPreservation:
    def test_inversions_preserve_bins(self, inversion_scaffolds):
        out = correct_spurious_inversions(inversion_scaffolds, "cis")
        assert len(out["scaffold1"]) == len(
            inversion_scaffolds["scaffold1"]
        )
        # only orientation may change
        for a, b in zip(out["scaffold1"], inversion_scaffolds["scaffold1"]):
            assert a[:4] == b[:4]

    def test_reorient_preserves_bin_count(self):
        sc = {"s": [["a", 2, 20, 30, 1], ["a", 0, 0, 10, -1], ["b", 0, 0, 5, 1]]}
        out = reorient_consecutive_blocks(sc)
        assert len(out["s"]) == 3

    def test_find_lost_dna_no_gap(self, tmp_path):
        from instagraal_tpu.io.fasta import write_fasta as wf

        fasta = tmp_path / "r.fa"
        wf({"c1": "A" * 50}, fasta)
        # whole contig covered (inclusive end removal covers 0..50)
        lost = find_lost_dna(fasta, {"s": [["c1", 0, 0, 50, 1]]})
        assert "c1" not in lost or lost["c1"] == []


class TestCliReincorporation:
    def test_reincorporation_mode(self, tmp_path):
        from click.testing import CliRunner

        from instagraal_tpu.cli import polish as polish_cli
        from instagraal_tpu.io.fasta import write_fasta as wf

        fasta = tmp_path / "ref.fa"
        wf({"c1": "ACGT" * 50}, fasta)
        info = tmp_path / "info.txt"
        write_info_frags({"s1": [["c1", 0, 0, 99, 1]]}, info)
        out = tmp_path / "out"
        result = CliRunner().invoke(
            polish_cli.main,
            ["-i", str(info), "-f", str(fasta), "-o", str(out),
             "-m", "reincorporation"],
        )
        assert result.exit_code == 0, result.output
        back = parse_info_frags(out / "new_info_frags.txt")
        total = sum(len(v) for v in back.values())
        assert total >= 2  # lost chunk reincorporated or appended
