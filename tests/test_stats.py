"""Tests for assembly statistics (reference test_assembly_stats.py scope)."""

import gzip

import pytest

from instagraal_tpu.io.fasta import write_fasta
from instagraal_tpu.stats import (
    compare_assemblies,
    compute_assembly_stats,
    format_comparison_table,
    format_stats_table,
)


def make_fasta(tmp_path, lengths, name="a.fa", gc=0.5):
    records = {}
    for i, ln in enumerate(lengths):
        n_gc = int(ln * gc)
        seq = "G" * n_gc + "A" * (ln - n_gc)
        records[f"c{i}"] = seq
    path = tmp_path / name
    write_fasta(records, path)
    return path


class TestN50:
    def test_single_contig(self, tmp_path):
        s = compute_assembly_stats(make_fasta(tmp_path, [1000]))
        assert s["n50"] == 1000
        assert s["l50"] == 1
        assert s["n90"] == 1000
        assert s["l90"] == 1

    def test_equal_contigs(self, tmp_path):
        s = compute_assembly_stats(make_fasta(tmp_path, [100] * 10))
        assert s["n50"] == 100
        assert s["l50"] == 5
        assert s["n90"] == 100
        assert s["l90"] == 9

    def test_classic_example(self, tmp_path):
        # lengths 80, 70, 50, 40, 30, 20 -> total 290, half 145
        # cumsum: 80, 150 -> N50 = 70, L50 = 2
        s = compute_assembly_stats(
            make_fasta(tmp_path, [80, 70, 50, 40, 30, 20])
        )
        assert s["n50"] == 70
        assert s["l50"] == 2

    def test_n90(self, tmp_path):
        # total 290, 90% = 261; cumsum 80,150,200,240,270 -> N90=30, L90=5
        s = compute_assembly_stats(
            make_fasta(tmp_path, [80, 70, 50, 40, 30, 20])
        )
        assert s["n90"] == 30
        assert s["l90"] == 5

    def test_order_invariant(self, tmp_path):
        a = compute_assembly_stats(
            make_fasta(tmp_path, [20, 80, 40, 70, 30, 50], "x.fa")
        )
        b = compute_assembly_stats(
            make_fasta(tmp_path, [80, 70, 50, 40, 30, 20], "y.fa")
        )
        for k in ("n50", "l50", "n90", "l90", "total_length"):
            assert a[k] == b[k]


class TestBasicMetrics:
    def test_lengths(self, tmp_path):
        s = compute_assembly_stats(make_fasta(tmp_path, [100, 300, 200]))
        assert s["n_contigs"] == 3
        assert s["total_length"] == 600
        assert s["max_length"] == 300
        assert s["min_length"] == 100
        assert s["mean_length"] == 200
        assert s["median_length"] == 200

    def test_gc(self, tmp_path):
        s = compute_assembly_stats(make_fasta(tmp_path, [1000], gc=0.25))
        assert s["gc_content"] == pytest.approx(0.25, abs=1e-3)

    def test_gc_weighted_by_length(self, tmp_path):
        records = {"a": "G" * 900, "b": "A" * 100}
        path = tmp_path / "w.fa"
        write_fasta(records, path)
        s = compute_assembly_stats(path)
        assert s["gc_content"] == pytest.approx(0.9)

    def test_empty_assembly(self, tmp_path):
        path = tmp_path / "empty.fa"
        path.write_text("")
        s = compute_assembly_stats(path)
        assert s["n_contigs"] == 0
        assert s["total_length"] == 0
        assert s["n50"] == 0

    def test_gzip_input(self, tmp_path):
        path = tmp_path / "z.fa.gz"
        with gzip.open(path, "wt") as fh:
            fh.write(">a\nACGT\n")
        s = compute_assembly_stats(path)
        assert s["total_length"] == 4


class TestFormatting:
    def test_single_table(self, tmp_path):
        s = compute_assembly_stats(make_fasta(tmp_path, [100, 200]))
        out = format_stats_table(s, "my assembly")
        assert "my assembly" in out
        assert "N50" in out
        assert "300" in out

    def test_comparison_table(self, tmp_path):
        s1 = compute_assembly_stats(make_fasta(tmp_path, [100], "a.fa"))
        s2 = compute_assembly_stats(make_fasta(tmp_path, [500], "b.fa"))
        out = format_comparison_table([s1, s2], ["draft", "scaffolded"])
        assert "draft" in out and "scaffolded" in out
        lines = out.splitlines()
        assert len(lines) == 2 + 11  # header + rule + 11 metric rows

    def test_compare_assemblies_prints(self, tmp_path, capsys):
        p1 = make_fasta(tmp_path, [100], "a.fa")
        p2 = make_fasta(tmp_path, [200], "b.fa")
        compare_assemblies([p1, p2])
        out = capsys.readouterr().out
        assert "N50" in out
