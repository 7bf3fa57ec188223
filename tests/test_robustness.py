"""Robustness tests: malformed inputs must fail cleanly or be skipped."""

import gzip

import pandas as pd

from instagraal_tpu.io.digest import digest_genome
from instagraal_tpu.io.fasta import read_fasta
from instagraal_tpu.io.pairs import pairs_to_pixels


class TestMalformedPairs:
    def _bins(self):
        return pd.DataFrame(
            {"chrom": ["c1"], "start": [0], "end": [100]}
        )

    def test_garbage_lines_skipped(self, tmp_path):
        path = tmp_path / "p.pairs"
        path.write_text(
            "#columns: readID chr1 pos1 chr2 pos2\n"
            "r1\tc1\tnot_a_number\tc1\t10\n"
            "truncated line\n"
            "r2\tc1\t5\tc1\t10\n"
        )
        pixels, total = pairs_to_pixels(path, self._bins())
        assert total == 1

    def test_empty_pairs_file(self, tmp_path):
        path = tmp_path / "empty.pairs"
        path.write_text("#columns: readID chr1 pos1 chr2 pos2\n")
        pixels, total = pairs_to_pixels(path, self._bins())
        assert total == 0
        assert len(pixels) == 0

    def test_native_and_pandas_agree_on_garbage(self, tmp_path):
        import os

        from instagraal_tpu.io import pairs as pio

        path = tmp_path / "p.pairs.gz"
        with gzip.open(path, "wt") as fh:
            fh.write("#columns: readID chr1 pos1 chr2 pos2\n")
            fh.write("r1\tc1\tXX\tc1\t10\n")
            fh.write("r2\tc1\t5\tc1\t10\n")
            fh.write("r3\tcZ\t5\tc1\t10\n")
        _, cols = pio.read_pairs_header(path)
        native = pio._pairs_to_pixels_native(path, self._bins(), cols)
        os.environ["INSTAGRAAL_TPU_NATIVE"] = "0"
        try:
            ppix, ptot = pio.pairs_to_pixels(path, self._bins())
        finally:
            del os.environ["INSTAGRAAL_TPU_NATIVE"]
        if native is not None:
            npix, ntot = native
            assert ntot == ptot == 1


class TestMalformedFasta:
    def test_empty_sequences_ok(self, tmp_path):
        path = tmp_path / "x.fa"
        path.write_text(">a\n\n>b\nACGT\n")
        rec = read_fasta(path)
        assert rec == {"a": "", "b": "ACGT"}

    def test_digest_empty_contig(self, tmp_path):
        bins = digest_genome({"a": "", "b": "GATCGATC"}, ["DpnII"])
        # empty contig contributes no fragments but must not crash
        assert (bins["chrom"] == "b").any()


class TestPolishEdgeCases:
    def test_empty_scaffold_dict(self):
        from instagraal_tpu.polish import (
            rearrange_intra_scaffolds,
            remove_spurious_insertions,
            reorient_consecutive_blocks,
        )

        assert remove_spurious_insertions({}) == {}
        assert rearrange_intra_scaffolds({}) == {}
        assert reorient_consecutive_blocks({}) == {}

    def test_single_bin_scaffold(self):
        from instagraal_tpu.polish import correct_spurious_inversions

        sc = {"s": [["a", 0, 0, 10, -1]]}
        assert correct_spurious_inversions(sc) == sc


class TestCliResume:
    def test_resume_flag_accepted(self, toy_pre, tmp_path):
        from click.testing import CliRunner

        from instagraal_tpu.cli import main as main_cli

        runner = CliRunner()
        out = tmp_path / "r"
        args = [
            str(toy_pre["dir"]),
            str(toy_pre["fasta"]),
            "-o",
            str(out),
            "-l",
            "2",
            "-n",
            "1",
            "--bomb",
        ]
        r1 = runner.invoke(main_cli.main, args)
        assert r1.exit_code == 0, r1.output
        r2 = runner.invoke(main_cli.main, [*args, "-n", "2", "--resume"])
        assert r2.exit_code == 0, r2.output
