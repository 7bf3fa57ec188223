"""Yeast-scale integration test (the reference's GPU CI scenario).

Mirrors reference tests/test_instagraal_gpu.py: runs the scaffolder on
the real 12.4 Mb in-silico-fragmented S. cerevisiae assembly (146
contigs) with simulated Hi-C pairs, at level 5 for 2 cycles from a
bombed genome, and asserts every output artefact plus the
scaffold-quality gate (large contigs recovered).

Slow (~ minutes); run with -m slow or INSTAGRAAL_TPU_SLOW=1.
"""

import os
import pathlib

import numpy as np
import pytest

# CI can point this at any yeast-scale contig assembly with
# true-coordinate headers (e.g. one written by
# instagraal_tpu.testing.make_toy_genome at 16 x 750 kb scale)
YEAST_CONTIGS = pathlib.Path(
    os.environ.get(
        "INSTAGRAAL_TPU_YEAST_FA",
        "/root/reference/tests/data/yeast.contigs.fa.gz",
    )
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not YEAST_CONTIGS.exists() and not os.environ.get("INSTAGRAAL_TPU_SLOW"),
        reason="yeast contigs not available",
    ),
]

CYCLES = 2
LEVEL = 5


@pytest.fixture(scope="module")
def yeast_run(tmp_path_factory):
    from instagraal_tpu.pre import run_pre
    from instagraal_tpu.sampler import Scaffolder
    from instagraal_tpu.testing import simulate_pairs

    root = tmp_path_factory.mktemp("yeast")
    pairs = root / "yeast.pairs.gz"
    simulate_pairs(YEAST_CONTIGS, pairs, n_pairs=1_500_000, seed=3)
    hic = root / "hic"
    run_pre(YEAST_CONTIGS, pairs, ["DpnII"], hic, plot=False)
    scaf = Scaffolder(
        "hic",
        hic,
        YEAST_CONTIGS,
        level=LEVEL,
        output_folder=root / "out",
        seed=0,
        engine="scan",
    )
    scaf.full_em(n_cycles=CYCLES, bomb=True)
    return {"scaf": scaf, "root": root, "pairs": pairs}


class TestYeastScaffolding:
    def test_artifacts_exist(self, yeast_run):
        out = yeast_run["scaf"].out
        for name in (
            "genome.fasta",
            "info_frags.txt",
            "list_likelihood.txt",
            "list_n_contigs.txt",
            "list_mutations.txt",
        ):
            assert (out / name).exists(), name
        for j in range(CYCLES):
            assert (out / f"save_simu_step_{j}.txt").exists()

    def test_trace_lengths(self, yeast_run):
        scaf = yeast_run["scaf"]
        n = scaf.sampler.n_frags
        lls = np.loadtxt(scaf.out / "list_likelihood.txt")
        assert len(lls) == CYCLES * n
        muts = (scaf.out / "list_mutations.txt").read_text().splitlines()
        assert len(muts) == CYCLES * n + 1

    def test_likelihood_improves(self, yeast_run):
        scaf = yeast_run["scaf"]
        lls = np.loadtxt(scaf.out / "list_likelihood.txt")
        assert lls[-1] > lls[0]

    def test_quality_gate_large_contigs(self, yeast_run):
        """Reference gate: 15-45 contigs > 100 kb after 2 cycles from a
        bombed genome (test_instagraal_gpu.py:60-61) — the same band the
        reference CI asserts on an RTX 4090. S. cerevisiae has 16
        chromosomes, so a good 2-cycle draft lands in the teens-to-40s
        (measured here: 16 large / 43 total on the bench pipeline)."""
        from instagraal_tpu.io.fasta import read_fasta

        scaf = yeast_run["scaf"]
        records = read_fasta(scaf.out / "genome.fasta")
        large = [s for s in records.values() if len(s) > 100_000]
        assert 15 <= len(large) <= 45, f"{len(large)} contigs > 100kb"
        assert scaf.sampler.n_contigs < scaf.sampler.n_frags / 2

    def test_genome_mass_preserved(self, yeast_run):
        from instagraal_tpu.io.fasta import read_fasta

        scaf = yeast_run["scaf"]
        total = sum(len(s) for s in read_fasta(scaf.out / "genome.fasta").values())
        source = sum(
            len(s) for s in read_fasta(YEAST_CONTIGS).values()
        )
        # filtered fragments may drop some sequence; most must survive
        assert total > 0.7 * source

    def test_polish_and_post_chain(self, yeast_run, tmp_path_factory):
        """Chain polish + post on the scaffolder output (reference
        test_instagraal_gpu.py:663-877)."""
        from click.testing import CliRunner

        from instagraal_tpu.cli import polish as polish_cli
        from instagraal_tpu.post import run_post

        scaf = yeast_run["scaf"]
        out = tmp_path_factory.mktemp("yeast_polish")
        runner = CliRunner()
        result = runner.invoke(
            polish_cli.main,
            [
                "-i",
                str(scaf.out / "info_frags.txt"),
                "-f",
                str(YEAST_CONTIGS),
                "-o",
                str(out),
            ],
        )
        assert result.exit_code == 0, result.output
        assert (out / "polished_genome.fa").exists()

        post_out = tmp_path_factory.mktemp("yeast_post")
        stats = run_post(
            yeast_run["pairs"],
            out / "new_info_frags.txt",
            post_out,
            resolutions="50000",
            plot=False,
            balance=False,
        )
        assert stats["remapped"] > 0.5 * 1_500_000
        assert stats["mcool"].exists()
