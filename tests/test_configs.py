"""Tests for the BASELINE.json run configurations.

#1 (pre + level-2 MCMC on bundled data) is covered by test_sampler;
#2 (single-enzyme + polish) by test_cli/test_polish; #5 (sharded
multi-host) by test_parallel. This file covers #3 (multi-enzyme pyramid
with restart from cache) and #4 (circular mode).
"""

import numpy as np


class TestMultiEnzymeRestart:
    def test_multi_enzyme_pre_and_cached_pyramid(
        self, toy_assembly, tmp_path_factory
    ):
        from instagraal_tpu.pre import run_pre
        from instagraal_tpu.pyramid import build_and_filter

        out = tmp_path_factory.mktemp("me")
        stats = run_pre(
            toy_assembly["fasta"],
            toy_assembly["pairs"],
            ["DpnII", "HinfI"],
            out / "hic",
            plot=False,
        )
        # two enzymes cut more often than one
        from instagraal_tpu.io.digest import digest_genome
        from instagraal_tpu.io.fasta import read_fasta

        records = read_fasta(toy_assembly["fasta"])
        single = len(digest_genome(records, ["DpnII"]))
        assert stats["n_frags"] > single

        pyr1 = build_and_filter(
            out / "hic", size_pyramid=3, output_folder=out / "p"
        )
        # mutate nothing; rebuild must come from cache (fast) and agree
        pyr2 = build_and_filter(
            out / "hic", size_pyramid=3, output_folder=out / "p"
        )
        for lvl in range(3):
            assert len(pyr1.frags[lvl]) == len(pyr2.frags[lvl])


class TestCircularMode:
    def test_circular_scaffolder_runs(self, toy_pre, tmp_path_factory):
        from instagraal_tpu.sampler import Scaffolder

        out = tmp_path_factory.mktemp("circ")
        scaf = Scaffolder(
            "toy", toy_pre["dir"], toy_pre["fasta"], level=2,
            output_folder=out, seed=0, size_pyramid=4, circular=True,
        )
        # every contig marked circular (reference instagraal.py:569-570)
        assert (np.asarray(scaf.sampler.state.circ) == 1).all()
        scaf.full_em(n_cycles=1)
        assert (scaf.out / "genome.fasta").exists()
        lls = np.loadtxt(scaf.out / "list_likelihood.txt")
        assert np.isfinite(lls).all()
