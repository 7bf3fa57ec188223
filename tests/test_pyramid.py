"""Tests for pyramid construction and level loading."""

import numpy as np
import pandas as pd
import pytest

from instagraal_tpu.pyramid import build_and_filter
from instagraal_tpu.pyramid.build import (
    _aggregate_coo,
    subsample_data_set,
)


@pytest.fixture(scope="session")
def toy_pyramid(toy_pre, tmp_path_factory):
    out = tmp_path_factory.mktemp("pyr")
    pyr = build_and_filter(
        toy_pre["dir"], size_pyramid=4, factor=3, thresh_factor=1,
        output_folder=out,
    )
    return {"pyramid": pyr, "out": out, **toy_pre}


class TestBuild:
    def test_folder_layout(self, toy_pyramid):
        out = toy_pyramid["out"]
        assert (out / "pyramids" / "pyramid_1_no_thresh").exists()
        root = out / "pyramids" / "pyramid_4_thresh_auto"
        for i in range(4):
            lvl = root / f"level_{i}"
            assert (lvl / f"{i}_fragments_list.txt").exists()
            assert (lvl / f"{i}_contig_info.txt").exists()
            assert (lvl / f"{i}_abs_frag_contacts.txt").exists()
        for i in range(3):
            assert (
                root / f"level_{i}" / f"{i}_sub_2_super_index_frag.txt"
            ).exists()

    def test_level_counts_decrease(self, toy_pyramid):
        pyr = toy_pyramid["pyramid"]
        counts = [len(pyr.frags[i]) for i in range(4)]
        assert counts[0] > counts[1] > counts[2] >= counts[3]
        # roughly 3x per level
        assert counts[0] / counts[1] == pytest.approx(3, rel=0.4)

    def test_level_soa_invariants(self, toy_pyramid):
        lvl = toy_pyramid["pyramid"].get_level(1)
        soa = lvl.S_o_A_frags
        n = lvl.n_frags
        assert all(len(v) == n for v in soa.values())
        # pos is 0-based per contig, l_cont consistent
        for cid in np.unique(soa["id_c"]):
            members = np.flatnonzero(soa["id_c"] == cid)
            assert sorted(soa["pos"][members].tolist()) == list(
                range(len(members))
            )
            assert (soa["l_cont"][members] == len(members)).all()
            assert (
                soa["l_cont_bp"][members] == soa["len_bp"][members].sum()
            ).all()
            # linked list consistent
            order = members[np.argsort(soa["pos"][members])]
            assert soa["prev"][order[0]] == -1
            assert soa["next"][order[-1]] == -1
            assert (soa["next"][order[:-1]] == order[1:]).all()
            assert (soa["prev"][order[1:]] == order[:-1]).all()
        # sub_pos is exclusive cumsum of sub_len per contig
        for cid in np.unique(soa["id_c"]):
            members = np.flatnonzero(soa["id_c"] == cid)
            order = members[np.argsort(soa["pos"][members])]
            expect = np.concatenate(
                [[0], np.cumsum(soa["sub_len"][order[:-1]])]
            )
            assert (soa["sub_pos"][order] == expect).all()
            assert soa["sub_l_cont"][order[0]] == soa["sub_len"][order].sum()

    def test_contact_mass_preserved_across_levels(self, toy_pyramid):
        pyr = toy_pyramid["pyramid"]
        sums = [
            pyr.get_level(i).sparse_mat_csr.sum() for i in range(4)
        ]
        assert len(set(int(s) for s in sums)) == 1

    def test_mean_value_trans_positive(self, toy_pyramid):
        lvl = toy_pyramid["pyramid"].get_level(1)
        assert lvl.mean_value_trans > 0

    def test_resumable(self, toy_pyramid, toy_pre):
        # re-running on the same output folder reuses cached levels
        pyr2 = build_and_filter(
            toy_pre["dir"], size_pyramid=4, factor=3, thresh_factor=1,
            output_folder=toy_pyramid["out"],
        )
        assert len(pyr2.frags[0]) == len(toy_pyramid["pyramid"].frags[0])

    def test_zoom_navigation(self, toy_pyramid):
        pyr = toy_pyramid["pyramid"]
        subs = pyr.zoom_in_frag((1, 1))
        assert all(lv == 0 for _, lv in subs)
        assert 1 <= len(subs) <= 3
        up = pyr.zoom_out_frag((subs[0][0], 0))
        assert up == (1, 1)


class TestSubsample:
    def test_small_contig_not_binned(self, tmp_path):
        # contig with 2 frags stays 1:1 at factor 3
        frags = pd.DataFrame(
            {
                "id": [1, 2, 1, 2, 3, 4],
                "chrom": ["a", "a", "b", "b", "b", "b"],
                "start_pos": [0, 10, 0, 5, 15, 30],
                "end_pos": [10, 20, 5, 15, 30, 50],
                "size": [10, 10, 5, 10, 15, 20],
                "gc_content": [0.5] * 6,
                "accu_frag": [1] * 6,
                "frag_start": [1, 2, 1, 2, 3, 4],
                "frag_end": [1, 2, 1, 2, 3, 4],
            }
        )
        cinfo = pd.DataFrame(
            {
                "contig": ["a", "b"],
                "length_kb": [20, 50],
                "n_frags": [2, 4],
                "cumul_length": [0, 2],
            }
        )
        contacts = "id_frag_a\tid_frag_b\tn_contact\n0\t1\t5\n2\t3\t2\n4\t5\t1\n"
        fl = tmp_path / "frags.txt"
        ci = tmp_path / "cinfo.txt"
        ab = tmp_path / "abs.txt"
        frags.to_csv(fl, sep="\t", index=False)
        cinfo.to_csv(ci, sep="\t", index=False)
        ab.write_text(contacts)
        n_new = subsample_data_set(
            ci, fl, 3, ab,
            tmp_path / "new_abs.txt", 1,
            tmp_path / "new_ci.txt", tmp_path / "new_fl.txt",
            tmp_path / "s2s.txt",
        )
        # a: 2 frags -> 2 (not binned); b: 4 frags -> groups {1,2,3},{4}
        assert n_new == 4
        out = pd.read_csv(tmp_path / "new_fl.txt", sep="\t")
        assert out["id"].tolist() == [1, 2, 1, 2]
        b1 = out.iloc[2]
        assert b1["start_pos"] == 0 and b1["end_pos"] == 30
        assert b1["accu_frag"] == 3
        assert b1["sub_frag_start"] == 3 and b1["sub_frag_end"] == 5
        # contacts rebinned: (0,1)->(0,1), (2,3)->(2,2), (4,5)->(2,3)
        newc = pd.read_csv(tmp_path / "new_abs.txt", sep="\t")
        got = {
            (r[0], r[1]): r[2] for r in newc.to_numpy()
        }
        assert got == {(0, 1): 5, (2, 2): 2, (2, 3): 1}

    def test_aggregate_coo_symmetrizes(self):
        out = _aggregate_coo(
            np.array([3, 1, 1]), np.array([1, 3, 2]), np.array([2, 5, 1])
        )
        got = {(r.fa, r.fb): r.nc for r in out.itertuples(index=False)}
        assert got == {(1, 3): 7, (1, 2): 1}


class TestFilter:
    def test_short_frags_merged(self, toy_pyramid):
        # all level-0 fragments after filtering are >= 50bp or merged
        frags0 = toy_pyramid["pyramid"].frags[0]
        # merged spans must be contiguous within contigs
        for _c, grp in frags0.groupby("chrom", sort=False):
            assert (
                grp["start_pos"].to_numpy()[1:] == grp["end_pos"].to_numpy()[:-1]
            ).all()
