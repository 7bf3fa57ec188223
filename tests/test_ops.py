"""Tests for the genome mutation operators.

Strategy: every operator's output is validated two ways —

1. full bookkeeping consistency: positions, bp offsets, sub positions,
   contig lengths and linked-list neighbours are recomputed from the
   fragment ordering and compared field by field;
2. ordering semantics: the expected contig orderings are derived with a
   simple Python list model and compared against the vectorized result.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from instagraal_tpu.core import FragState, ops
from instagraal_tpu.core.moves import (
    BLOCK_SIZES,
    N_MUTATIONS,
    all_candidate_states,
    renumber_contigs,
)
from instagraal_tpu.core.state import check_invariants, state_to_numpy


def make_state(contigs, len_bp=None, sub_len=None, circ=None):
    """Build a FragState from contig orderings.

    contigs: list of lists of (frag_id, ori) tuples; fragment ids must be
    a permutation of 0..n-1.
    """
    n = sum(len(c) for c in contigs)
    f = {
        k: np.zeros(n, dtype=np.int32)
        for k in FragState._fields
    }
    len_bp = np.asarray(len_bp if len_bp is not None else 1000 + np.arange(n) * 10)
    sub_len = np.asarray(sub_len if sub_len is not None else 1 + (np.arange(n) % 3))
    circ = circ or [0] * len(contigs)
    f["len_bp"] = len_bp.astype(np.int32)
    f["sub_len"] = sub_len.astype(np.int32)
    f["id"] = np.arange(n, dtype=np.int32)
    f["id_d"] = np.arange(n, dtype=np.int32)
    f["activ"] = np.ones(n, dtype=np.int32)
    for cid, members in enumerate(contigs):
        ids = [m[0] for m in members]
        oris = [m[1] for m in members]
        bp = 0
        sp = 0
        for pos, (fid, ori) in enumerate(zip(ids, oris)):
            f["pos"][fid] = pos
            f["id_c"][fid] = cid
            f["start_bp"][fid] = bp
            f["sub_pos"][fid] = sp
            f["ori"][fid] = ori
            f["circ"][fid] = circ[cid]
            f["prev"][fid] = ids[pos - 1] if pos > 0 else (
                ids[-1] if circ[cid] else -1
            )
            f["next"][fid] = ids[pos + 1] if pos < len(ids) - 1 else (
                ids[0] if circ[cid] else -1
            )
            bp += int(len_bp[fid])
            sp += int(sub_len[fid])
        for fid in ids:
            f["l_cont"][fid] = len(ids)
            f["l_cont_bp"][fid] = bp
            f["sub_l_cont"][fid] = sp
    return FragState(**{k: jnp.asarray(v) for k, v in f.items()})


def genome_order(state):
    """state -> {contig_id: ([(frag, ori), ...], circ)} ordered by pos."""
    s = state_to_numpy(state)
    out = {}
    for cid in np.unique(s["id_c"]):
        m = np.flatnonzero(s["id_c"] == cid)
        order = m[np.argsort(s["pos"][m])]
        out[int(cid)] = (
            [(int(i), int(s["ori"][i])) for i in order],
            int(s["circ"][order[0]]),
        )
    return out


def assert_consistent(state):
    """Recompute all bookkeeping from the ordering and compare."""
    bad = check_invariants(state)
    assert not bad, bad
    s = state_to_numpy(state)
    for cid in np.unique(s["id_c"]):
        m = np.flatnonzero(s["id_c"] == cid)
        order = m[np.argsort(s["pos"][m])]
        circ = s["circ"][order[0]]
        assert (s["circ"][order] == circ).all(), "mixed circ flags"
        bp = 0
        sp = 0
        for k, fid in enumerate(order):
            assert s["start_bp"][fid] == bp, (cid, fid, "start_bp")
            assert s["sub_pos"][fid] == sp, (cid, fid, "sub_pos")
            bp += s["len_bp"][fid]
            sp += s["sub_len"][fid]
            exp_prev = order[k - 1] if k > 0 else (order[-1] if circ else -1)
            exp_next = (
                order[k + 1]
                if k < len(order) - 1
                else (order[0] if circ else -1)
            )
            assert s["prev"][fid] == exp_prev, (cid, fid, "prev")
            assert s["next"][fid] == exp_next, (cid, fid, "next")
        assert (s["l_cont_bp"][order] == bp).all(), (cid, "l_cont_bp")
        assert (s["sub_l_cont"][order] == sp).all(), (cid, "sub_l_cont")


# a 3-contig genome: [0,1,2,3,4], [5,6,7], [8]
def base_state(**kw):
    return make_state(
        [
            [(0, 1), (1, 1), (2, -1), (3, 1), (4, 1)],
            [(5, 1), (6, 1), (7, -1)],
            [(8, 1)],
        ],
        **kw,
    )


class TestPopOut:
    @pytest.mark.parametrize("idf", [0, 2, 4, 5, 7])
    def test_interior_and_ends(self, idf):
        st = base_state()
        out = ops.pop_out(st, idf, max_id=2)
        assert_consistent(out)
        g = genome_order(out)
        assert g[3][0] == [(idf, 1)]  # new singleton, watson
        # original contig keeps relative order minus idf
    def test_order_preserved(self):
        st = base_state()
        out = ops.pop_out(st, 2, max_id=2)
        g = genome_order(out)
        assert [f for f, _ in g[0][0]] == [0, 1, 3, 4]

    def test_singleton_identity(self):
        st = base_state()
        out = ops.pop_out(st, 8, max_id=2)
        assert genome_order(out) == genome_order(st)

    def test_pair_contig(self):
        st = make_state([[(0, 1), (1, -1)]])
        out = ops.pop_out(st, 0, max_id=0)
        assert_consistent(out)
        g = genome_order(out)
        assert g[1][0] == [(0, 1)]
        assert g[0][0] == [(1, -1)]

    def test_circular(self):
        st = make_state([[(0, 1), (1, 1), (2, 1), (3, 1)]], circ=[1])
        out = ops.pop_out(st, 1, max_id=0)
        assert_consistent(out)
        g = genome_order(out)
        # ring reconnects around the gap and stays circular
        assert g[0][1] == 1
        assert [f for f, _ in g[0][0]] == [0, 2, 3]


class TestFlip:
    def test_flip(self):
        st = base_state()
        out = ops.flip(st, 2)
        g = genome_order(out)
        assert g[0][0][2] == (2, 1)  # was -1
        assert_consistent(out)


class TestPopIn:
    def _popped(self, st, idf, max_id=2):
        return ops.pop_out(st, idf, max_id), idf

    @pytest.mark.parametrize("ori", [1, -1])
    def test_pop_in_1_splits_left(self, ori):
        st = base_state()
        popped, a = self._popped(st, 0)
        m2 = int(jnp.max(popped.id_c))
        out = ops.pop_in_1(popped, a, 6, m2, ori)
        assert_consistent(out)
        g = genome_order(out)
        orders = sorted(
            tuple(f for f, _ in v[0]) for v in g.values()
        )
        # contig [5,6,7] split into [5] and [0,6,7]
        assert (0, 6, 7) in orders
        assert (5,) in orders
        new_cid = [c for c, v in g.items() if v[0][0][0] == 0][0]
        assert g[new_cid][0][0] == (0, ori)

    @pytest.mark.parametrize("ori", [1, -1])
    def test_pop_in_2_splits_right(self, ori):
        st = base_state()
        popped, a = self._popped(st, 0)
        m2 = int(jnp.max(popped.id_c))
        out = ops.pop_in_2(popped, a, 6, m2, ori)
        assert_consistent(out)
        g = genome_order(out)
        orders = sorted(tuple(f for f, _ in v[0]) for v in g.values())
        # contig [5,6,7] -> [5,6,0] and [7]
        assert (5, 6, 0) in orders
        assert (7,) in orders

    @pytest.mark.parametrize("ori", [1, -1])
    def test_pop_in_3_no_split(self, ori):
        st = base_state()
        popped, a = self._popped(st, 0)
        m2 = int(jnp.max(popped.id_c))
        out = ops.pop_in_3(popped, a, 6, m2, ori)
        assert_consistent(out)
        g = genome_order(out)
        orders = sorted(tuple(f for f, _ in v[0]) for v in g.values())
        assert (5, 6, 0, 7) in orders

    def test_pop_in_3_circular(self):
        st = make_state([[(0, 1), (1, 1), (2, 1)], [(3, 1)]], circ=[1, 0])
        out = ops.pop_in_3(st, 3, 1, 1, -1)
        assert_consistent(out)
        g = genome_order(out)
        assert g[0][1] == 1
        assert g[0][0] == [(0, 1), (1, 1), (3, -1), (2, 1)]

    def test_pop_in_1_circular(self):
        st = make_state([[(0, 1), (1, 1), (2, 1)], [(3, 1)]], circ=[1, 0])
        out = ops.pop_in_1(st, 3, 1, 1, 1)
        assert_consistent(out)
        g = genome_order(out)
        # linearized: [3, 1, 2, 0]
        assert g[0][1] == 0
        assert [f for f, _ in g[0][0]] == [3, 1, 2, 0]

    def test_pop_in_2_circular(self):
        st = make_state([[(0, 1), (1, 1), (2, 1)], [(3, 1)]], circ=[1, 0])
        out = ops.pop_in_2(st, 3, 1, 1, 1)
        assert_consistent(out)
        g = genome_order(out)
        # linearized starting after B=1: [2, 0, 1, 3]
        assert g[0][1] == 0
        assert [f for f, _ in g[0][0]] == [2, 0, 1, 3]


class TestSplit:
    def test_split_upstream(self):
        st = base_state()
        out = ops.split_contig(st, 2, 1, 2)
        assert_consistent(out)
        g = genome_order(out)
        orders = sorted(tuple(f for f, _ in v[0]) for v in g.values())
        assert (0, 1) in orders and (2, 3, 4) in orders

    def test_split_downstream(self):
        st = base_state()
        out = ops.split_contig(st, 2, 0, 2)
        assert_consistent(out)
        g = genome_order(out)
        orders = sorted(tuple(f for f, _ in v[0]) for v in g.values())
        assert (0, 1, 2) in orders and (3, 4) in orders

    def test_split_at_head_upstream_noop_like(self):
        st = base_state()
        out = ops.split_contig(st, 0, 1, 2)
        assert_consistent(out)
        # splitting before the head: head part empty -> whole contig moves
        g = genome_order(out)
        orders = sorted(tuple(f for f, _ in v[0]) for v in g.values())
        assert (0, 1, 2, 3, 4) in orders

    @pytest.mark.parametrize("up", [0, 1])
    def test_split_circular(self, up):
        st = make_state([[(0, 1), (1, 1), (2, 1), (3, 1)]], circ=[1])
        out = ops.split_contig(st, 1, up, 0)
        assert_consistent(out)
        g = genome_order(out)
        assert len(g) == 1
        (members, circ) = list(g.values())[0]
        assert circ == 0
        ids = [f for f, _ in members]
        if up == 1:
            assert ids == [1, 2, 3, 0]
        else:
            assert ids == [2, 3, 0, 1]


class TestPaste:
    def test_tail_head(self):
        st = base_state()
        out = ops.paste_contigs(st, 4, 5, 2)
        assert_consistent(out)
        g = genome_order(out)
        merged = [v for v in g.values() if len(v[0]) == 8][0][0]
        assert [f for f, _ in merged] == [0, 1, 2, 3, 4, 5, 6, 7]

    def test_head_head_reverses_A(self):
        st = base_state()
        out = ops.paste_contigs(st, 0, 5, 2)
        assert_consistent(out)
        g = genome_order(out)
        merged = [v for v in g.values() if len(v[0]) == 8][0][0]
        assert [f for f, _ in merged] == [4, 3, 2, 1, 0, 5, 6, 7]
        # contig A reversed: orientations flipped
        assert merged[3] == (1, -1)
        assert merged[2] == (2, 1)  # was -1

    def test_tail_tail_reverses_B(self):
        st = base_state()
        out = ops.paste_contigs(st, 4, 7, 2)
        assert_consistent(out)
        g = genome_order(out)
        merged = [v for v in g.values() if len(v[0]) == 8][0][0]
        assert [f for f, _ in merged] == [0, 1, 2, 3, 4, 7, 6, 5]
        assert merged[5] == (7, 1)  # was -1, flipped

    def test_circularize(self):
        st = make_state([[(0, 1), (1, 1), (2, 1)]])
        out = ops.paste_contigs(st, 0, 2, 0)
        assert_consistent(out)
        g = genome_order(out)
        assert g[0][1] == 1

    def test_same_contig_not_ends_identity(self):
        st = base_state()
        out = ops.paste_contigs(st, 1, 3, 2)
        assert genome_order(out) == genome_order(st)


class TestBlocks:
    def test_get_bounds_shapes(self):
        st = base_state()
        valid, f_up, f_down = ops.get_bounds(
            st, 2, 6, jnp.asarray(BLOCK_SIZES)
        )
        assert valid.shape == (12,)
        assert f_up.shape == (6,)

    def test_extract_insert_downstream(self):
        # extract [2..3] from contig 0 and insert after frag 6
        st = base_state()
        ext = ops.extract_block(st, 2, 3, 0, 2)
        assert_consistent(ext)
        g = genome_order(ext)
        orders = sorted(tuple(f for f, _ in v[0]) for v in g.values())
        assert (0, 1, 4) in orders and (2, 3) in orders
        out = ops.insert_block(ext, st, 2, 6, 3, 0, 1)
        assert_consistent(out)
        g2 = genome_order(out)
        orders2 = sorted(tuple(f for f, _ in v[0]) for v in g2.values())
        assert (5, 6, 2, 3, 7) in orders2

    def test_extract_insert_upstream_reversed(self):
        # upstream block [1..2] (cut at 1), inserted reversed after 6
        st = base_state()
        ext = ops.extract_block(st, 2, 1, 1, 2)
        assert_consistent(ext)
        out = ops.insert_block(ext, st, 2, 6, 1, 1, 1)
        assert_consistent(out)
        g2 = genome_order(out)
        orders2 = {
            tuple(f for f, _ in v[0]): v[0] for v in g2.values()
        }
        assert (5, 6, 2, 1, 7) in orders2
        merged = orders2[(5, 6, 2, 1, 7)]
        # block orientations flipped
        assert merged[2] == (2, 1)  # was -1
        assert merged[3] == (1, -1)  # was +1

    def test_invalid_bound_falls_back(self):
        st = base_state()
        ext = ops.extract_block(st, 2, -1, 1, 2)
        assert genome_order(ext) == genome_order(st)
        out = ops.insert_block(ext, st, 2, 6, -1, 1, -1)
        assert genome_order(out) == genome_order(st)


class TestExplodeRenumber:
    def test_explode(self):
        st = base_state()
        order = jnp.asarray(np.random.default_rng(0).permutation(9))
        out = ops.explode_genome(st, order)
        assert_consistent(out)
        g = genome_order(out)
        assert len(g) == 9
        assert all(len(v[0]) == 1 for v in g.values())

    def test_renumber(self):
        st = base_state()
        out, n_contigs, mean_len = renumber_contigs(st)
        assert int(n_contigs) == 3
        assert float(mean_len) == 3.0
        s = state_to_numpy(out)
        # longest contig gets highest id
        assert (s["id_c"][:5] == 2).all()
        assert (s["id_c"][5:8] == 1).all()
        assert s["id_c"][8] == 0
        assert_consistent(out)


class TestAllCandidates:
    def test_shapes_and_consistency(self):
        st = base_state()
        stacked, valid = all_candidate_states(st, 2, 6, 2)
        assert stacked.pos.shape == (N_MUTATIONS, 9)
        assert valid.shape == (N_MUTATIONS,)
        import jax

        for k in range(N_MUTATIONS):
            if bool(valid[k]):
                sub = jax.tree.map(lambda a: a[k], stacked)
                assert_consistent(sub)

    def test_validity_rules(self):
        st = base_state()
        # B = singleton frag 8: pop-ins invalid
        _, valid = all_candidate_states(st, 2, 8, 2)
        assert not bool(valid[4]) and not bool(valid[7])
        assert bool(valid[8])  # transloc ok (contig A len > 1)
        # A = singleton frag 8: translocs invalid
        _, valid = all_candidate_states(st, 8, 2, 2)
        assert not bool(valid[8]) and not bool(valid[11])

    def test_random_chain_stays_consistent(self):
        """Apply 40 random accepted mutations; state must stay valid."""
        import jax

        rng = np.random.default_rng(3)
        st = make_state(
            [
                [(i, 1) for i in range(6)],
                [(i, 1) for i in range(6, 10)],
                [(10, 1), (11, 1)],
            ]
        )
        for step in range(40):
            st, n_contigs, _ = renumber_contigs(st)
            max_id = int(n_contigs) - 1
            a, b = rng.choice(12, size=2, replace=False)
            stacked, valid = all_candidate_states(st, int(a), int(b), max_id)
            choices = np.flatnonzero(np.asarray(valid))
            k = int(rng.choice(choices))
            st = jax.tree.map(lambda x: x[k], stacked)
            assert_consistent(st)


class TestBpOverflowGuard:
    def test_state_from_soa_rejects_over_2gb(self):
        """int32 bp bookkeeping overflows once contigs merge past 2^31
        bp; loading such an assembly must fail loudly (VERDICT r1 #9)."""
        import numpy as np
        import pytest

        from instagraal_tpu.core.state import state_from_soa

        n = 4
        soa = {
            "pos": np.zeros(n, dtype=np.int64),
            "sub_pos": np.zeros(n, dtype=np.int64),
            "id_c": np.arange(n, dtype=np.int64),
            "start_bp": np.zeros(n, dtype=np.int64),
            "len_bp": np.full(n, 600_000_000, dtype=np.int64),
            "sub_len": np.ones(n, dtype=np.int64),
            "circ": np.zeros(n, dtype=np.int64),
            "prev": np.full(n, -1, dtype=np.int64),
            "next": np.full(n, -1, dtype=np.int64),
            "l_cont": np.ones(n, dtype=np.int64),
            "sub_l_cont": np.ones(n, dtype=np.int64),
            "l_cont_bp": np.full(n, 600_000_000, dtype=np.int64),
        }
        with pytest.raises(OverflowError, match="2\\^31"):
            state_from_soa(soa)

        # just under the limit loads fine
        soa["len_bp"] = np.full(n, 500_000_000, dtype=np.int64)
        st = state_from_soa(soa)
        assert st.n_frags == n
