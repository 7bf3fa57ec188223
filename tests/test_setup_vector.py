"""Vectorized host-setup parity: bulk CSR implementations must match
the per-fragment loops they replaced (VERDICT r3 #5).

Reference loop implementations live here (lifted verbatim from the
round-3 code, with the neighbour-table tie order pinned to the
documented deterministic rule) and are compared element-wise against
the shipped vectorized versions on randomized problems.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from instagraal_tpu.sampler.device_sweep import NeighbourTable
from instagraal_tpu.sampler.setup import (
    build_sub_index,
    neighbour_distributions,
)


def _random_csr(n, density, seed, with_empty_rows=True):
    rng = np.random.default_rng(seed)
    m = sp.random(
        n, n, density=density, random_state=rng, format="csr",
        data_rvs=lambda s: rng.integers(1, 50, s).astype(np.float64),
    )
    if with_empty_rows:
        # force a few all-zero rows (contact-free fragments)
        kill = rng.choice(n, size=max(1, n // 50), replace=False)
        lil = m.tolil()
        lil[kill, :] = 0
        m = lil.tocsr()
        m.eliminate_zeros()
    return m


def _table_loop(level_csr, n_frags, k):
    """Round-3 per-fragment loop, tie order pinned to (count desc,
    id asc) — the rule the vectorized lexsort implements."""
    sym = (level_csr + level_csr.T).tocsr()
    ids = np.zeros((n_frags, k), dtype=np.int32)
    logits = np.full((n_frags, k), -np.inf, dtype=np.float32)
    for i in range(n_frags):
        s0, s1 = sym.indptr[i], sym.indptr[i + 1]
        xk = sym.indices[s0:s1]
        vk = sym.data[s0:s1].astype(np.float64)
        keep = (xk != i) & (vk != 0)
        xk, vk = xk[keep], vk[keep]
        if len(xk) == 0:
            take = np.random.default_rng(i).choice(
                n_frags, size=min(k, n_frags), replace=False
            )
            ids[i, : len(take)] = take
            logits[i, : len(take)] = 0.0
            continue
        top = np.lexsort((xk, -vk))[:k]
        ids[i, : len(top)] = xk[top]
        logits[i, : len(top)] = np.log(vk[top])
    return ids, logits


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k", [4, 32, 100])
def test_neighbour_table_matches_loop(seed, k):
    n = 300
    csr = _random_csr(n, 0.05, seed)
    ids_l, logits_l = _table_loop(csr, n, k)
    table = NeighbourTable.build(csr, n, k=k)
    np.testing.assert_array_equal(np.asarray(table.ids), ids_l)
    np.testing.assert_array_equal(np.asarray(table.logits), logits_l)


def test_neighbour_table_ties_break_to_smaller_id():
    # two partners with identical counts: smaller id must rank first
    m = sp.csr_matrix(
        np.array(
            [
                [0.0, 3.0, 3.0, 1.0],
                [0.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, 0.0, 0.0],
            ]
        )
    )
    t = NeighbourTable.build(m, 4, k=3)
    np.testing.assert_array_equal(np.asarray(t.ids)[0], [1, 2, 3])


class _Level:
    def __init__(self, csr):
        self.sparse_mat_csr = csr
        self.n_frags = csr.shape[0]


def _distri_loop(level):
    sym = (level.sparse_mat_csr + level.sparse_mat_csr.T).tocsr()
    out = []
    for i in range(level.n_frags):
        s0, s1 = sym.indptr[i], sym.indptr[i + 1]
        xk = sym.indices[s0:s1]
        vk = sym.data[s0:s1].astype(np.float64)
        hetero = xk != i
        xk, vk = xk[hetero], vk[hetero]
        if vk.sum() > 0:
            out.append({"xk": xk, "pk": vk / vk.sum()})
        else:
            out.append({"xk": None, "pk": None})
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_neighbour_distributions_match_loop(seed):
    level = _Level(_random_csr(250, 0.04, seed))
    loop = _distri_loop(level)
    lazy = neighbour_distributions(level)
    assert len(lazy) == len(loop)
    for i, ref in enumerate(loop):
        got = lazy[i]
        if ref["xk"] is None:
            assert got["xk"] is None and got["pk"] is None
        else:
            np.testing.assert_array_equal(got["xk"], ref["xk"])
            np.testing.assert_array_equal(got["pk"], ref["pk"])


class _SubLevel:
    def __init__(self, len_bp):
        self.S_o_A_frags = {"len_bp": len_bp}


class _FragTable:
    def __init__(self, lo, hi):
        import pandas as pd

        self._df = pd.DataFrame(
            {"sub_frag_start": lo + 1, "sub_frag_end": hi + 1}
        )

    @property
    def columns(self):
        return self._df.columns

    def __getitem__(self, key):
        return self._df[key]


class _TopLevel:
    def __init__(self, lo, hi):
        self._frag_table = _FragTable(lo, hi)


def _sub_index_loop(lo, hi, sub_len_bp):
    n_sub = len(sub_len_bp)
    frag_of_sub = np.zeros(n_sub, dtype=np.int32)
    j_of_sub = np.zeros(n_sub, dtype=np.int32)
    w_dist = np.zeros(n_sub, dtype=np.float32)
    c_dist = np.zeros(n_sub, dtype=np.float32)
    for f, (a, b) in enumerate(zip(lo, hi)):
        lens = sub_len_bp[a : b + 1]
        cum = np.cumsum(lens)
        before = cum - lens
        after = cum[-1] - cum
        frag_of_sub[a : b + 1] = f
        j_of_sub[a : b + 1] = np.arange(b - a + 1)
        w_dist[a : b + 1] = before + lens / 2.0
        c_dist[a : b + 1] = after + lens / 2.0
    return frag_of_sub, j_of_sub, w_dist, c_dist


def test_select_repeated_frags_detects_outliers():
    """Detection half of the reference's repeat machinery (the
    duplication half is formally out of scope — docs/PARITY.md
    'Repeat duplication' decision record): coverage outliers past
    mean + 3 sigma are surfaced, nothing else."""
    from instagraal_tpu.sampler.setup import select_repeated_frags

    n = 80
    rng = np.random.default_rng(0)
    m = sp.random(
        n, n, density=0.1, random_state=rng, format="lil",
        data_rvs=lambda s: np.ones(s),
    )
    m[7, :] = 40.0  # one massive-coverage row
    level = _Level(m.tocsr())
    out = select_repeated_frags(level)
    assert 7 in out
    assert len(out) <= 3


@pytest.mark.parametrize("seed", [0, 7])
def test_build_sub_index_matches_loop(seed):
    rng = np.random.default_rng(seed)
    n_frags = 120
    reps = rng.integers(1, 8, n_frags)
    hi = np.cumsum(reps) - 1
    lo = hi - reps + 1
    n_sub = int(reps.sum())
    len_bp_int = rng.integers(200, 20000, n_sub)
    sub_len_kb = len_bp_int.astype(np.float64) / 1000.0

    f_l, j_l, w_l, c_l = _sub_index_loop(lo, hi, sub_len_kb)
    idx, sub_len, host = build_sub_index(
        _TopLevel(lo, hi), _SubLevel(len_bp_int)
    )
    np.testing.assert_array_equal(np.asarray(idx.frag_of_sub), f_l)
    np.testing.assert_array_equal(np.asarray(idx.j_of_sub), j_l)
    np.testing.assert_array_equal(np.asarray(idx.w_dist), w_l)
    np.testing.assert_array_equal(np.asarray(idx.c_dist), c_l)
    np.testing.assert_array_equal(host["frag_of_sub"], f_l)
    np.testing.assert_array_equal(host["w_dist"], w_l)
