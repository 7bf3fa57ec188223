"""Tests for the Rippe model and Poisson likelihood engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from instagraal_tpu.model import (
    RippeParams,
    estimate_max_dist_intra,
    estimate_param_rippe,
    genome_log_likelihood,
    log10_poisson,
    nz_log_likelihood,
    rippe_contacts,
    zeros_log_likelihood,
)
from instagraal_tpu.model.fit import peval
from instagraal_tpu.model.likelihood import (
    LOG10_E,
    SubIndex,
    project_to_sub,
)

from test_ops import make_state


def ref_params(**kw):
    defaults = dict(
        kuhn=50.0, lm=9.6, slope=-1.5, d=2.0, d_max=300.0, fact=20.0,
        v_inter=0.05,
    )
    defaults.update(kw)
    return RippeParams.make(**defaults)


def np_rippe(s, p):
    """Float64 NumPy reference of the contact curve."""
    s = np.asarray(s, dtype=np.float64)
    val = (
        float(p.c1)
        * np.power(s, float(p.slope), where=s > 0, out=np.ones_like(s))
        * np.exp(
            (float(p.d) - 2.0)
            / (np.square(s * float(p.lm) / float(p.kuhn)) + float(p.d))
        )
        * float(p.fact)
    )
    out = np.where((s > 0) & (s < float(p.d_max)), val, 0.0)
    return np.maximum(out, float(p.v_inter))


def np_log10_poisson(ex, ob):
    """Float64 reference of the per-pixel scoring term."""
    import math

    if ex == 0:
        return 0.0
    if ob >= 15:
        return (
            ob * math.log10(ex)
            - ex
            - (ob * math.log10(ob) - ob + math.log10(math.sqrt(ob * 2 * math.pi)))
        )
    if ob > 0:
        n = int(ob)
        if n < 10:
            f = math.factorial(n)
        else:
            f = n**n * math.exp(-n) * math.sqrt(2 * math.pi * n)
        return ob * math.log10(ex) - ex - math.log10(f)
    return -ex


class TestRippe:
    def test_matches_reference_formula(self):
        p = ref_params()
        s = np.array([1.0, 5.0, 50.0, 150.0, 299.0])
        got = np.asarray(rippe_contacts(jnp.asarray(s, dtype=jnp.float32), p))
        expect = np_rippe(s, p)
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_floor_and_cutoff(self):
        p = ref_params()
        assert float(rippe_contacts(jnp.float32(400.0), p)) == pytest.approx(
            float(p.v_inter)
        )
        assert float(rippe_contacts(jnp.float32(0.0), p)) == pytest.approx(
            float(p.v_inter)
        )

    def test_monotone_decreasing_mid_range(self):
        p = ref_params()
        s = jnp.asarray(np.linspace(5, 250, 100), dtype=jnp.float32)
        v = np.asarray(rippe_contacts(s, p))
        assert (np.diff(v) <= 1e-7).all()


class TestLog10Poisson:
    @pytest.mark.parametrize("ob", [0, 1, 3, 9, 10, 14, 15, 40, 1000])
    @pytest.mark.parametrize("ex", [0.05, 1.0, 17.3])
    def test_matches_scalar_reference(self, ob, ex):
        got = float(log10_poisson(jnp.float32(ex), jnp.float32(ob)))
        expect = np_log10_poisson(ex, ob)
        assert got == pytest.approx(expect, rel=2e-5, abs=2e-5)

    def test_zero_expected(self):
        assert float(log10_poisson(jnp.float32(0.0), jnp.float32(5.0))) == 0.0

    def test_peak_location(self):
        # The reference scoring mixes log10 and natural units
        # (ob*log10(ex) - ex), so the maximizer is ex = ob*log10(e),
        # not ex = ob. Replicated faithfully.
        ob = 20.0
        exs = np.linspace(1, 60, 400)
        vals = [float(log10_poisson(jnp.float32(e), jnp.float32(ob))) for e in exs]
        assert exs[int(np.argmax(vals))] == pytest.approx(
            ob * LOG10_E, abs=0.5
        )


def simple_sub_setup(state, n_sub_per_frag=1):
    """Trivial sub-index: each fragment is its own single sub-fragment."""
    n = state.n_frags
    half = np.asarray(state.len_bp, dtype=np.float64) / 2000.0
    return SubIndex(
        frag_of_sub=jnp.arange(n, dtype=jnp.int32),
        w_dist=jnp.asarray(half, dtype=jnp.float32),
        c_dist=jnp.asarray(half, dtype=jnp.float32),
        j_of_sub=jnp.zeros(n, dtype=jnp.int32),
    )


class TestProjection:
    def test_identity_layout(self):
        st = make_state(
            [[(0, 1), (1, 1), (2, 1)]], sub_len=np.ones(3, dtype=int)
        )
        idx = simple_sub_setup(st)
        sub = project_to_sub(st, idx)
        np.testing.assert_array_equal(np.asarray(sub.pos), [0, 1, 2])
        np.testing.assert_array_equal(np.asarray(sub.l_cont), [3, 3, 3])
        # kb positions are start + half length
        expect = (
            np.asarray(st.start_bp) + np.asarray(st.len_bp) / 2.0
        ) / 1000.0
        np.testing.assert_allclose(np.asarray(sub.pos_bp), expect, rtol=1e-6)

    def test_multi_sub_orientation(self):
        # one fragment with 3 sub-fragments of 1kb each, flipped
        st = make_state(
            [[(0, 1)]], len_bp=np.array([3000]), sub_len=np.array([3])
        )
        idx = SubIndex(
            frag_of_sub=jnp.zeros(3, dtype=jnp.int32),
            w_dist=jnp.asarray([0.5, 1.5, 2.5], dtype=jnp.float32),
            c_dist=jnp.asarray([2.5, 1.5, 0.5], dtype=jnp.float32),
            j_of_sub=jnp.arange(3, dtype=jnp.int32),
        )
        sub = project_to_sub(st, idx)
        np.testing.assert_array_equal(np.asarray(sub.pos), [0, 1, 2])
        np.testing.assert_allclose(np.asarray(sub.pos_bp), [0.5, 1.5, 2.5])
        flipped = project_to_sub(st._replace(ori=-st.ori), idx)
        np.testing.assert_array_equal(np.asarray(flipped.pos), [2, 1, 0])
        np.testing.assert_allclose(
            np.asarray(flipped.pos_bp), [2.5, 1.5, 0.5]
        )


class TestLikelihood:
    def _setup(self, seed=0):
        rng = np.random.default_rng(seed)
        st = make_state(
            [
                [(i, 1) for i in range(5)],
                [(i, 1) for i in range(5, 8)],
            ],
            len_bp=rng.integers(5_000, 40_000, 8),
            sub_len=np.ones(8, dtype=int),
        )
        idx = simple_sub_setup(st)
        # random sparse upper-tri contacts
        rows, cols = np.triu_indices(8, k=1)
        counts = rng.poisson(3.0, len(rows))
        keep = counts > 0
        return st, idx, rows[keep], cols[keep], counts[keep]

    def test_brute_force_decomposition(self):
        """nz + zeros must equal the float64 per-pair brute force."""
        st, idx, rows, cols, counts = self._setup()
        p = ref_params(d_max=100.0)
        msf = 10.0
        n_sub = 8
        n_pix = n_sub * (n_sub - 1) / 2

        sub = project_to_sub(st, idx)
        got = float(
            nz_log_likelihood(
                sub,
                jnp.asarray(rows),
                jnp.asarray(cols),
                jnp.asarray(counts, dtype=jnp.float32),
                p,
                msf,
            )
        ) + float(zeros_log_likelihood(sub, p, msf, n_pix))

        # brute force over every pair
        s_sub = {k: np.asarray(v, dtype=np.float64) for k, v in sub._asdict().items()}
        ob = np.zeros((n_sub, n_sub))
        for r, c, d in zip(rows, cols, counts):
            ob[r, c] = d
        total = 0.0
        for i in range(n_sub):
            for j in range(i + 1, n_sub):
                cis = s_sub["id_c"][i] == s_sub["id_c"][j]
                if cis:
                    sz = abs(s_sub["pos"][i] - s_sub["pos"][j]) * msf
                    ex_z = float(np_rippe(sz, p))
                else:
                    ex_z = float(p.v_inter)
                if ob[i, j] > 0:
                    if cis:
                        skb = abs(s_sub["pos_bp"][i] - s_sub["pos_bp"][j])
                        ex = float(np_rippe(skb, p))
                    else:
                        ex = float(p.v_inter)
                    total += np_log10_poisson(ex, ob[i, j])
                else:
                    total += -ex_z * LOG10_E
        assert got == pytest.approx(total, rel=1e-4, abs=1e-3)

    def test_correct_order_scores_higher(self):
        """The true contiguous arrangement should beat a shuffled one."""
        rng = np.random.default_rng(1)
        n = 12
        st = make_state(
            [[(i, 1) for i in range(n)]],
            len_bp=np.full(n, 10_000),
            sub_len=np.ones(n, dtype=int),
        )
        idx = simple_sub_setup(st)
        p = ref_params(d_max=200.0, fact=2e6)
        msf = 10.0
        # observed contacts generated from the model on the true order
        rows, cols = np.triu_indices(n, k=1)
        dist = np.abs(rows - cols) * 10.0
        lam = np_rippe(dist, p)
        counts = rng.poisson(lam)
        keep = counts > 0
        args = (
            jnp.asarray(rows[keep]),
            jnp.asarray(cols[keep]),
            jnp.asarray(counts[keep], dtype=jnp.float32),
            p,
            msf,
            n * (n - 1) / 2,
        )
        ll_true = float(genome_log_likelihood(st, idx, *args))
        # shuffled arrangement
        perm = rng.permutation(n)
        st_shuf = make_state(
            [[(int(i), 1) for i in perm]],
            len_bp=np.full(n, 10_000),
            sub_len=np.ones(n, dtype=int),
        )
        ll_shuf = float(genome_log_likelihood(st_shuf, idx, *args))
        assert ll_true > ll_shuf

    def test_zeros_term_counts_pairs(self):
        # one contig of 4 frags + singleton; check n_intra bookkeeping
        st = make_state(
            [[(0, 1), (1, 1), (2, 1), (3, 1)], [(4, 1)]],
            len_bp=np.full(5, 10_000),
            sub_len=np.ones(5, dtype=int),
        )
        idx = simple_sub_setup(st)
        p = ref_params(v_inter=0.07, d_max=1e9, fact=0.0)
        # fact=0 -> cis expected floors to v_inter everywhere
        msf = 10.0
        got = float(zeros_log_likelihood(project_to_sub(st, idx), p, msf, 10.0))
        # every one of the 10 pairs contributes -v_inter
        assert got == pytest.approx(LOG10_E * 10 * -0.07, rel=1e-5)


class TestFit:
    def test_recovers_simulated_curve(self):
        x = np.linspace(3, 300, 60)
        true = [60.0, 9.6, -1.3, 2.0, 40.0]
        y = peval(x, [true[0], true[1], true[2], true[4]])
        fitted, y_est = estimate_param_rippe(y * 7.0, x)  # LOWER_FACT undone
        np.testing.assert_allclose(y_est, y, rtol=0.05)
        assert fitted[2] == pytest.approx(-1.3, abs=0.15)

    def test_nan_fallback(self):
        # constant data gives a degenerate (slope ~ 0) fit; the result
        # must still be finite via the fallback rescale
        x = np.linspace(1, 10, 10)
        out, y_est = estimate_param_rippe(np.ones(10), x)
        assert np.isfinite(out).all()
        assert np.isfinite(y_est).all()

    def test_max_dist_crossover(self):
        param = [50.0, 9.6, -1.5, 2.0, 2e6]
        v_inter = 0.05
        d_max = estimate_max_dist_intra(param, v_inter)
        # at the crossover the curve equals the trans level
        assert peval(d_max, [50.0, 9.6, -1.5, 2e6]) == pytest.approx(
            v_inter, rel=1e-2
        )


class TestPackedProjection:
    def test_packed_matches_unpacked(self):
        """project_packed must agree with project_to_sub field by field."""
        import jax.numpy as jnp

        from instagraal_tpu.model.likelihood import project_to_sub
        from instagraal_tpu.sampler.device_sweep import (
            project_packed,
            pp_from_attrs,
            zeros_from_packed,
        )
        from instagraal_tpu.model.likelihood import (
            nz_log_likelihood,
            zeros_log_likelihood,
        )
        from instagraal_tpu.testing import SyntheticSim

        sim = SyntheticSim(n_frags=30, n_contigs=3, seed=1)
        sub = project_to_sub(sim.state, sim.sub_index)
        packed = project_packed(sim.state, sim.sub_index)
        np.testing.assert_allclose(np.asarray(packed[:, 0]), sub.pos_bp)
        np.testing.assert_array_equal(
            np.asarray(packed[:, 1]).astype(int), sub.id_c
        )
        np.testing.assert_allclose(np.asarray(packed[:, 2]), sub.s_tot)
        np.testing.assert_array_equal(
            np.asarray(packed[:, 3]).astype(int), sub.pos
        )
        np.testing.assert_array_equal(
            np.asarray(packed[:, 4]).astype(int), sub.l_cont
        )

        msf = np.float32(sim.mean_size_frag_kb)
        nz_a = float(
            nz_log_likelihood(
                sub, sim.coo_rows, sim.coo_cols, sim.coo_data,
                sim.params, msf,
            )
        )
        ra = packed[sim.coo_rows]
        ca = packed[sim.coo_cols]
        nz_b = float(
            jnp.sum(pp_from_attrs(ra, ca, sim.coo_data, sim.params, msf))
        )
        assert nz_a == pytest.approx(nz_b, rel=1e-6)
        z_a = float(
            zeros_log_likelihood(sub, sim.params, msf, sim.n_pix_total)
        )
        z_b = float(
            zeros_from_packed(packed, sim.params, msf, sim.n_pix_total)
        )
        assert z_a == pytest.approx(z_b, rel=1e-6)
