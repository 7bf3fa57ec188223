"""Direct unit parity for the hot-path scoring math.

Every production backend scores pixels through the *fast* forms
(`expected_counts_fast`, `expected_counts_with_log10`, `pp_rows_fast`,
`zeros_packed_fast`) — algebraic rewrites of the executable-spec forms
(`expected_counts`, `pp_from_attrs`, `zeros_from_packed`), which are in
turn pinned to the reference CUDA semantics
(kernel_sparse_adapt.cu:153-270) by test_likelihood.py's float64
oracles. These tests pin fast == spec directly, over randomized
parameters x {linear, circular} x the branch edges (s=0, s>=d_max,
val<=v_inter), plus an independent float64 oracle for pp_rows_fast.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from instagraal_tpu.model.likelihood import LOG10_E, poisson_norm
from instagraal_tpu.model.rippe import (
    RippeParams,
    expected_counts,
    expected_counts_fast,
    expected_counts_with_log10,
)
from instagraal_tpu.sampler.device_sweep import (
    PACK,
    pp_from_attrs,
    pp_rows_fast,
    zeros_from_packed,
    zeros_packed_fast,
)

from test_likelihood import np_log10_poisson, np_rippe


def random_params(rng):
    """Randomized-but-plausible Rippe parameters."""
    return RippeParams.make(
        kuhn=rng.uniform(20.0, 120.0),
        lm=rng.uniform(5.0, 15.0),
        slope=rng.uniform(-2.5, -0.8),
        d=2.0,
        d_max=rng.uniform(100.0, 2000.0),
        fact=10.0 ** rng.uniform(-1.0, 2.0),
        v_inter=10.0 ** rng.uniform(-3.0, 0.0),
    )


def edge_distances(p, rng, n):
    """Distances hitting every branch: s=0, s just inside/outside
    d_max, the val<=v_inter floor region, and a random bulk."""
    d_max = float(p.d_max)
    edges = np.array(
        [0.0, 1e-3, 0.5, d_max * 0.999, d_max, d_max * 1.5, 1e6]
    )
    bulk = rng.uniform(0.0, 1.2 * d_max, size=n - edges.size)
    return np.concatenate([edges, bulk]).astype(np.float32)


class TestExpectedCountsFast:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("circular", [False, True])
    def test_fast_equals_spec(self, seed, circular):
        rng = np.random.default_rng(seed)
        p = random_params(rng)
        s = edge_distances(p, rng, 512)
        if circular:
            s_tot = np.full_like(s, float(np.max(s)) * 2.0 + 1.0)
        else:
            s_tot = np.zeros_like(s)
        spec = np.asarray(expected_counts(s, s_tot, p))
        fast = np.asarray(expected_counts_fast(s, s_tot, p))
        np.testing.assert_allclose(fast, spec, rtol=2e-5, atol=0)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_mixed_linear_circular_dispatch(self, seed):
        # s_tot == 0 selects the linear branch elementwise
        rng = np.random.default_rng(seed)
        p = random_params(rng)
        s = edge_distances(p, rng, 256)
        s_tot = np.where(
            rng.uniform(size=s.shape) < 0.5, 0.0, 2.0 * s.max() + 1.0
        ).astype(np.float32)
        spec = np.asarray(expected_counts(s, s_tot, p))
        fast = np.asarray(expected_counts_fast(s, s_tot, p))
        np.testing.assert_allclose(fast, spec, rtol=2e-5, atol=0)


class TestExpectedCountsWithLog10:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("circular", [False, True])
    def test_pair_equals_spec_and_its_log10(self, seed, circular):
        rng = np.random.default_rng(seed)
        p = random_params(rng)
        s = edge_distances(p, rng, 512)
        s_tot = (
            np.full_like(s, float(np.max(s)) * 2.0 + 1.0)
            if circular
            else np.zeros_like(s)
        )
        ex, log_ex = expected_counts_with_log10(s, s_tot, p)
        ex, log_ex = np.asarray(ex), np.asarray(log_ex)
        spec = np.asarray(expected_counts(s, s_tot, p))
        np.testing.assert_allclose(ex, spec, rtol=2e-5, atol=0)
        # the log lane must equal log10 of the value lane (incl. the
        # v_inter floor region, where both collapse to log10(v_inter))
        np.testing.assert_allclose(
            log_ex, np.log10(ex), rtol=0, atol=2e-4
        )

    def test_floor_region_uses_v_inter(self):
        p = RippeParams.make(
            kuhn=50.0, lm=9.6, slope=-1.5, d=2.0, d_max=300.0,
            fact=20.0, v_inter=0.05,
        )
        s = np.array([0.0, 299.9, 300.0, 301.0, 1e5], np.float32)
        ex, log_ex = expected_counts_with_log10(s, np.zeros_like(s), p)
        # s=0 and s>=d_max are outside the curve: flat v_inter
        for i in (0, 2, 3, 4):
            assert float(ex[i]) == pytest.approx(0.05, rel=1e-6)
            assert float(log_ex[i]) == pytest.approx(
                np.log10(0.05), rel=1e-5
            )


def make_packed(rng, n, p, circ_frac=0.3, msf=3.0):
    """Random packed attribute rows spanning the branch edges.

    Lanes (project_packed): 0 pos_bp(kb), 1 contig id, 2 circular
    s_tot(kb), 3 pos in sub units, 4 contig sub-length.
    """
    pos_bp = rng.uniform(0.0, 2.0 * float(p.d_max), size=n)
    id_c = rng.integers(0, 5, size=n)
    l_cont = rng.integers(1, 50, size=n)
    pos = np.array([rng.integers(0, lc) for lc in l_cont])
    circ = rng.uniform(size=n) < circ_frac
    s_tot = np.where(circ, l_cont * msf * rng.uniform(1.0, 2.0), 0.0)
    packed = np.zeros((n, PACK), np.float32)
    packed[:, 0] = pos_bp
    packed[:, 1] = id_c
    packed[:, 2] = s_tot
    packed[:, 3] = pos
    packed[:, 4] = l_cont
    return jnp.asarray(packed)


class TestPpRowsFast:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_fast_equals_spec_form(self, seed):
        rng = np.random.default_rng(seed)
        p = random_params(rng)
        msf = np.float32(3.0)
        n = 512
        packed = make_packed(rng, 2 * n, p, msf=float(msf))
        ra, ca = packed[:n], packed[n:]
        # observed counts spanning 0, small ints, and the >=15
        # Stirling branch of the Poisson normalization
        data = rng.choice(
            [0, 0, 1, 2, 3, 7, 14, 15, 16, 40, 200], size=n
        ).astype(np.float32)
        dn = jnp.stack(
            [jnp.asarray(data), jnp.asarray(poisson_norm(data))], axis=1
        )
        spec = np.asarray(pp_from_attrs(ra, ca, jnp.asarray(data), p, msf))
        fast = np.asarray(pp_rows_fast(ra, ca, dn, p, msf))
        # identical branch structure up to f32 association; scores are
        # O(1)-O(100) log10 units per pixel
        np.testing.assert_allclose(fast, spec, rtol=3e-5, atol=3e-4)

    @pytest.mark.parametrize("seed", [10, 11])
    def test_float64_oracle(self, seed):
        """pp_rows_fast against an independent float64 NumPy pipeline
        (np_rippe / np_log10_poisson pin the reference CUDA semantics,
        kernel_sparse_adapt.cu:153-270 — see test_likelihood.py)."""
        rng = np.random.default_rng(seed)
        p = random_params(rng)
        msf = 3.0
        n = 256
        packed = np.asarray(make_packed(rng, 2 * n, p, msf=msf))
        ra, ca = packed[:n], packed[n:]
        data = rng.choice([0, 1, 2, 14, 15, 40], size=n).astype(
            np.float32
        )
        dn = jnp.stack(
            [jnp.asarray(data), jnp.asarray(poisson_norm(data))], axis=1
        )
        got = np.asarray(
            pp_rows_fast(jnp.asarray(ra), jnp.asarray(ca), dn, p, msf)
        )

        def np_expected(s, s_tot):
            if s_tot > 0:  # circular (kernel :200-225)
                K = float(p.lm) / float(p.kuhn)
                nn = K * s * (s_tot - s) / s_tot
                if nn <= 0:
                    nn = 1.0
                val = (
                    float(p.kuhn) ** -3.0
                    * nn ** float(p.slope)
                    * np.exp(
                        (float(p.d) - 2.0) / (nn * nn + float(p.d))
                    )
                    * float(p.fact)
                )
                out = val if (0 < s < float(p.d_max)) else 0.0
                return max(out, float(p.v_inter))
            return float(np_rippe(np.array([s]), p)[0])

        for i in range(n):
            cis = ra[i, 1] == ca[i, 1]
            s = abs(float(ra[i, 0]) - float(ca[i, 0]))
            s_z = abs(float(ra[i, 3]) - float(ca[i, 3])) * msf
            circ = ra[i, 2] > 0
            s_tot = float(ra[i, 2]) if circ else 0.0
            s_tot_z = float(ra[i, 4]) * msf if circ else 0.0
            ex = np_expected(s, s_tot) if cis else float(p.v_inter)
            ex_z = np_expected(s_z, s_tot_z) if cis else float(p.v_inter)
            want = np_log10_poisson(ex, float(data[i])) + ex_z * float(
                LOG10_E
            )
            assert got[i] == pytest.approx(want, rel=3e-4, abs=3e-4), (
                f"pixel {i}: cis={cis} s={s} s_z={s_z}"
            )


class TestZerosPackedFast:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_fast_equals_spec_form(self, seed):
        rng = np.random.default_rng(seed)
        p = random_params(rng)
        msf = np.float32(3.0)
        packed = make_packed(rng, 600, p, msf=float(msf))
        n_pix = np.float32(5e5)
        spec = float(zeros_from_packed(packed, p, msf, n_pix))
        fast = float(zeros_packed_fast(packed, p, msf, n_pix))
        assert fast == pytest.approx(spec, rel=2e-5)
