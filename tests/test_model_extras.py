"""Tests for the exp contact model and bounded least squares."""

import numpy as np
import pytest

from instagraal_tpu.model.exp_model import (
    ExpParams,
    estimate_max_dist_intra,
    estimate_param_hic,
    peval,
)
from instagraal_tpu.model.leastsqbound import (
    external2internal,
    internal2external,
    leastsqbound,
)


class TestExpModel:
    def test_peval_continuous_at_break(self):
        p = [1.0, -3.0, -1.2, 100.0]
        below = peval(np.array([0.999]), p)[0]
        above = peval(np.array([1.001]), p)[0]
        assert below == pytest.approx(above, rel=0.05)

    def test_fit_recovers_long_slope(self):
        x = np.linspace(0.5, 300, 80)
        true = [1.0, -4.0, -1.1, 50.0]
        y = peval(x, true)
        res, y_est = estimate_param_hic(y, x)
        assert res.x[2] == pytest.approx(-1.1, abs=0.3)
        np.testing.assert_allclose(y_est[10:], y[10:], rtol=0.5)

    def test_crossover(self):
        p = [1.0, -4.0, -1.1, 5e4]
        v = 0.05
        d = estimate_max_dist_intra(p, v)
        assert peval(np.array([d]), p)[0] == pytest.approx(v, rel=1e-2)

    def test_params_struct(self):
        p = ExpParams.make(1.0, 500.0, -4.0, -1.1, 10.0, 0.05)
        assert p.alpha_1 == np.float32(-1.1)


class TestLeastsqBound:
    def test_transform_roundtrip(self):
        bounds = [(None, None), (0.0, None), (None, 5.0), (-1.0, 1.0)]
        xe = np.array([2.5, 3.0, 1.0, 0.3])
        xi = external2internal(xe, bounds)
        back = internal2external(xi, bounds)
        np.testing.assert_allclose(back, xe, rtol=1e-10)

    def test_bounded_fit(self):
        # fit y = a*x + b with a constrained to [0, 2], true a = 5
        x = np.linspace(0, 1, 50)
        y = 5 * x + 1

        def resid(p, x, y):
            return y - (p[0] * x + p[1])

        p, ier = leastsqbound(
            resid, [1.0, 0.0], bounds=[(0, 2), (None, None)], args=(x, y)
        )
        assert p[0] == pytest.approx(2.0, abs=1e-6)  # clamped at bound

    def test_unbounded_matches_truth(self):
        x = np.linspace(0, 1, 50)
        y = 5 * x + 1

        def resid(p, x, y):
            return y - (p[0] * x + p[1])

        p, ier = leastsqbound(resid, [1.0, 0.0], args=(x, y))
        assert p[0] == pytest.approx(5.0, rel=1e-6)
        assert ier == 1


class TestLegacyConverter:
    def test_abs_contact_2_coo(self, tmp_path):
        from instagraal_tpu.pyramid.build import abs_contact_2_coo_file

        src = tmp_path / "old.txt"
        src.write_text("id_a id_b\n3 1\n1 3\n2 2\n")
        out = tmp_path / "coo.txt"
        abs_contact_2_coo_file(src, out)
        lines = out.read_text().splitlines()
        assert lines[0] == "id_frag_a\tid_frag_b\tn_contact"
        assert "0\t2\t2" in lines  # (3,1)+(1,3) -> 0-based (0,2) x2
        assert "1\t1\t1" in lines
