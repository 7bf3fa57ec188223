"""The MCMC sampler: batched candidate scoring + nuisance-parameter MH.

TPU redesign of the reference sampler (cuda_lib_gl_single.py:91-3187).
Where the reference runs ~40 kernel launches and several host<->device
round-trips per sweep step, here one jitted computation renumbers the
contigs, materializes all n_candidates x 24 mutated genomes, projects
them to sub-fragment vectors and reduces the full Poisson likelihood of
each — the only host work per step is neighbour sampling and the argmax
decision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.moves import N_MUTATIONS, all_candidate_states, renumber_contigs
from ..core.state import FragState
from ..model.fit import estimate_max_dist_intra_nuis, peval
from ..model.likelihood import genome_log_likelihood
from ..model.rippe import RippeParams
from .setup import Simulation


class Sampler:
    """Holds the live genome state and scores sweep steps on device."""

    def __init__(
        self,
        sim: Simulation,
        params: RippeParams,
        n_neighbours: int = 5,
        seed: int | None = 0,
    ):
        self.sim = sim
        self.params = params
        self.n_neighbours = n_neighbours
        self.rng = np.random.default_rng(seed)
        self.state: FragState = sim.state
        self.n_frags = sim.n_frags

        # frozen initial-genome topology for the distance metric
        self.init_prev = np.asarray(sim.state.prev).copy()
        self.init_next = np.asarray(sim.state.next).copy()
        self.init_ori = np.ones(self.n_frags, dtype=np.int32)
        self.orientable = np.asarray(sim.state.sub_len) > 1
        self.blacklist: set[int] = set(
            getattr(sim, "frag_blacklisted", set())
        )

        self.n_contigs = int(
            np.unique(np.asarray(sim.state.id_c)).shape[0]
        )
        self.mean_length_contigs = self.n_frags / max(self.n_contigs, 1)

        # --- jitted computations (closed over the static contact data) ---
        idx = sim.sub_index
        rows, cols, data = sim.coo_rows, sim.coo_cols, sim.coo_data
        msf = np.float32(sim.mean_size_frag_kb)
        n_pix = np.float32(sim.n_pix_total)

        def _ll(state, params):
            return genome_log_likelihood(
                state, idx, rows, cols, data, params, msf, n_pix
            )

        self._ll = jax.jit(_ll)

        def _step_score(state, id_fA, cand_ids, first_mask, params):
            state, n_contigs, mean_len = renumber_contigs(state)
            max_id = (n_contigs - 1).astype(jnp.int32)

            def score_candidate(args):
                id_fB, is_first = args
                stacked, valid = all_candidate_states(
                    state, id_fA, id_fB, max_id, flip_eject=is_first
                )
                lls = jax.vmap(lambda s: _ll(s, params))(stacked)
                return jnp.where(valid, lls, -jnp.inf)

            scores = jax.lax.map(score_candidate, (cand_ids, first_mask))
            return state, scores, n_contigs, mean_len

        self._step_score = jax.jit(_step_score)

        def _apply(state, id_fA, id_fB, op, max_id):
            stacked, _ = all_candidate_states(
                state, id_fA, id_fB, max_id, flip_eject=True
            )
            return jax.tree.map(lambda a: a[op], stacked)

        self._apply = jax.jit(_apply)

        def _renumber(state):
            return renumber_contigs(state)

        self._renumber = jax.jit(_renumber)

        self.likelihood_t = float("nan")

    # ------------------------------------------------------------------
    def eval_likelihood(self) -> float:
        self.likelihood_t = float(self._ll(self.state, self.params))
        return self.likelihood_t

    def bomb_the_genome(self) -> None:
        """Explode the genome into singletons with shuffled contig ids
        (reference cuda_lib_gl_single.py:1925-1948)."""
        from ..core import ops

        order = self.rng.permutation(self.n_frags).astype(np.int32)
        self.state = ops.explode_genome(self.state, jnp.asarray(order))
        self.state, n_contigs, mean_len = self._renumber(self.state)
        self.n_contigs = int(n_contigs)
        self.mean_length_contigs = float(mean_len)

    # ------------------------------------------------------------------
    def return_neighbours(self, id_fA: int, delta: int) -> list[int]:
        """Sample candidate partners ~ contact counts
        (reference cuda_lib_gl_single.py:3103-3141)."""
        distri = self.sim.distri_frags[id_fA]
        if distri["xk"] is not None:
            pk = distri["pk"]
            n_max = min(delta, int(np.count_nonzero(pk)))
            out = self.rng.choice(
                distri["xk"], size=n_max, p=pk, replace=False
            )
        else:
            out = self.rng.choice(self.n_frags, size=delta, replace=False)
        return [int(x) for x in out if int(x) not in self.blacklist]

    def step_sampler(self, id_frag: int, n_neighbours: int | None = None):
        """One sweep step: sample candidates, score all mutations, apply
        the best (reference step_sampler, cuda_lib_gl_single.py:1401-1465).

        Returns (likelihood, distance-from-init, op_sampled, id_f_sampled,
        mean contig length, n_contigs).
        """
        delta = n_neighbours or self.n_neighbours
        candidates = sorted(self.return_neighbours(id_frag, delta))
        if not candidates:
            candidates = [int(self.rng.integers(self.n_frags))]
        n_cand = len(candidates)

        # pad to the jitted shape
        cand_ids = np.full(self.n_neighbours, candidates[0], dtype=np.int32)
        cand_ids[:n_cand] = candidates
        first_mask = np.zeros(self.n_neighbours, dtype=bool)
        first_mask[0] = True

        state, scores, n_contigs, mean_len = self._step_score(
            self.state,
            np.int32(id_frag),
            jnp.asarray(cand_ids),
            jnp.asarray(first_mask),
            self.params,
        )
        scores = np.array(scores)  # [n_neighbours, 24] (mutable copy)
        scores[n_cand:, :] = -np.inf
        # duplicated padded candidates would double-count; already masked.

        flat = scores.reshape(-1)
        global_id = int(np.argmax(flat))
        id_f_sampled = int(cand_ids[global_id // N_MUTATIONS])
        op_sampled = int(global_id % N_MUTATIONS)
        best = float(flat[global_id])

        max_id = np.int32(int(n_contigs) - 1)
        self.state = self._apply(
            state,
            np.int32(id_frag),
            np.int32(id_f_sampled),
            np.int32(op_sampled),
            max_id,
        )
        self.state, n_contigs2, mean_len2 = self._renumber(self.state)
        self.n_contigs = int(n_contigs2)
        self.mean_length_contigs = float(mean_len2)
        self.likelihood_t = best
        dist = self.dist_inter_genome()
        return (
            best,
            dist,
            op_sampled,
            id_f_sampled,
            self.mean_length_contigs,
            self.n_contigs,
        )

    # ------------------------------------------------------------------
    def dist_inter_genome(self) -> float:
        """Normalized structural distance from the initial genome.

        Vectorized reference dist_inter_genome
        (cuda_lib_gl_single.py:665-716).
        """
        s = self.state
        prev1 = np.asarray(s.prev)
        next1 = np.asarray(s.next)
        ori1 = np.asarray(s.ori)
        prev0, next0, ori0 = self.init_prev, self.init_next, self.init_ori
        orientable = self.orientable

        active = np.ones(self.n_frags, dtype=bool)
        for b in self.blacklist:
            active[b] = False
        norm = 3.0 * active.sum()
        d = np.full(self.n_frags, 3.0)

        same_pair = ((prev1 == prev0) & (next1 == next0)) | (
            (prev1 == next0) & (next1 == prev0)
        )
        d -= same_pair

        swap = np.where(orientable & (ori1 != ori0), -1, 1)
        p1 = np.where(swap == -1, next1, prev1)
        n1 = np.where(swap == -1, prev1, next1)

        def credit(nb1, nb0):
            """Credit for one side of an orientable fragment."""
            match = nb1 == nb0
            nb_safe = np.clip(nb1, 0, self.n_frags - 1)
            anchor_free = (nb0 == -1) | ~orientable[nb_safe]
            full = match & anchor_free
            half = match & ~anchor_free
            ori_match = half & (
                ori0[np.clip(nb0, 0, self.n_frags - 1)]
                == swap * ori1[nb_safe]
            )
            return full * 1.0 + half * 0.5 + ori_match * 0.5

        d_orient = credit(p1, prev0) + credit(n1, next0)
        d_plain = (
            ((prev1 == prev0) | (prev1 == next0)) * 1.0
            + ((next1 == next0) | (next1 == prev0)) * 1.0
        )
        d -= np.where(orientable, d_orient, d_plain)
        return float(d[active].sum() / norm)

    # ------------------------------------------------------------------
    # Nuisance parameter sampling (reference :2961-3051)
    SIGMA_SLOPE = 0.005
    SIGMA_D_MAX = 100.0
    SIGMA_D = 10.0

    def step_nuisance_parameters(self, t: float = 0.0, n_step: float = 1.0):
        """Metropolis-Hastings update of one randomly-chosen model
        parameter (scale factor, slope, d_max, v_inter or d)."""
        p = self.params
        kuhn, lm, c1, slope, d, d_max, fact, d_nuc = (
            float(v) for v in p
        )
        sigma_fact = 10 ** (np.log10(fact) - 2)
        sigma_d_nuc = 10 ** (np.log10(d_nuc) - 2) if d_nuc > 0 else 0.0

        id_modif = int(self.rng.choice(4))
        if id_modif == 0:  # scale factor
            fact = fact + self.rng.normal(0.0, sigma_fact)
            d_max = estimate_max_dist_intra_nuis(
                [kuhn, lm, slope, d, fact], d_nuc, d_max
            )
        elif id_modif == 1:  # slope
            slope = slope + self.rng.normal(0.0, self.SIGMA_SLOPE)
            d_max = estimate_max_dist_intra_nuis(
                [kuhn, lm, slope, d, fact], d_nuc, d_max
            )
        elif id_modif == 2:  # max intra distance
            d_max = d_max + self.rng.normal(0.0, self.SIGMA_D_MAX)
            d_nuc = float(peval(d_max, [kuhn, lm, slope, fact]))
        elif id_modif == 3:  # trans level
            if sigma_d_nuc > 0:
                d_nuc = d_nuc + self.rng.normal(0.0, sigma_d_nuc)
            d_max = estimate_max_dist_intra_nuis(
                [kuhn, lm, slope, d, fact], d_nuc, d_max
            )
        else:  # d (unreachable with choice(4), kept for parity)
            d = d + self.rng.normal(0.0, self.SIGMA_D)
            d_max = estimate_max_dist_intra_nuis(
                [kuhn, lm, slope, d, fact], d_nuc, d_max
            )

        test = RippeParams.make(
            kuhn=kuhn, lm=lm, slope=slope, d=d, d_max=d_max, fact=fact,
            v_inter=d_nuc,
        )
        ll_test = float(self._ll(self.state, test))
        f_t = self.temperature(t, n_step)
        ratio = np.exp(
            np.clip((ll_test - self.likelihood_t) / f_t, -700, 700)
        )
        success = 0
        if ratio >= self.rng.random():
            success = 1
            self.params = test
            self.likelihood_t = ll_test
        pk = self.params
        return (
            float(pk.fact),
            float(pk.d),
            float(pk.d_max),
            float(pk.v_inter),
            float(pk.slope),
            self.likelihood_t,
            success,
        )

    @staticmethod
    def temperature(t, n_step) -> float:
        return 1.0  # reference cuda_lib_gl_single.py:3163-3165
