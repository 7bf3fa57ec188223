"""Fully on-device sweep engine: a whole cycle in one lax.scan.

The host-driven Sampler pays one dispatch + host round-trip per sweep
step (~ms through a tunneled TPU). Here the entire cycle — fragment
order, neighbour sampling, candidate generation, scoring, accept, and
the nuisance-parameter MH — runs inside a single jitted lax.scan, so a
cycle of n_frags steps is one device call.

Two scoring backends:

- "full": every candidate mutation is scored with a complete nnz sweep
  (exact; O(n_cand * 24 * nnz) per step).
- "sliced": the reference's slice trick (kernel slice_sp_mat :485,
  eval_all_scores :4029) rebuilt TPU-style: per candidate, the pixels
  touching the two affected contigs are compacted into a fixed-capacity
  index buffer (jnp.nonzero with static size) and only those pixels are
  re-scored for the 24 mutations; score = current nnz total + masked
  delta + analytic zeros. Same-contig moves use the reference's
  windowing around the two fragments. O(n_cand * (nnz + 24 * capacity)).

Neighbour sampling uses a per-fragment top-K contact table with Gumbel
top-k sampling (device-side analogue of the reference's host
np.random.choice over raw contact counts, cuda_lib_gl_single.py:3053).
The nuisance d_max update replaces the host fsolve with a jitted Newton
solve of rippe(s) = v_inter.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.moves import N_MUTATIONS, all_candidate_states, renumber_contigs
from ..core.state import FragState
from ..model.likelihood import (
    LOG10_E,
    SubIndex,
    log10_poisson,
    project_to_sub,
    zeros_log_likelihood,
)
from ..model.rippe import RippeParams, expected_counts


class NeighbourTable(NamedTuple):
    """Top-K contact partners per fragment, with sampling logits."""

    ids: jnp.ndarray  # [n_frags, K] neighbour fragment ids
    logits: jnp.ndarray  # [n_frags, K] log contact counts, -inf padded

    @classmethod
    def build(cls, level_csr, n_frags: int, k: int = 32) -> "NeighbourTable":
        sym = (level_csr + level_csr.T).tocsr()
        ids = np.zeros((n_frags, k), dtype=np.int32)
        logits = np.full((n_frags, k), -np.inf, dtype=np.float32)
        for i in range(n_frags):
            s0, s1 = sym.indptr[i], sym.indptr[i + 1]
            xk = sym.indices[s0:s1]
            vk = sym.data[s0:s1].astype(np.float64)
            hetero = xk != i
            xk, vk = xk[hetero], vk[hetero]
            if len(xk) == 0:
                # no contacts: uniform over everything (reference
                # cuda_lib_gl_single.py:3124 falls back to uniform)
                take = np.random.default_rng(i).choice(
                    n_frags, size=min(k, n_frags), replace=False
                )
                ids[i, : len(take)] = take
                logits[i, : len(take)] = 0.0
                continue
            top = np.argsort(-vk)[:k]
            ids[i, : len(top)] = xk[top]
            logits[i, : len(top)] = np.log(vk[top])
        return cls(jnp.asarray(ids), jnp.asarray(logits))


def sample_neighbours(key, table: NeighbourTable, id_fA, n_cand: int):
    """Gumbel top-k: n_cand distinct neighbours ~ contact counts."""
    logits = table.logits[id_fA]
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20
    )
    _, idx = jax.lax.top_k(logits + gumbel, n_cand)
    return table.ids[id_fA][idx]


def newton_d_max(params_vec, v_inter, s_init, n_iter: int = 12):
    """Solve rippe(s) = v_inter for s by damped Newton (replaces the
    host-side scipy fsolve, reference optim_rippe_curve_update.py:120)."""
    kuhn, lm, slope, d, fact = params_vec
    c1 = 0.53 * jnp.power(lm / kuhn, slope) * jnp.power(kuhn, -3.0)

    def log_f(s):
        s = jnp.maximum(s, 1e-3)
        return (
            jnp.log(c1 * fact)
            + slope * jnp.log(s)
            + (d - 2.0) / (jnp.square(s * lm / kuhn) + d)
            - jnp.log(jnp.maximum(v_inter, 1e-30))
        )

    grad = jax.grad(log_f)

    def body(_, s):
        g = grad(s)
        step = log_f(s) / jnp.where(jnp.abs(g) > 1e-12, g, 1e-12)
        return jnp.clip(s - step, 1.0, 1e7)

    s0 = jnp.maximum(jnp.asarray(s_init, jnp.float32), 1.0)
    return jax.lax.fori_loop(0, n_iter, body, s0)


def _per_pixel(sub, rows, cols, data, p, msf):
    """Per-pixel scoring terms (vectorized evaluate_likelihood_sparse)."""
    cis = sub.id_c[rows] == sub.id_c[cols]
    s = jnp.abs(sub.pos_bp[rows] - sub.pos_bp[cols])
    s_z = jnp.abs(sub.pos[rows] - sub.pos[cols]).astype(jnp.float32) * msf
    circ = sub.s_tot[rows] > 0
    s_tot = jnp.where(circ, sub.s_tot[rows], 0.0)
    s_tot_z = jnp.where(
        circ, sub.l_cont[rows].astype(jnp.float32) * msf, 0.0
    )
    ex = jnp.where(cis, expected_counts(s, s_tot, p), p.v_inter)
    ex_z = jnp.where(cis, expected_counts(s_z, s_tot_z, p), p.v_inter)
    return log10_poisson(ex, data) + ex_z * LOG10_E


class SweepEngine:
    """Builds the jitted cycle function for a Simulation."""

    def __init__(
        self,
        sim,
        n_neighbours: int = 5,
        backend: str = "sliced",
        slice_capacity: int | None = None,
        neighbour_k: int = 32,
        sample_param: bool = True,
    ):
        self.sim = sim
        self.n_neighbours = n_neighbours
        self.backend = backend
        self.sample_param = sample_param
        self.n_frags = sim.n_frags
        nnz = int(sim.coo_rows.shape[0])
        if slice_capacity is None:
            slice_capacity = int(min(nnz, max(4096, nnz // 4)))
        self.slice_capacity = slice_capacity
        self.table = NeighbourTable.build(
            sim.level.sparse_mat_csr, sim.n_frags, k=neighbour_k
        )

        idx = sim.sub_index
        rows, cols = sim.coo_rows, sim.coo_cols
        data = sim.coo_data
        msf = np.float32(sim.mean_size_frag_kb)
        n_pix = np.float32(sim.n_pix_total)
        n_cand = n_neighbours
        cap = self.slice_capacity
        # max_bounds_insert: window half-width for same-contig slices
        # (reference cuda_lib_gl_single.py:417-421)
        mean_sub_len = float(np.mean(np.asarray(sim.state.sub_len)))
        n_bounds = int(50 * round(mean_sub_len + 1))

        def full_scores(state, sub_cur, pp_cur, ll_nz_cur, id_fA, cand, first,
                        max_id, params):
            def score_one(args):
                id_fB, is_first = args
                stacked, valid = all_candidate_states(
                    state, id_fA, id_fB, max_id, flip_eject=is_first
                )
                sub24 = jax.vmap(lambda s: project_to_sub(s, idx))(stacked)
                nz = jax.vmap(
                    lambda sb: jnp.sum(_per_pixel(sb, rows, cols, data, params, msf))
                )(sub24)
                z = jax.vmap(
                    lambda sb: zeros_log_likelihood(sb, params, msf, n_pix)
                )(sub24)
                return jnp.where(valid, nz + z, -jnp.inf)

            return jax.lax.map(score_one, (cand, first))

        def sliced_scores(state, sub_cur, pp_cur, ll_nz_cur, id_fA, cand,
                          first, max_id, params):
            cA = state.id_c[id_fA]
            row_c = sub_cur.id_c[rows]
            col_c = sub_cur.id_c[cols]

            def score_one(args):
                id_fB, is_first = args
                cB = state.id_c[id_fB]
                touch = (
                    (row_c == cA) | (row_c == cB)
                    | (col_c == cA) | (col_c == cB)
                )
                # same-contig windowing around A and B (reference
                # slice_sp_mat :536-585)
                same = cA == cB
                pa = state.sub_pos[id_fA]
                la = state.sub_len[id_fA]
                pb = state.sub_pos[id_fB]
                lb = state.sub_len[id_fB]
                lo_a = jnp.maximum(0, pa - n_bounds - la)
                hi_a = pa + n_bounds + la
                lo_b = jnp.maximum(0, pb - lb)
                hi_b = pb + lb
                rp = sub_cur.pos[rows]
                cp = sub_cur.pos[cols]
                px = jnp.minimum(rp, cp)
                py = jnp.maximum(rp, cp)
                in_win = ((px <= hi_a) & (py >= lo_a)) | (
                    (px <= hi_b) & (py >= lo_b)
                )
                touch = jnp.where(same, touch & in_win, touch)

                (sl_idx,) = jnp.nonzero(touch, size=cap, fill_value=0)
                n_sel = jnp.sum(touch)
                w = (jnp.arange(cap) < n_sel).astype(jnp.float32)
                sl_rows = rows[sl_idx]
                sl_cols = cols[sl_idx]
                sl_data = data[sl_idx]
                cur_slice = jnp.sum(pp_cur[sl_idx] * w)

                stacked, valid = all_candidate_states(
                    state, id_fA, id_fB, max_id, flip_eject=is_first
                )
                sub24 = jax.vmap(lambda s: project_to_sub(s, idx))(stacked)
                nz_slice = jax.vmap(
                    lambda sb: jnp.sum(
                        _per_pixel(sb, sl_rows, sl_cols, sl_data, params, msf)
                        * w
                    )
                )(sub24)
                z = jax.vmap(
                    lambda sb: zeros_log_likelihood(sb, params, msf, n_pix)
                )(sub24)
                scores = ll_nz_cur - cur_slice + nz_slice + z
                return jnp.where(valid, scores, -jnp.inf)

            return jax.lax.map(score_one, (cand, first))

        score_fn = sliced_scores if backend == "sliced" else full_scores

        def nuisance_step(key, state, params, ll_t):
            """Device-side MH over the model parameters (reference
            cuda_lib_gl_single.py:2961-3051)."""
            kuhn, lm, c1, slope, d, d_max, fact, d_nuc = params
            k_mod, k_prop, k_acc = jax.random.split(key, 3)
            id_modif = jax.random.randint(k_mod, (), 0, 4)
            eps = jax.random.normal(k_prop, ())

            sigma_fact = 10.0 ** (jnp.log10(jnp.maximum(fact, 1e-30)) - 2)
            sigma_d_nuc = 10.0 ** (
                jnp.log10(jnp.maximum(d_nuc, 1e-30)) - 2
            )
            new_fact = jnp.where(id_modif == 0, fact + eps * sigma_fact, fact)
            new_slope = jnp.where(id_modif == 1, slope + eps * 0.005, slope)
            new_d_max0 = jnp.where(id_modif == 2, d_max + eps * 100.0, d_max)
            new_d_nuc = jnp.where(
                id_modif == 3, d_nuc + eps * sigma_d_nuc, d_nuc
            )
            pv = (kuhn, lm, new_slope, d, new_fact)
            solved = newton_d_max(pv, new_d_nuc, d_max)
            new_d_max = jnp.where(id_modif == 2, new_d_max0, solved)
            # d_max proposals recompute the trans level from the curve
            s_safe = jnp.maximum(new_d_max0, 1.0)
            curve = (
                0.53
                * jnp.power(lm / kuhn, new_slope)
                * jnp.power(kuhn, -3.0)
                * new_fact
                * jnp.power(s_safe, new_slope)
                * jnp.exp(
                    (d - 2.0) / (jnp.square(s_safe * lm / kuhn) + d)
                )
            )
            new_d_nuc = jnp.where(id_modif == 2, curve, new_d_nuc)
            new_c1 = (
                0.53 * jnp.power(lm / kuhn, new_slope) * jnp.power(kuhn, -3.0)
            )
            test = RippeParams(
                kuhn, lm, new_c1, new_slope, d, new_d_max, new_fact,
                new_d_nuc,
            )
            sub = project_to_sub(state, idx)
            ll_test = jnp.sum(
                _per_pixel(sub, rows, cols, data, test, msf)
            ) + zeros_log_likelihood(sub, test, msf, n_pix)
            accept = jnp.exp(
                jnp.clip(ll_test - ll_t, -50.0, 50.0)
            ) >= jax.random.uniform(k_acc, ())
            out = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), test, params
            )
            return out, jnp.where(accept, ll_test, ll_t), accept

        @jax.jit
        def run_cycle(state, params, ll_t, key, sample_param_on):
            k_perm, k_steps = jax.random.split(key)
            order = jax.random.permutation(
                k_perm, self.n_frags
            ).astype(jnp.int32)
            keys = jax.random.split(k_steps, self.n_frags)
            (state, params, ll_t), traces = jax.lax.scan(
                partial_sweep, (state, params, ll_t), (order, keys,
                                                       sample_param_on)
            )
            return state, params, ll_t, traces

        def partial_sweep(carry, inputs):
            id_fA, key, do_nuis = inputs
            state, params, ll_t = carry

            # identical to sweep_step but nuisance gated by do_nuis
            k_nb, k_nuis = jax.random.split(key)
            state, n_contigs, mean_len = renumber_contigs(state)
            max_id = (n_contigs - 1).astype(jnp.int32)
            cand = jnp.sort(
                sample_neighbours(k_nb, self.table, id_fA, n_cand)
            )
            first = jnp.arange(n_cand) == 0
            sub_cur = project_to_sub(state, idx)
            pp_cur = _per_pixel(sub_cur, rows, cols, data, params, msf)
            ll_nz_cur = jnp.sum(pp_cur)
            scores = score_fn(
                state, sub_cur, pp_cur, ll_nz_cur, id_fA, cand, first,
                max_id, params,
            )
            flat = scores.reshape(-1)
            best = jnp.argmax(flat)
            id_fB = cand[best // N_MUTATIONS]
            op = best % N_MUTATIONS
            stacked, _ = all_candidate_states(
                state, id_fA, id_fB, max_id, flip_eject=True
            )
            state = jax.tree.map(lambda a: a[op], stacked)
            ll_t = flat[best]

            new_params, new_ll, accepted = nuisance_step(
                k_nuis, state, params, ll_t
            )
            params = jax.tree.map(
                lambda a, b: jnp.where(do_nuis, a, b), new_params, params
            )
            ll_t = jnp.where(do_nuis, new_ll, ll_t)
            accepted = accepted & do_nuis

            trace = {
                "likelihood": ll_t,
                "op": op,
                "id_fA": id_fA,
                "id_fB": id_fB,
                "n_contigs": n_contigs,
                "mean_len": mean_len,
                "fact": params.fact,
                "slope": params.slope,
                "d_max": params.d_max,
                "d_nuc": params.v_inter,
                "d": params.d,
                "success": accepted,
            }
            return (state, params, ll_t), trace

        self._run_cycle = run_cycle

        @jax.jit
        def _initial_ll(state, params):
            sub = project_to_sub(state, idx)
            pp = _per_pixel(sub, rows, cols, data, params, msf)
            return jnp.sum(pp) + zeros_log_likelihood(sub, params, msf, n_pix)

        self._initial_ll = _initial_ll

    # ------------------------------------------------------------------
    def run_cycle(
        self,
        state: FragState,
        params: RippeParams,
        ll_t: float,
        key,
        sample_param: bool = True,
    ):
        """Run one full cycle (n_frags sweep steps) on device.

        Returns (state, params, ll, traces-dict of numpy arrays).
        """
        flags = np.full(self.n_frags, bool(sample_param))
        state, params, ll, traces = self._run_cycle(
            state, jax.tree.map(jnp.asarray, params), np.float32(ll_t),
            key, flags,
        )
        traces = {k: np.asarray(v) for k, v in traces.items()}
        return state, params, float(ll), traces

    def initial_ll(self, state: FragState, params: RippeParams) -> float:
        return float(self._initial_ll(state, params))
