"""Data-parallel independent MCMC chains over the "chains" mesh axis.

Each chain holds its own genome state (stacked on a leading axis,
sharded across the mesh's chains dimension) and performs the same sweep
step as the single-chain Sampler; the nnz reduction inside each chain's
likelihood is additionally sharded over the "shards" axis. One jitted
call advances every chain simultaneously.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.moves import N_MUTATIONS, all_candidate_states, renumber_contigs
from ..core.state import FragState
from ..model.likelihood import (
    nz_log_likelihood,
    project_to_sub,
    zeros_log_likelihood,
)
from ..model.rippe import RippeParams
from .mesh import CHAINS_AXIS, SHARDS_AXIS, shard_coo


class MultiChainSampler:
    """C independent chains advanced in lock-step on a device mesh.

    This is the SIMPLE reference engine for the (chains, shards) mesh
    layout: one host-driven step per call, with the per-chain nnz
    likelihood reduction sharded over "shards" and psum-merged. The
    PRODUCTION multi-chain path is `sampler.device_sweep.
    MultiChainSweep` (whole cycles on device, driven by
    `Scaffolder(chains=C)` / `instagraal --chains`); this class remains
    the minimal, step-introspectable equivalent used by the multichip
    dryrun and the sharding equivalence tests (tests/test_parallel.py).
    """

    def __init__(
        self,
        sim,
        params: RippeParams,
        mesh,
        n_chains: int | None = None,
        n_neighbours: int = 5,
        seed: int = 0,
    ):
        self.sim = sim
        self.mesh = mesh
        self.params = params
        self.n_neighbours = n_neighbours
        self.n_chains = n_chains or mesh.shape[CHAINS_AXIS]
        self.n_frags = sim.n_frags
        self.rng = np.random.default_rng(seed)

        chain_sharding = NamedSharding(mesh, P(CHAINS_AXIS))
        self.states: FragState = jax.tree.map(
            lambda x: jax.device_put(
                jnp.broadcast_to(x, (self.n_chains, *x.shape)),
                chain_sharding,
            ),
            sim.state,
        )

        s_rows, s_cols, s_data, nnz = shard_coo(
            mesh, sim.coo_rows, sim.coo_cols, sim.coo_data
        )
        n_padded = s_rows.shape[0]
        weights = jax.device_put(
            (jnp.arange(n_padded) < nnz).astype(jnp.float32),
            NamedSharding(mesh, P(SHARDS_AXIS)),
        )
        idx = sim.sub_index
        msf = np.float32(sim.mean_size_frag_kb)
        n_pix = np.float32(sim.n_pix_total)

        def _ll(state, params):
            sub = project_to_sub(state, idx)
            return nz_log_likelihood(
                sub, s_rows, s_cols, s_data, params, msf, weights=weights
            ) + zeros_log_likelihood(sub, params, msf, n_pix)

        def _chain_step_score(state, id_fA, cand_ids, first_mask, params):
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
            return state, scores, n_contigs

        self._score_all = jax.jit(
            jax.vmap(
                _chain_step_score, in_axes=(0, 0, 0, 0, None)
            )
        )

        def _apply_one(state, id_fA, id_fB, op, max_id):
            stacked, _ = all_candidate_states(
                state, id_fA, id_fB, max_id, flip_eject=True
            )
            return jax.tree.map(lambda a: a[op], stacked)

        self._apply_all = jax.jit(
            jax.vmap(_apply_one, in_axes=(0, 0, 0, 0, 0))
        )
        self._ll_all = jax.jit(jax.vmap(_ll, in_axes=(0, None)))

    # ------------------------------------------------------------------
    def likelihoods(self) -> np.ndarray:
        return np.asarray(self._ll_all(self.states, self.params))

    def _sample_candidates(self, frag_ids: np.ndarray) -> np.ndarray:
        """Per-chain neighbour sampling from the shared distribution."""
        out = np.zeros((self.n_chains, self.n_neighbours), dtype=np.int32)
        for c, id_fA in enumerate(frag_ids):
            distri = self.sim.distri_frags[int(id_fA)]
            if distri["xk"] is not None:
                pk = distri["pk"]
                k = min(self.n_neighbours, int(np.count_nonzero(pk)))
                cand = self.rng.choice(
                    distri["xk"], size=k, p=pk, replace=False
                )
            else:
                cand = self.rng.choice(
                    self.n_frags, size=self.n_neighbours, replace=False
                )
            cand = np.sort(cand)
            out[c, : len(cand)] = cand
            out[c, len(cand):] = cand[0] if len(cand) else 0
        return out

    def step(self, frag_ids: np.ndarray | None = None) -> dict:
        """Advance every chain one sweep step. Returns per-chain info."""
        if frag_ids is None:
            frag_ids = self.rng.integers(
                0, self.n_frags, size=self.n_chains
            )
        frag_ids = np.asarray(frag_ids, dtype=np.int32)
        cand_ids = self._sample_candidates(frag_ids)
        first = np.zeros(
            (self.n_chains, self.n_neighbours), dtype=bool
        )
        first[:, 0] = True

        states, scores, n_contigs = self._score_all(
            self.states,
            jnp.asarray(frag_ids),
            jnp.asarray(cand_ids),
            jnp.asarray(first),
            self.params,
        )
        scores = np.array(scores)  # [C, k, 24]
        flat = scores.reshape(self.n_chains, -1)
        best = np.argmax(flat, axis=1)
        id_fB = cand_ids[np.arange(self.n_chains), best // N_MUTATIONS]
        ops = (best % N_MUTATIONS).astype(np.int32)
        max_ids = np.asarray(n_contigs, dtype=np.int32) - 1

        self.states = self._apply_all(
            states,
            jnp.asarray(frag_ids),
            jnp.asarray(id_fB),
            jnp.asarray(ops),
            jnp.asarray(max_ids),
        )
        return {
            "likelihood": flat[np.arange(self.n_chains), best],
            "op": ops,
            "id_fB": id_fB,
            "n_contigs": np.asarray(n_contigs),
        }

    def best_state(self) -> tuple[FragState, float]:
        lls = self.likelihoods()
        c = int(np.argmax(lls))
        state = jax.tree.map(lambda a: a[c], self.states)
        return state, float(lls[c])
