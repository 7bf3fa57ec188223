"""Batched generation of the 24 candidate mutations.

The reference materializes each candidate genome in one of 24 shadow GPU
structs via ~30 sequential kernel launches per candidate pair
(reference cuda_lib_gl_single.py:1642-1923 pop_out_pop_in/transloc/
insert_blocks). Here `all_candidate_states` produces the full stack of 24
mutated FragStates as one traced computation, so XLA fuses the whole move
generation and downstream scoring batches over the mutation axis.

Mutation index layout (reference cuda_lib_gl_single.py:1601-1620):

   0  eject (pop out into singleton)
   1  flip
   2  pop out + split-insert left  of B, watson
   3  pop out + split-insert left  of B, crick
   4  pop out + split-insert right of B, watson
   5  pop out + split-insert right of B, crick
   6  pop out + insert right of B, watson
   7  pop out + insert right of B, crick
   8-11   translocations: split at A (down/up) x split at B (down/up) + paste
   12-23  block inserts: 6 block sizes x {upstream, downstream}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .state import FragState

N_MUTATIONS = 24
BLOCK_SIZES = np.array([1, 3, 5, 10, 20, 50], dtype=np.int32)
# reference cuda_lib_gl_single.py:417-422


def stack_states(states: list[FragState]) -> FragState:
    """Stack a list of FragStates into one with a leading mutation axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def all_candidate_states(
    state: FragState,
    id_fA,
    id_fB,
    max_id,
    flip_eject: bool | jnp.ndarray = True,
) -> tuple[FragState, jnp.ndarray]:
    """Generate the 24 mutated genomes for the (id_fA, id_fB) pair.

    Returns (stacked FragState with leading axis 24, validity mask[24]).
    The mask mirrors extract_uniq_mutations (kernel :4492): eject/flip are
    only proposed once per sweep step (flip_eject), pop-ins need contig B
    length > 1, translocations need contig A length > 1, block inserts
    follow get_bounds validity.
    """
    list_bounds = jnp.asarray(BLOCK_SIZES)

    # --- modes 0-7: pop out (+ reinsert) ---
    popped = ops.pop_out(state, id_fA, max_id)
    max_id2 = jnp.max(popped.id_c)
    states = [
        popped,  # 0 eject
        ops.flip(state, id_fA),  # 1 flip
        ops.pop_in_1(popped, id_fA, id_fB, max_id2, 1),
        ops.pop_in_1(popped, id_fA, id_fB, max_id2, -1),
        ops.pop_in_2(popped, id_fA, id_fB, max_id2, 1),
        ops.pop_in_2(popped, id_fA, id_fB, max_id2, -1),
        ops.pop_in_3(popped, id_fA, id_fB, max_id2, 1),
        ops.pop_in_3(popped, id_fA, id_fB, max_id2, -1),
    ]

    # --- modes 8-11: translocations ---
    for up_a in (0, 1):
        s1 = ops.split_contig(state, id_fA, up_a, max_id)
        m1 = jnp.max(s1.id_c)
        for up_b in (0, 1):
            s2 = ops.split_contig(s1, id_fB, up_b, m1)
            m2 = jnp.max(s2.id_c)
            states.append(ops.paste_contigs(s2, id_fA, id_fB, m2))

    # --- modes 12-23: block inserts ---
    valid_insert, f_up, f_down = ops.get_bounds(
        state, id_fA, id_fB, list_bounds
    )
    for i in range(len(BLOCK_SIZES)):
        for slot, (upstream, f_cut) in enumerate(
            [(1, f_up[i]), (0, f_down[i])]
        ):
            mut_idx = 2 * i + slot
            extracted = ops.extract_block(
                state, id_fA, f_cut, upstream, max_id
            )
            states.append(
                ops.insert_block(
                    extracted,
                    state,
                    id_fA,
                    id_fB,
                    f_cut,
                    upstream,
                    valid_insert[mut_idx],
                )
            )

    stacked = stack_states(states)
    valid = candidate_validity(
        state, id_fA, id_fB, flip_eject, valid_insert=valid_insert
    )
    return stacked, valid


def candidate_validity(
    state: FragState,
    id_fA,
    id_fB,
    flip_eject: bool | jnp.ndarray = True,
    valid_insert=None,
) -> jnp.ndarray:
    """The [24] validity mask alone (kernel extract_uniq_mutations
    :4492): eject/flip once per sweep step, pop-ins need contig B
    length > 1, translocations contig A length > 1, block inserts
    follow get_bounds. Used standalone by the seg backend's local
    candidate path when a member window overflowed and the truncated
    local get_bounds cannot be trusted."""
    if valid_insert is None:
        valid_insert, _, _ = ops.get_bounds(
            state, id_fA, id_fB, jnp.asarray(BLOCK_SIZES)
        )
    l_cont_a = state.l_cont[id_fA]
    l_cont_b = state.l_cont[id_fB]
    fe = jnp.asarray(flip_eject, dtype=bool)
    return jnp.concatenate(
        [
            jnp.stack([fe, fe, jnp.asarray(True), jnp.asarray(True)]),
            jnp.repeat(l_cont_b > 1, 4),
            jnp.repeat(l_cont_a > 1, 4),
            valid_insert != -1,
        ]
    )


def single_candidate_state(
    state: FragState, id_fA, id_fB, max_id, op
) -> FragState:
    """Materialize ONE of the 24 mutated genomes, selected by traced
    index `op`, without building the other 23.

    Exact complement to `all_candidate_states` (same mutation index
    layout); `lax.switch` runs only the chosen chain of ops, so the
    cost is one O(n) mutation instead of 24. The seg backend's local
    candidate path uses this as the exact any-scale fallback: when a
    candidate pair's member windows overflow the local capacities, the
    full-size winner (or an overflowed candidate under scoring) is
    regenerated here instead of being read from the truncated local
    stack.
    """
    list_bounds = jnp.asarray(BLOCK_SIZES)

    def eject(_):
        return ops.pop_out(state, id_fA, max_id)

    def flip_(_):
        return ops.flip(state, id_fA)

    def make_pop_in(k, ori):
        fn = (ops.pop_in_1, ops.pop_in_2, ops.pop_in_3)[k]

        def apply(_):
            popped = ops.pop_out(state, id_fA, max_id)
            return fn(popped, id_fA, id_fB, jnp.max(popped.id_c), ori)

        return apply

    def make_transloc(up_a, up_b):
        def apply(_):
            s1 = ops.split_contig(state, id_fA, up_a, max_id)
            s2 = ops.split_contig(s1, id_fB, up_b, jnp.max(s1.id_c))
            return ops.paste_contigs(s2, id_fA, id_fB, jnp.max(s2.id_c))

        return apply

    def make_block(i, upstream):
        def apply(_):
            valid_insert, f_up, f_down = ops.get_bounds(
                state, id_fA, id_fB, list_bounds
            )
            f_cut = f_up[i] if upstream else f_down[i]
            mut_idx = 2 * i + (0 if upstream else 1)
            extracted = ops.extract_block(
                state, id_fA, f_cut, upstream, max_id
            )
            return ops.insert_block(
                extracted, state, id_fA, id_fB, f_cut, upstream,
                valid_insert[mut_idx],
            )

        return apply

    branches = [eject, flip_]
    for k in range(3):
        for ori in (1, -1):
            branches.append(make_pop_in(k, ori))
    for up_a in (0, 1):
        for up_b in (0, 1):
            branches.append(make_transloc(up_a, up_b))
    for i in range(len(BLOCK_SIZES)):
        for upstream in (1, 0):
            branches.append(make_block(i, upstream))
    assert len(branches) == N_MUTATIONS
    return jax.lax.switch(op, branches, None)


def renumber_contigs(
    state: FragState, headroom: int = 8
) -> tuple[FragState, jnp.ndarray, jnp.ndarray]:
    """Compact contig ids to 0..n_contigs-1, longest contig highest.

    Mirrors the live renumbering of reference modify_gl_cuda_buffer
    (cuda_lib_gl_single.py:2715-2881 + gl_update_pos kernel :4657):
    contigs are sorted by fragment count descending (ties by old id
    ascending, deterministically — the reference's tie order is atomics-
    dependent) and new id = n_contigs - 1 - rank.

    headroom: how far above n_frags ids may have grown since the last
    renumber (the seg backend renumbers every K steps, not every step,
    so ids can reach n_frags + a few per accepted move).

    Returns (renumbered state, n_contigs, mean contig length in frags).
    """
    n = state.n_frags
    m = n + int(headroom)  # id head-room during mutation chains
    counts = jnp.bincount(state.id_c, length=m)
    present = counts > 0
    n_contigs = present.sum()
    key = jnp.where(present, -counts, m + 1)
    order = jnp.argsort(key, stable=True)  # rank -> old id
    rank_of = jnp.zeros(m, dtype=jnp.int32).at[order].set(
        jnp.arange(m, dtype=jnp.int32)
    )
    new_id_c = (n_contigs - 1).astype(jnp.int32) - rank_of[state.id_c]
    mean_len = counts.sum() / n_contigs
    return state._replace(id_c=new_id_c), n_contigs, mean_len
