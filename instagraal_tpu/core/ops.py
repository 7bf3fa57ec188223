"""Genome mutation operators as pure vectorized JAX functions.

Each operator maps ``FragState -> FragState`` given scalar fragment ids,
re-deriving all per-fragment bookkeeping (positions, bp offsets, contig
membership, doubly-linked neighbour ids) with masked where-updates.

Semantics are those of the reference CUDA kernels
(/root/reference/src/instagraal/kernels/kernel_sparse_adapt.cu):

  pop_out        :737   eject a fragment into its own singleton contig
  flip           :612   invert a fragment's orientation
  pop_in_1       :1081  insert popped fragment left of target, splitting
  pop_in_2       :1373  insert popped fragment right of target, splitting
  pop_in_3       :1688  insert popped fragment right of target, no split
  split_contig   :2979  cut a contig at a fragment (up-/downstream)
  paste_contigs  :3367  join two contig ends (or circularize)
  get_bounds     :2124  cut positions + validity for block inserts
  extract_block  :2400  excise a block of fragments into a new contig
  insert_block   :2724  insert an excised block next to a target fragment
  explode_genome :409   reset every fragment to a singleton contig
  swap_activity  :674   toggle a duplicated fragment active/inactive

Deviation from the reference: paste_contigs on two fragments of the same
contig that are NOT the two opposite ends leaves the output buffer
unwritten in CUDA (stale data); here the operator is the identity, which
is the only well-defined choice.
"""

from __future__ import annotations

import jax.numpy as jnp

from .state import FragState

# fields every kernel simply carries through are omitted from case dicts;
# `id` is the array index and never changes.
_MUTABLE = [
    "pos", "sub_pos", "id_c", "start_bp", "circ", "ori", "prev", "next",
    "l_cont", "sub_l_cont", "l_cont_bp", "activ",
]


def _at(state: FragState, i):
    """Scalar view of one fragment's fields."""

    class V:
        pass

    v = V()
    for name in FragState._fields:
        setattr(v, name, getattr(state, name)[i])
    return v


def _apply(state: FragState, guard, cases) -> FragState:
    """Apply mutually-exclusive (mask, field->value) cases under a guard.

    Fields not mentioned in a case keep their current value.
    """
    out = {}
    for name in _MUTABLE:
        cur = getattr(state, name)
        new = cur
        for mask, fields in cases:
            if name in fields:
                new = jnp.where(mask, fields[name], new)
        out[name] = jnp.where(guard, new, cur)
    return state._replace(**out)


def _i32(x):
    return jnp.asarray(x, dtype=jnp.int32)


# ---------------------------------------------------------------------------


def pop_out(state: FragState, id_f_pop, max_id) -> FragState:
    """Eject fragment `id_f_pop` into a fresh singleton contig max_id+1."""
    P = _at(state, id_f_pop)
    guard = P.l_cont >= 2

    mc = state.id_c == P.id_c
    before = mc & (state.pos < P.pos)
    at = mc & (state.pos == P.pos)
    after = mc & (state.pos > P.pos)
    pair = P.l_cont == 2  # remaining fragment becomes a singleton

    rem_prev = jnp.where(
        (state.id == P.next) & (P.circ == 1), P.prev, state.prev
    )
    rem_prev_b = jnp.where(pair, -1, rem_prev)
    rem_next = jnp.where(state.pos == P.pos - 1, P.next, state.next)
    rem_next_b = jnp.where(pair, -1, rem_next)

    aft_prev = jnp.where(state.pos == P.pos + 1, P.prev, state.prev)
    aft_prev_b = jnp.where(pair, -1, aft_prev)
    aft_next = jnp.where(
        (state.id == P.prev) & (P.circ == 1), P.next, state.next
    )
    aft_next_b = jnp.where(pair, -1, aft_next)

    rem_circ = jnp.where(pair, 0, state.circ)

    cases = [
        (
            before,
            dict(
                prev=rem_prev_b,
                next=rem_next_b,
                circ=rem_circ,
                l_cont=state.l_cont - 1,
                sub_l_cont=state.sub_l_cont - P.sub_len,
                l_cont_bp=state.l_cont_bp - P.len_bp,
            ),
        ),
        (
            at,
            dict(
                pos=0,
                sub_pos=0,
                id_c=max_id + 1,
                start_bp=0,
                circ=0,
                ori=1,
                prev=-1,
                next=-1,
                l_cont=1,
                sub_l_cont=state.sub_len,
                l_cont_bp=state.len_bp,
            ),
        ),
        (
            after,
            dict(
                pos=state.pos - 1,
                sub_pos=state.sub_pos - P.sub_len,
                start_bp=state.start_bp - P.len_bp,
                prev=aft_prev_b,
                next=aft_next_b,
                circ=rem_circ,
                l_cont=state.l_cont - 1,
                sub_l_cont=state.sub_l_cont - P.sub_len,
                l_cont_bp=state.l_cont_bp - P.len_bp,
            ),
        ),
    ]
    return _apply(state, guard, cases)


def flip(state: FragState, id_f_flip) -> FragState:
    return state._replace(
        ori=jnp.where(state.id == id_f_flip, -state.ori, state.ori)
    )


def swap_activity(state: FragState, id_f, max_id) -> FragState:
    """Toggle a repeat fragment active/inactive (kernel :674)."""
    target = (state.id == id_f) & (state.rep == 1)
    new_activ = jnp.where(state.activ == 1, 0, 1)
    new_id_c = jnp.where(state.activ == 1, state.id_c, max_id + 1)
    return state._replace(
        activ=jnp.where(target, new_activ, state.activ),
        id_c=jnp.where(target, new_id_c, state.id_c),
    )


def explode_genome(state: FragState, shuffle_order) -> FragState:
    """Reset every fragment to its own contig with shuffled ids (:409)."""
    return state._replace(
        pos=jnp.zeros_like(state.pos),
        start_bp=jnp.zeros_like(state.start_bp),
        sub_pos=jnp.zeros_like(state.sub_pos),
        id_c=_i32(shuffle_order),
        prev=jnp.full_like(state.prev, -1),
        next=jnp.full_like(state.next, -1),
        l_cont=jnp.ones_like(state.l_cont),
        l_cont_bp=state.len_bp,
        sub_l_cont=state.sub_len,
    )


# ---------------------------------------------------------------------------


def pop_in_1(state: FragState, id_f_pop, id_f_ins, max_id, ori_f_pop) -> FragState:
    """Split-insert the popped fragment LEFT of id_f_ins (kernel :1081).

    `state` must be the post-pop_out state, where id_f_pop is a singleton.
    The insert contig is split before id_f_ins; [pop, ins, ...tail] forms
    contig max_id+1 (unless the insert contig is circular, in which case
    it is linearized around the insertion point and keeps its id).
    """
    P = _at(state, id_f_pop)
    I = _at(state, id_f_ins)
    guard = (P.activ == 1) & (I.activ == 1)

    is_pop = state.id == id_f_pop
    mc = (state.id_c == I.id_c) & ~is_pop
    lin = I.circ == 0

    # --- the popped fragment ---
    pop_lin = dict(
        pos=0, sub_pos=0, start_bp=0, circ=0, ori=ori_f_pop,
        prev=-1, next=id_f_ins,
        id_c=max_id + 1,
        l_cont=I.l_cont - I.pos + 1,
        l_cont_bp=I.l_cont_bp - I.start_bp + P.len_bp,
        sub_l_cont=I.sub_l_cont - I.sub_pos + P.sub_len,
    )
    pop_circ = dict(
        pos=0, sub_pos=0, start_bp=0, circ=0, ori=ori_f_pop,
        prev=-1, next=id_f_ins,
        id_c=I.id_c,
        l_cont=I.l_cont + 1,
        l_cont_bp=I.l_cont_bp + P.len_bp,
        sub_l_cont=I.sub_l_cont + P.sub_len,
    )

    # --- insert-contig fragments, linear case ---
    head = mc & lin & (state.pos < I.pos)  # upstream part keeps old contig
    at_ins = mc & lin & (state.pos == I.pos)
    tail = mc & lin & (state.pos > I.pos)

    cases = [
        (is_pop & lin, pop_lin),
        (is_pop & ~lin, pop_circ),
        (
            head,
            dict(
                circ=0,
                next=jnp.where(state.pos == I.pos - 1, -1, state.next),
                l_cont=I.pos,
                sub_l_cont=I.sub_pos,
                l_cont_bp=I.start_bp,
            ),
        ),
        (
            at_ins,
            dict(
                pos=1,
                sub_pos=P.sub_len,
                id_c=max_id + 1,
                start_bp=P.len_bp,
                circ=0,
                prev=id_f_pop,
                l_cont=I.l_cont - I.pos + 1,
                sub_l_cont=I.sub_l_cont - I.sub_pos + P.sub_len,
                l_cont_bp=I.l_cont_bp - I.start_bp + P.len_bp,
            ),
        ),
        (
            tail,
            dict(
                pos=state.pos - I.pos + 1,
                sub_pos=state.sub_pos - I.sub_pos + P.sub_len,
                id_c=max_id + 1,
                start_bp=state.start_bp - I.start_bp + P.len_bp,
                circ=0,
                l_cont=I.l_cont - I.pos + 1,
                l_cont_bp=I.l_cont_bp - I.start_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont - I.sub_pos + P.sub_len,
            ),
        ),
        # --- circular insert contig: linearize around insertion ---
        (
            mc & ~lin & (state.pos < I.pos),
            dict(
                pos=I.l_cont - I.pos + state.pos + 1,
                sub_pos=I.sub_l_cont - I.sub_pos + state.sub_pos + P.sub_len,
                start_bp=I.l_cont_bp - I.start_bp + state.start_bp + P.len_bp,
                circ=0,
                next=jnp.where(state.pos == I.pos - 1, -1, state.next),
                l_cont=I.l_cont + 1,
                l_cont_bp=I.l_cont_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont + P.sub_len,
            ),
        ),
        (
            mc & ~lin & (state.pos == I.pos),
            dict(
                pos=1,
                sub_pos=P.sub_len,
                start_bp=P.len_bp,
                circ=0,
                prev=id_f_pop,
                l_cont=I.l_cont + 1,
                l_cont_bp=I.l_cont_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont + P.sub_len,
            ),
        ),
        (
            mc & ~lin & (state.pos > I.pos),
            dict(
                pos=state.pos - I.pos + 1,
                sub_pos=state.sub_pos - I.sub_pos + P.sub_len,
                start_bp=state.start_bp - I.start_bp + P.len_bp,
                circ=0,
                next=jnp.where(state.id == I.prev, -1, state.next),
                l_cont=I.l_cont + 1,
                l_cont_bp=I.l_cont_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont + P.sub_len,
            ),
        ),
    ]
    return _apply(state, guard, cases)


def pop_in_2(state: FragState, id_f_pop, id_f_ins, max_id, ori_f_pop) -> FragState:
    """Split-insert the popped fragment RIGHT of id_f_ins (kernel :1373).

    The insert contig keeps [head.., ins, pop]; the downstream part
    becomes contig max_id+1 (circular contigs are linearized instead).
    """
    P = _at(state, id_f_pop)
    I = _at(state, id_f_ins)
    guard = (P.activ == 1) & (I.activ == 1)

    is_pop = state.id == id_f_pop
    mc = (state.id_c == I.id_c) & ~is_pop
    lin = I.circ == 0

    head_l = I.start_bp + I.len_bp + P.len_bp
    head_n = I.pos + 2
    head_s = I.sub_pos + I.sub_len + P.sub_len

    cases = [
        (
            is_pop & lin,
            dict(
                pos=I.pos + 1,
                sub_pos=I.sub_pos + I.sub_len,
                id_c=I.id_c,
                start_bp=I.start_bp + I.len_bp,
                circ=0,
                ori=ori_f_pop,
                prev=id_f_ins,
                next=-1,
                l_cont=head_n,
                l_cont_bp=head_l,
                sub_l_cont=head_s,
            ),
        ),
        (
            is_pop & ~lin,
            dict(
                pos=I.l_cont,
                sub_pos=I.sub_l_cont,
                id_c=I.id_c,
                start_bp=I.l_cont_bp,
                circ=0,
                ori=ori_f_pop,
                prev=id_f_ins,
                next=-1,
                l_cont=I.l_cont + 1,
                l_cont_bp=I.l_cont_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont + P.sub_len,
            ),
        ),
        # linear insert contig
        (
            mc & lin & (state.pos < I.pos),
            dict(circ=0, l_cont=head_n, l_cont_bp=head_l, sub_l_cont=head_s),
        ),
        (
            mc & lin & (state.pos == I.pos),
            dict(
                circ=0, next=id_f_pop,
                l_cont=head_n, l_cont_bp=head_l, sub_l_cont=head_s,
            ),
        ),
        (
            mc & lin & (state.pos > I.pos),
            dict(
                pos=state.pos - (I.pos + 1),
                sub_pos=state.sub_pos - (I.sub_pos + I.sub_len),
                id_c=max_id + 1,
                start_bp=state.start_bp - (I.start_bp + I.len_bp),
                circ=0,
                prev=jnp.where(state.pos == I.pos + 1, -1, state.prev),
                l_cont=I.l_cont - (I.pos + 1),
                l_cont_bp=I.l_cont_bp - (I.start_bp + I.len_bp),
                sub_l_cont=I.sub_l_cont - (I.sub_pos + I.sub_len),
            ),
        ),
        # circular insert contig: linearize, pop goes to the end
        (
            mc & ~lin & (state.pos < I.pos),
            dict(
                pos=(I.l_cont - (I.pos + 1)) + state.pos,
                sub_pos=(I.sub_l_cont - (I.sub_pos + I.sub_len))
                + state.sub_pos,
                start_bp=(I.l_cont_bp - (I.start_bp + I.len_bp))
                + state.start_bp,
                circ=0,
                prev=jnp.where(state.id == I.next, -1, state.prev),
                l_cont=I.l_cont + 1,
                l_cont_bp=I.l_cont_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont + P.sub_len,
            ),
        ),
        (
            mc & ~lin & (state.pos == I.pos),
            dict(
                pos=(I.l_cont - (I.pos + 1)) + I.pos,
                sub_pos=(I.sub_l_cont - (I.sub_pos + I.sub_len)) + I.sub_pos,
                start_bp=(I.l_cont_bp - (I.start_bp + I.len_bp)) + I.start_bp,
                circ=0,
                next=id_f_pop,
                l_cont=I.l_cont + 1,
                l_cont_bp=I.l_cont_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont + P.sub_len,
            ),
        ),
        (
            mc & ~lin & (state.pos > I.pos),
            dict(
                pos=state.pos - (I.pos + 1),
                sub_pos=state.sub_pos - (I.sub_pos + I.sub_len),
                start_bp=state.start_bp - (I.start_bp + I.len_bp),
                circ=0,
                prev=jnp.where(state.pos == I.pos + 1, -1, state.prev),
                l_cont=I.l_cont + 1,
                l_cont_bp=I.l_cont_bp + P.len_bp,
                sub_l_cont=I.sub_l_cont + P.sub_len,
            ),
        ),
    ]
    return _apply(state, guard, cases)


def pop_in_3(state: FragState, id_f_pop, id_f_ins, max_id, ori_f_pop) -> FragState:
    """Insert the popped fragment RIGHT of id_f_ins, no split (kernel :1688)."""
    P = _at(state, id_f_pop)
    I = _at(state, id_f_ins)
    guard = (P.activ == 1) & (I.activ == 1)

    is_pop = state.id == id_f_pop
    mc = (state.id_c == I.id_c) & ~is_pop
    grown = dict(
        l_cont=I.l_cont + 1,
        l_cont_bp=I.l_cont_bp + P.len_bp,
        sub_l_cont=I.sub_l_cont + P.sub_len,
    )

    cases = [
        (
            is_pop,
            dict(
                pos=I.pos + 1,
                sub_pos=I.sub_pos + I.sub_len,
                id_c=I.id_c,
                start_bp=I.start_bp + I.len_bp,
                circ=I.circ,
                ori=ori_f_pop,
                prev=id_f_ins,
                next=I.next,
                **grown,
            ),
        ),
        (
            mc & (state.pos < I.pos),
            dict(
                circ=I.circ,
                prev=jnp.where(
                    (state.id == I.next) & (I.circ == 1),
                    id_f_pop,
                    state.prev,
                ),
                **grown,
            ),
        ),
        (mc & (state.pos == I.pos), dict(circ=I.circ, next=id_f_pop, **grown)),
        (
            mc & (state.pos > I.pos),
            dict(
                pos=state.pos + 1,
                sub_pos=state.sub_pos + P.sub_len,
                start_bp=state.start_bp + P.len_bp,
                circ=I.circ,
                prev=jnp.where(state.pos == I.pos + 1, id_f_pop, state.prev),
                **grown,
            ),
        ),
    ]
    return _apply(state, guard, cases)


# ---------------------------------------------------------------------------


def split_contig(state: FragState, id_f_cut, upstream, max_id) -> FragState:
    """Cut a contig at id_f_cut (kernel :2979).

    upstream=1 cuts before the fragment, upstream=0 after it. Circular
    contigs are linearized (single contig out); linear contigs split in
    two, the downstream part getting id max_id+1.
    """
    C = _at(state, id_f_cut)
    guard = (C.activ == 1) & (C.l_cont > 1)

    mc = state.id_c == C.id_c
    lin = C.circ == 0
    up = upstream == 1

    lt = state.pos < C.pos
    eq = state.pos == C.pos
    gt = state.pos > C.pos

    cases = [
        # linear, cut before C
        (
            mc & lin & up & lt,
            dict(
                circ=0,
                next=jnp.where(state.pos == C.pos - 1, -1, state.next),
                l_cont=C.pos,
                l_cont_bp=C.start_bp,
                sub_l_cont=C.sub_pos,
            ),
        ),
        (
            mc & lin & up & eq,
            dict(
                pos=0, sub_pos=0, id_c=max_id + 1, start_bp=0, circ=0,
                prev=-1,
                l_cont=C.l_cont - C.pos,
                l_cont_bp=C.l_cont_bp - C.start_bp,
                sub_l_cont=C.sub_l_cont - C.sub_pos,
            ),
        ),
        (
            mc & lin & up & gt,
            dict(
                pos=state.pos - C.pos,
                sub_pos=state.sub_pos - C.sub_pos,
                id_c=max_id + 1,
                start_bp=state.start_bp - C.start_bp,
                circ=0,
                l_cont=C.l_cont - C.pos,
                l_cont_bp=C.l_cont_bp - C.start_bp,
                sub_l_cont=C.sub_l_cont - C.sub_pos,
            ),
        ),
        # linear, cut after C
        (
            mc & lin & ~up & lt,
            dict(
                circ=0,
                l_cont=C.pos + 1,
                l_cont_bp=C.start_bp + C.len_bp,
                sub_l_cont=C.sub_pos + C.sub_len,
            ),
        ),
        (
            mc & lin & ~up & eq,
            dict(
                circ=0, next=-1,
                l_cont=C.pos + 1,
                l_cont_bp=C.start_bp + C.len_bp,
                sub_l_cont=C.sub_pos + C.sub_len,
            ),
        ),
        (
            mc & lin & ~up & gt,
            dict(
                pos=state.pos - (C.pos + 1),
                sub_pos=state.sub_pos - (C.sub_pos + C.sub_len),
                id_c=max_id + 1,
                start_bp=state.start_bp - (C.start_bp + C.len_bp),
                circ=0,
                prev=jnp.where(state.pos == C.pos + 1, -1, state.prev),
                l_cont=C.l_cont - (C.pos + 1),
                l_cont_bp=C.l_cont_bp - (C.start_bp + C.len_bp),
                sub_l_cont=C.sub_l_cont - (C.sub_pos + C.sub_len),
            ),
        ),
        # circular, cut before C: linearize starting at C
        (
            mc & ~lin & up & lt,
            dict(
                pos=C.l_cont - C.pos + state.pos,
                sub_pos=C.sub_l_cont - C.sub_pos + state.sub_pos,
                start_bp=C.l_cont_bp - C.start_bp + state.start_bp,
                circ=0,
                next=jnp.where(state.pos == C.pos - 1, -1, state.next),
            ),
        ),
        (
            mc & ~lin & up & eq,
            dict(pos=0, sub_pos=0, start_bp=0, circ=0, prev=-1),
        ),
        (
            mc & ~lin & up & gt,
            dict(
                pos=state.pos - C.pos,
                sub_pos=state.sub_pos - C.sub_pos,
                start_bp=state.start_bp - C.start_bp,
                circ=0,
                next=jnp.where(state.id == C.prev, -1, state.next),
            ),
        ),
        # circular, cut after C: linearize, C becomes the last fragment
        (
            mc & ~lin & ~up & lt,
            dict(
                pos=(C.l_cont - (C.pos + 1)) + state.pos,
                sub_pos=(C.sub_l_cont - (C.sub_pos + C.sub_len))
                + state.sub_pos,
                start_bp=(C.l_cont_bp - (C.start_bp + C.len_bp))
                + state.start_bp,
                circ=0,
                prev=jnp.where(state.id == C.next, -1, state.prev),
            ),
        ),
        (
            mc & ~lin & ~up & eq,
            dict(
                pos=(C.l_cont - (C.pos + 1)) + C.pos,
                sub_pos=(C.sub_l_cont - (C.sub_pos + C.sub_len)) + C.sub_pos,
                start_bp=(C.l_cont_bp - (C.start_bp + C.len_bp)) + C.start_bp,
                circ=0,
                next=-1,
            ),
        ),
        (
            mc & ~lin & ~up & gt,
            dict(
                pos=state.pos - (C.pos + 1),
                sub_pos=state.sub_pos - (C.sub_pos + C.sub_len),
                start_bp=state.start_bp - (C.start_bp + C.len_bp),
                circ=0,
                prev=jnp.where(state.pos == C.pos + 1, -1, state.prev),
            ),
        ),
    ]
    return _apply(state, guard, cases)


def paste_contigs(state: FragState, id_fA, id_fB, max_id) -> FragState:
    """Join contig ends at id_fA and id_fB (kernel :3367).

    Both fragments must sit at a contig extremity. If they belong to
    different contigs, contig A is (possibly reversed so fA is its tail)
    concatenated with contig B (possibly reversed so fB is its head) under
    contig A's id. If they are the two opposite ends of the same contig,
    the contig becomes circular.
    """
    A = _at(state, id_fA)
    B = _at(state, id_fB)
    guard = (A.activ == 1) & (B.activ == 1)

    diff = A.id_c != B.id_c
    inA = state.id_c == A.id_c
    inB = state.id_c == B.id_c

    tot_n = A.l_cont + B.l_cont
    tot_bp = A.l_cont_bp + B.l_cont_bp
    tot_sub = A.sub_l_cont + B.sub_l_cont
    sums = dict(l_cont=tot_n, l_cont_bp=tot_bp, sub_l_cont=tot_sub)

    a_rev = A.pos == 0  # fA at head -> reverse contig A
    b_head = B.pos == 0

    cases = [
        # contig A, fA at head: reverse A
        (
            diff & inA & a_rev,
            dict(
                pos=A.l_cont - (state.pos + 1),
                sub_pos=A.sub_l_cont - (state.sub_pos + state.sub_len),
                start_bp=A.l_cont_bp - (state.start_bp + state.len_bp),
                id_c=A.id_c,
                circ=0,
                ori=state.ori * -1,
                prev=jnp.where(state.pos == A.l_cont - 1, -1, state.next),
                next=jnp.where(state.pos == A.pos, id_fB, state.prev),
                **sums,
            ),
        ),
        # contig A, fA at tail: keep orientation
        (
            diff & inA & ~a_rev,
            dict(
                id_c=A.id_c,
                circ=0,
                next=jnp.where(state.pos == A.pos, id_fB, state.next),
                **sums,
            ),
        ),
        # contig B, fB at head: append as-is
        (
            diff & inB & b_head,
            dict(
                pos=A.l_cont + state.pos,
                sub_pos=A.sub_l_cont + state.sub_pos,
                start_bp=A.l_cont_bp + state.start_bp,
                id_c=A.id_c,
                circ=0,
                prev=jnp.where(state.pos == B.pos, id_fA, state.prev),
                **sums,
            ),
        ),
        # contig B, fB at tail: reverse B then append
        (
            diff & inB & ~b_head,
            dict(
                pos=A.l_cont + (B.l_cont - (state.pos + 1)),
                sub_pos=A.sub_l_cont
                + (B.sub_l_cont - (state.sub_pos + state.sub_len)),
                start_bp=A.l_cont_bp
                + (B.l_cont_bp - (state.start_bp + state.len_bp)),
                id_c=A.id_c,
                circ=0,
                ori=state.ori * -1,
                prev=jnp.where(state.pos == B.pos, id_fA, state.next),
                next=jnp.where(state.pos == 0, -1, state.prev),
                **sums,
            ),
        ),
        # same contig, opposite ends: circularize
        (
            ~diff
            & inA
            & (A.pos == 0)
            & (B.pos == A.l_cont - 1),
            dict(
                circ=1,
                prev=jnp.where(state.pos == A.pos, id_fB, state.prev),
                next=jnp.where(
                    state.pos == A.l_cont - 1, id_fA, state.next
                ),
            ),
        ),
        (
            ~diff
            & inA
            & (A.pos == A.l_cont - 1)
            & (B.pos == 0),
            dict(
                circ=1,
                prev=jnp.where(state.pos == B.pos, id_fA, state.prev),
                next=jnp.where(
                    state.pos == A.l_cont - 1, id_fB, state.next
                ),
            ),
        ),
    ]
    return _apply(state, guard, cases)


# ---------------------------------------------------------------------------
# Block insertions
# ---------------------------------------------------------------------------


def get_bounds(state: FragState, id_f_pop, id_f_ins, list_bounds):
    """Cut positions and validity flags for block inserts (kernel :2124).

    For each of n_bounds block sizes, computes the fragment ids at the
    up-/downstream cut positions around id_f_pop and whether the resulting
    (extract, insert-at-id_f_ins) move is valid and non-redundant.

    Returns (valid[2 * n_bounds], f_upstream[n_bounds],
    f_downstream[n_bounds]) where invalid entries are -1.
    """
    n_bounds = list_bounds.shape[0]
    P = _at(state, id_f_pop)
    I = _at(state, id_f_ins)

    same = P.id_c == I.id_c
    ins_is_ext = (I.pos == 0) | (I.pos == I.l_cont - 1)

    i = jnp.arange(n_bounds)
    # bound i=0: local-flip span between ins and pop (same contig) or the
    # single fragment; 0<i<n-1: +/- list_bounds[i-1]; i=n-1: whole contig.
    flip_up = jnp.where(
        same & (I.pos < P.pos - 1),
        I.pos + 1,
        jnp.where(same & (I.pos > P.pos + 1), P.pos, P.pos),
    )
    flip_down = jnp.where(
        same & (I.pos < P.pos - 1),
        P.pos,
        jnp.where(same & (I.pos > P.pos + 1), I.pos - 1, P.pos),
    )
    sz = list_bounds[jnp.maximum(i - 1, 0)]
    mid_up = jnp.maximum(0, P.pos - sz)
    mid_down = jnp.minimum(P.l_cont - 1, P.pos + sz)

    pos_up = jnp.where(
        i == 0, flip_up, jnp.where(i == n_bounds - 1, 0, mid_up)
    )
    pos_down = jnp.where(
        i == 0,
        flip_down,
        jnp.where(i == n_bounds - 1, P.l_cont - 1, mid_down),
    )

    # validity, upstream cut
    invalid_up = same & (I.pos <= P.pos) & (I.pos >= pos_up)
    ext_up = (pos_up == 0) & (((P.pos - pos_up) == 1) | ins_is_ext)
    pos_up = jnp.where(invalid_up | ext_up, -1, pos_up)
    valid_up = jnp.where(invalid_up | ext_up, -1, 1)

    # validity, downstream cut
    invalid_down = same & (
        ((I.pos >= P.pos) & (I.pos <= pos_down)) | (I.pos == P.pos - 1)
    )
    ext_down = (pos_down == P.l_cont - 1) & (
        ((pos_down - P.pos) == 1) | ins_is_ext
    )
    pos_down = jnp.where(invalid_down | ext_down, -1, pos_down)
    valid_down = jnp.where(invalid_down | ext_down, -1, 1)

    valid = jnp.stack([valid_up, valid_down], axis=1).reshape(-1)

    # fragment ids at the cut positions within contig of P
    in_contig = state.id_c == P.id_c
    def frag_at(p):
        hit = in_contig & (state.pos == p) & (p >= 0)
        return jnp.where(hit.any(), jnp.argmax(hit), -1).astype(jnp.int32)

    f_up = jnp.array([frag_at(pos_up[k]) for k in range(n_bounds)])
    f_down = jnp.array([frag_at(pos_down[k]) for k in range(n_bounds)])
    f_up = jnp.where(pos_up >= 0, f_up, -1)
    f_down = jnp.where(pos_down >= 0, f_down, -1)
    return valid.astype(jnp.int32), f_up.astype(jnp.int32), f_down.astype(jnp.int32)


def extract_block(
    state: FragState, id_f_cut_a, id_f_cut_b, upstream, max_id
) -> FragState:
    """Excise the block between two fragments into contig max_id+1
    (kernel :2400). upstream=1: block = [cut_b .. cut_a]; upstream=0:
    block = [cut_a .. cut_b]. id_f_cut_b == -1 leaves state unchanged.
    """
    A = _at(state, id_f_cut_a)
    safe_b = jnp.maximum(id_f_cut_b, 0)
    B = _at(state, safe_b)
    guard = (A.activ == 1) & (id_f_cut_b >= 0) & (B.activ == 1)

    up = upstream == 1
    lo_pos = jnp.where(up, B.pos, A.pos)
    hi_pos = jnp.where(up, A.pos, B.pos)
    lo_sub = jnp.where(up, B.sub_pos, A.sub_pos)
    lo_bp = jnp.where(up, B.start_bp, A.start_bp)
    size = hi_pos - lo_pos + 1
    sub_size = jnp.where(
        up,
        A.sub_pos - B.sub_pos + A.sub_len,
        B.sub_pos - A.sub_pos + B.sub_len,
    )
    size_bp = jnp.where(
        up,
        A.start_bp - B.start_bp + A.len_bp,
        B.start_bp - A.start_bp + B.len_bp,
    )

    mc = state.id_c == A.id_c
    before = mc & (state.pos < lo_pos)
    inside = mc & (state.pos >= lo_pos) & (state.pos <= hi_pos)
    after = mc & (state.pos > hi_pos)

    # neighbour of the last fragment before the gap / first after it
    bridge_next = jnp.where(up, A.next, B.next)
    bridge_prev = jnp.where(up, B.prev, A.prev)

    cases = [
        (
            before,
            dict(
                circ=A.circ,
                next=jnp.where(state.pos == lo_pos - 1, bridge_next, state.next),
                l_cont=A.l_cont - size,
                sub_l_cont=A.sub_l_cont - sub_size,
                l_cont_bp=A.l_cont_bp - size_bp,
            ),
        ),
        (
            inside,
            dict(
                pos=state.pos - lo_pos,
                sub_pos=state.sub_pos - lo_sub,
                id_c=max_id + 1,
                start_bp=state.start_bp - lo_bp,
                circ=0,
                prev=jnp.where(state.pos == lo_pos, -1, state.prev),
                next=jnp.where(state.pos == hi_pos, -1, state.next),
                l_cont=size,
                sub_l_cont=sub_size,
                l_cont_bp=size_bp,
            ),
        ),
        (
            after,
            dict(
                pos=state.pos - size,
                sub_pos=state.sub_pos - sub_size,
                start_bp=state.start_bp - size_bp,
                circ=A.circ,
                prev=jnp.where(state.pos == hi_pos + 1, bridge_prev, state.prev),
                l_cont=A.l_cont - size,
                sub_l_cont=A.sub_l_cont - sub_size,
                l_cont_bp=A.l_cont_bp - size_bp,
            ),
        ),
    ]
    return _apply(state, guard, cases)


def insert_block(
    state: FragState,
    init_state: FragState,
    id_f_pop,
    id_f_ins,
    id_extremity,
    upstream,
    valid,
) -> FragState:
    """Insert the block contig (containing id_f_pop in the post-extract
    `state`) right of id_f_ins (kernel :2724).

    `id_extremity` is the fragment at the block's other end (the cut
    fragment); when the block was cut upstream of id_f_pop (upstream=1)
    the block is inserted reversed, so id_f_pop ends up adjacent to
    id_f_ins in both cases. Falls back to `init_state` when the move is
    invalid (inactive fragments, same contig, or valid == -1).
    """
    P = _at(state, id_f_pop)
    I = _at(state, id_f_ins)
    ok = (
        (P.activ == 1)
        & (I.activ == 1)
        & (P.id_c != I.id_c)
        & (valid != -1)
    )

    inI = (state.id_c == I.id_c) & (state.id_c != P.id_c)
    inP = state.id_c == P.id_c
    up = upstream == 1

    sums = dict(
        l_cont=I.l_cont + P.l_cont,
        sub_l_cont=I.sub_l_cont + P.sub_l_cont,
        l_cont_bp=I.l_cont_bp + P.l_cont_bp,
    )

    cases = [
        # insert-contig fragments
        (
            inI & (state.pos < I.pos),
            dict(
                circ=I.circ,
                prev=jnp.where(
                    (state.id == I.next) & (I.circ == 1),
                    id_extremity,
                    state.prev,
                ),
                **sums,
            ),
        ),
        (
            inI & (state.pos == I.pos),
            dict(circ=I.circ, next=id_f_pop, **sums),
        ),
        (
            inI & (state.pos > I.pos),
            dict(
                pos=state.pos + P.l_cont,
                sub_pos=state.sub_pos + P.sub_l_cont,
                start_bp=state.start_bp + P.l_cont_bp,
                circ=I.circ,
                prev=jnp.where(
                    state.pos == I.pos + 1, id_extremity, state.prev
                ),
                **sums,
            ),
        ),
        # block fragments, original orientation (downstream cut)
        (
            inP & ~up,
            dict(
                pos=I.pos + 1 + state.pos,
                sub_pos=I.sub_pos + I.sub_len + state.sub_pos,
                id_c=I.id_c,
                start_bp=I.start_bp + I.len_bp + state.start_bp,
                circ=I.circ,
                prev=jnp.where(state.pos == 0, id_f_ins, state.prev),
                next=jnp.where(
                    state.pos == state.l_cont - 1, I.next, state.next
                ),
                **sums,
            ),
        ),
        # block fragments, reversed (upstream cut)
        (
            inP & up,
            dict(
                pos=I.pos + 1 + (P.l_cont - state.pos - 1),
                sub_pos=I.sub_pos
                + I.sub_len
                + (P.sub_l_cont - state.sub_pos - state.sub_len),
                id_c=I.id_c,
                start_bp=I.start_bp
                + I.len_bp
                + (P.l_cont_bp - state.start_bp - state.len_bp),
                circ=I.circ,
                ori=state.ori * -1,
                prev=jnp.where(
                    state.pos == state.l_cont - 1, id_f_ins, state.next
                ),
                next=jnp.where(state.pos == 0, I.next, state.prev),
                **sums,
            ),
        ),
    ]
    mutated = _apply(state, True, cases)
    out = {}
    for name in FragState._fields:
        if name == "id":
            out[name] = state.id
            continue
        out[name] = jnp.where(
            ok, getattr(mutated, name), getattr(init_state, name)
        )
    return FragState(**out)


def explode_and_shuffle(state: FragState, key) -> FragState:
    """bomb_the_genome: explode with a random contig-id shuffle
    (reference cuda_lib_gl_single.py:1925-1948).
    """
    import jax

    order = jax.random.permutation(key, state.n_frags).astype(jnp.int32)
    return explode_genome(state, order)
