"""Fully on-device sweep engine: a whole cycle in one lax.scan.

The host-driven Sampler pays one dispatch + host round-trip per sweep
step (~ms through a tunneled TPU). Here the entire cycle — fragment
order, neighbour sampling, candidate generation, scoring, accept, and
the nuisance-parameter MH — runs inside a single jitted lax.scan, so a
cycle of n_frags steps is one device call.

Performance design (see docs/DESIGN.md):

- Sub-fragment geometry is packed into one [n_sub, 8] f32 matrix
  (lanes: pos_bp, id_c, s_tot, pos, l_cont) so per-pixel gathers fetch
  one contiguous 32-byte row instead of five scattered scalars.
- Per-pixel scoring uses the single-transcendental Rippe form
  (`expected_counts_fast`) and a precomputed data-only Poisson
  normalization (`poisson_norm` — observed counts never change), so the
  per-pixel math is 1 pow + 1 exp + 1 log10 per expectation instead of
  the branch-dispatched ~10 transcendentals of the spec form.
- The n_neighbours candidate pairs of a step are scored by `jax.vmap`
  (not `lax.map`, which lowers to a serial loop): the 24-way mutated
  states, their sub-fragment projections, and all O(nnz) mask/compact
  work batch over a leading candidate axis, and the accepted move is
  *selected* from the already-built [n_cand, 24] state stack instead of
  being re-generated.
- The per-pixel score vector pp_cur[nnz] of the *current* genome is
  carried through the scan and updated incrementally: after an accepted
  move, only the pixels with both endpoints in the two affected contigs
  can change (exact — single-endpoint pixels are trans before and
  after), with an in-graph fallback to a full recompute if the update
  set overflows its capacity. Accepted nuisance moves reuse the
  full-sweep scores their own MH evaluation already produced.
- Candidate scoring refines the reference's slice trick (slice_sp_mat
  kernel :485, eval_all_scores :4029) with a cis/trans split: pixels
  with one endpoint in the affected contigs are trans under every
  mutation and contribute a data-only flat term summed by masked
  reduction (no gather, no compaction); only pixels with BOTH
  endpoints in the affected contigs are compacted
  (jnp.nonzero(size=cap)) and re-gathered for the 24 mutations.
  backend="sliced" additionally applies the reference's same-contig
  windowing; "full" (unwindowed) is exact per candidate.
  score = nz_total - sum(pp_cur*touch) + sum(g_trans*(touch-both))
          + nz_both_mut + zeros_mut.
- backend="seg" (the beyond-block-envelope default) is the same exact
  cis/trans-split delta as "full" with the per-candidate
  jnp.nonzero-over-nnz compaction replaced by a per-STEP sorted
  contig-pair index: pixels are keyed by the unordered contig-pair
  code min(cA,cB)*ncp + max(cA,cB) and sorted once per sweep step
  (lax.sort_key_val, shared by all candidates and the post-accept
  cache update). A candidate's both-endpoint pixel set is then the
  union of the three contiguous segments (a,a), (a,b), (b,b), located
  by searchsorted in O(log nnz) and gathered in O(cap) — so the only
  O(nnz) work per CANDIDATE is cheap fused masked sums, and the
  engine's step cost stays O(nnz) at every genome scale (the
  reference's own property: its hot kernels are O(slice) via
  slice_sp_mat :485 / eval_sub_likelihood :4236). HBM stays O(nnz)
  (no dense [S+1]^2 grid), so fine pyramid levels and large genomes
  keep block-class throughput instead of falling back to the
  nonzero-compaction delta paths.
- Oversized slices are re-scored exactly through one step-level
  `lax.cond` over *all* candidates (any candidate overflowing triggers
  a full-matrix pass whose result replaces only the overflowed rows) —
  vmap-compatible, so multi-chain execution keeps exact scoring.

Neighbour sampling uses a per-fragment top-K contact table with Gumbel
top-k sampling (device-side analogue of the reference's host
np.random.choice over raw contact counts, cuda_lib_gl_single.py:3053).
The nuisance d_max update replaces the host fsolve with a jitted Newton
solve of rippe(s) = v_inter.
"""

from __future__ import annotations

import types as _types
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.moves import (
    N_MUTATIONS,
    all_candidate_states,
    candidate_validity,
    renumber_contigs,
    single_candidate_state,
)
from ..core.state import FragState
from ..model.likelihood import LOG10_E, log10_poisson, poisson_norm
from ..model.rippe import (
    RippeParams,
    expected_counts,
    expected_counts_fast,
    expected_counts_with_log10,
)

PACK = 8  # packed attribute row width (5 used lanes, padded to 8)

# Matmul precision for the block backend's contig-pair aggregate
# einsums. HIGH (3-pass bf16) is the default: measured max 0.044 abs
# error on yeast-L4 aggregates — two orders below the log-unit-scale
# candidate score gaps decisions are made at — for +9.5% whole-cycle
# throughput vs HIGHEST (336.7 vs 307.5 steps/s, v5e). The error
# cannot accumulate: the block step recomputes its nz base from the
# dense grid every step. HIGHEST (6-pass = exact f32) is one env var
# away; DEFAULT (1-pass) corrupts aggregates (~14 log-units) — never
# use it.
import os as _os

_AGG_PRECISION = jax.lax.Precision[
    _os.environ.get("INSTAGRAAL_TPU_AGG_PREC", "HIGH")
]

# id headroom above n_frags during a step's mutation chains (the seg
# shard variant keys pixels by contig-pair codes and needs the bound)
SEG_ID_SLACK = 16

# Below this fragment count the seg backend's LOCAL candidate
# generation (mutate only the pair's member fragments in a compact
# mini-state) is off by default: the O(n) full-state generation is
# already sub-millisecond there and the local path's extra index math
# has nothing to amortize. Measured crossover: see docs/DESIGN.md
# (scripts/large_scale_probe.py compares both at 50k-200k frags).
SEG_LOCAL_MIN_FRAGS = 1024


# Per-step behaviour traces, packed in-graph into ONE f32 [K] vector
# (scan stacks them to [T, K]) so a cycle's traces cross the
# host<->device boundary in a single transfer. 15 separate per-key
# D2H fetches measured 0.39 s per yeast-L4 cycle on the tunneled v5e
# — 35% of the whole cycle wall time. Integer lanes ride f32 exactly
# up to 2^24 (ids/counts are < n_frags; slice_max is diagnostic-only
# past that).
TRACE_KEYS = (
    "likelihood", "op", "id_fA", "id_fB", "n_contigs", "mean_len",
    "fact", "slope", "d_max", "d_nuc", "d", "success",
    "slice_overflow", "slice_max", "dist_init_genome",
)
_TRACE_INT = {
    "op", "id_fA", "id_fB", "n_contigs", "slice_overflow", "slice_max"
}
_TRACE_BOOL = {"success"}


def traces_to_host(packed) -> dict:
    """Unpack a [..., T, K] packed trace array into the host-facing
    dict of numpy arrays (the engine's public trace API)."""
    a = np.asarray(packed)
    out = {}
    for i, k in enumerate(TRACE_KEYS):
        v = a[..., i]
        if k in _TRACE_INT:
            v = v.astype(np.int32)
        elif k in _TRACE_BOOL:
            v = v.astype(bool)
        out[k] = v
    return out


class SegLocalCtx(NamedTuple):
    """Per-step context for the seg backend's local candidate path.

    Rides the (otherwise unused) g_trans slot of the step ctx tuple:
    packed_cur is the step's [n_sub, PACK] projection, and
    (intra_cur, ni_cur) the zeros-term partial sums of the CURRENT
    genome — candidates score their zeros term as a member-window
    delta against these instead of an O(n_sub) pass per mutation.
    """

    packed_cur: jnp.ndarray
    intra_cur: jnp.ndarray
    ni_cur: jnp.ndarray


class ChainBatchedFns(NamedTuple):
    """Jitted engine entry points batched over a leading chain axis.

    cycle(state, params, ll, keys, flags): one full cycle per chain;
    chunk(state, params, ll, pp, nz, order, keys, flags): a bounded
    slice of each chain's sweep (per-pixel caches thread across calls);
    init_cache(state, params): per-chain pixel-score caches.
    Produced by SweepEngine.make_chain_batched.
    """

    cycle: object
    chunk: object
    init_cache: object


def _chain_batched_shard_map(
    mesh, n_chains, get_fns, operands, operand_specs, pp_spec
):
    """Build ChainBatchedFns by shard_mapping chain-batched wrappers.

    get_fns(*local_operands) -> the (cycle, initial, chunk, init_cache)
    tuple of _make_cycle; operands are extra shard_map inputs (the
    sharded pixel arrays in the shard_nnz layout, empty when the pixel
    arrays are replicated closure constants). One chains-row holds
    n_chains/|chains| chain states; when that local count is 1 (the
    standard layout) the vmap is skipped so each device runs the exact
    single-chain graph. pp_spec is the per-pixel cache's spec
    (P("chains", "shards") when the cache is pixel-sharded,
    P("chains") for replicated or dummy caches).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    c_mesh = mesh.shape.get("chains", 1)
    if n_chains % c_mesh:
        raise ValueError(
            f"{n_chains} chains not divisible by the mesh chains "
            f"axis ({c_mesh})"
        )
    local = n_chains // c_mesh
    Pc = P("chains")

    def _per_chain(fn, batched, shared):
        if local == 1:
            one = [jax.tree.map(lambda x: x[0], b) for b in batched]
            out = fn(*one, *shared)
            return jax.tree.map(lambda x: jnp.expand_dims(x, 0), out)
        return jax.vmap(lambda *b: fn(*b, *shared))(*batched)

    # operands (the sharded pixel buffers) ride as RUNTIME ARGS of the
    # jitted wrappers, never as closure constants — a closed-over
    # jax.Array is serialized into the HLO literal-by-literal, which
    # blows the remote-compile request cap at config-#5 nnz
    def cycle_b(state, params, ll, keys, flags, *ops):
        def inner(state, params, ll, keys, flags, *ops):
            f = get_fns(*ops)[0]
            return _per_chain(f, (state, params, ll, keys), (flags,))

        return shard_map(
            inner,
            mesh=mesh,
            in_specs=(Pc, Pc, Pc, Pc, P()) + operand_specs,
            out_specs=Pc,
            check_vma=False,
        )(state, params, ll, keys, flags, *ops)

    def chunk_b(state, params, ll, pp, nz, order, keys, flags, *ops):
        def inner(state, params, ll, pp, nz, order, keys, flags, *ops):
            f = get_fns(*ops)[2]
            return _per_chain(
                f, (state, params, ll, pp, nz, order, keys), (flags,)
            )

        return shard_map(
            inner,
            mesh=mesh,
            in_specs=(Pc, Pc, Pc, pp_spec, Pc, Pc, Pc, P())
            + operand_specs,
            out_specs=(Pc, Pc, Pc, pp_spec, Pc, Pc),
            check_vma=False,
        )(state, params, ll, pp, nz, order, keys, flags, *ops)

    def init_b(state, params, *ops):
        def inner(state, params, *ops):
            f = get_fns(*ops)[3]
            return _per_chain(f, (state, params), ())

        return shard_map(
            inner,
            mesh=mesh,
            in_specs=(Pc, Pc) + operand_specs,
            out_specs=(pp_spec, Pc),
            check_vma=False,
        )(state, params, *ops)

    jit_cycle = jax.jit(cycle_b)
    jit_chunk = jax.jit(chunk_b)
    jit_init = jax.jit(init_b)
    return ChainBatchedFns(
        cycle=lambda s, p, ll, k, f: jit_cycle(
            s, p, ll, k, f, *operands
        ),
        chunk=lambda s, p, ll, pp, nz, o, k, f: jit_chunk(
            s, p, ll, pp, nz, o, k, f, *operands
        ),
        init_cache=lambda s, p: jit_init(s, p, *operands),
    )


class NeighbourTable(NamedTuple):
    """Top-K contact partners per fragment, with sampling logits."""

    ids: jnp.ndarray  # [n_frags, K] neighbour fragment ids
    logits: jnp.ndarray  # [n_frags, K] log contact counts, -inf padded

    @classmethod
    def build(cls, level_csr, n_frags: int, k: int = 32) -> "NeighbourTable":
        """Per-row top-k by contact count, deterministic tie order
        (count desc, partner id asc).

        Deliberately a per-row loop: the inner ops are numpy over
        ~row-length segments, measured 2.1 s at 200k frags / 11.5 s at
        1M frags (scripts/setup_scale_probe.py) — a once-per-run cost.
        Two global-sort vectorizations were measured SLOWER (8.4 s /
        89 s at the same scales): per-row top-k via one global
        (row, -count, col) sort spends its time in 10M+-element
        random-index gathers and scatters, which lose to C-speed
        per-segment argsort at every scale tried. (VERDICT r3 #5
        assumed this loop was the scaling hazard; measurement says
        otherwise.)"""
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
                # no contacts: uniform fallback (reference
                # cuda_lib_gl_single.py:3124)
                take = np.random.default_rng(i).choice(
                    n_frags, size=min(k, n_frags), replace=False
                )
                ids[i, : len(take)] = take
                logits[i, : len(take)] = 0.0
                continue
            top = np.lexsort((xk, -vk))[:k]
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


def project_packed(state: FragState, idx) -> jnp.ndarray:
    """Pack the sub-fragment geometry into one [n_sub, PACK] f32 matrix.

    Lanes: 0 pos_bp(kb), 1 contig id, 2 circular s_tot(kb), 3 position
    in sub units, 4 contig length in sub units. Functionally equivalent
    to project_to_sub (uni_fill_vect_dist, kernel :3763) but laid out
    for one-row-per-gather access.
    """
    # Measured negative result: packing the 7 needed lanes into one
    # [n_frags, 8] matrix and fetching them with a single row gather
    # ran 11% SLOWER end-to-end (350 vs 393 steps/s yeast-L4) — under
    # the 5x24 candidate vmap the pack materializes a [5,24,n_frags,8]
    # intermediate that costs more than the 8 small per-lane gathers
    # it replaces. Keep the per-lane form.
    f = idx.frag_of_sub
    ori = state.ori[f]
    d = jnp.where(ori == 1, idx.w_dist, idx.c_dist)
    pos = jnp.where(
        ori == 1,
        state.sub_pos[f] + idx.j_of_sub,
        state.sub_pos[f] + (state.sub_len[f] - 1) - idx.j_of_sub,
    )
    zero = jnp.zeros_like(d)
    return jnp.stack(
        [
            state.start_bp[f].astype(jnp.float32) / 1000.0 + d,
            state.id_c[f].astype(jnp.float32),
            state.circ[f].astype(jnp.float32)
            * state.l_cont_bp[f].astype(jnp.float32)
            / 1000.0,
            pos.astype(jnp.float32),
            state.sub_l_cont[f].astype(jnp.float32),
            zero,
            zero,
            zero,
        ],
        axis=1,
    )


def pp_from_attrs(ra, ca, data, p: RippeParams, msf):
    """Per-pixel scoring term from packed attribute rows (spec form).

    ra/ca: [..., PACK] row/col attributes; data: [...] observed counts.
    Same math as evaluate_likelihood_sparse (kernel :4374). The hot path
    uses `pp_rows_fast` (algebraically equal, fewer transcendentals);
    this branch-exact form is kept as the executable spec.
    """
    cis = ra[..., 1] == ca[..., 1]
    s = jnp.abs(ra[..., 0] - ca[..., 0])
    s_z = jnp.abs(ra[..., 3] - ca[..., 3]) * msf
    circ = ra[..., 2] > 0
    s_tot = jnp.where(circ, ra[..., 2], 0.0)
    s_tot_z = jnp.where(circ, ra[..., 4] * msf, 0.0)
    ex = jnp.where(cis, expected_counts(s, s_tot, p), p.v_inter)
    ex_z = jnp.where(cis, expected_counts(s_z, s_tot_z, p), p.v_inter)
    return log10_poisson(ex, data) + ex_z * LOG10_E


def pp_rows_fast(ra, ca, dn, p: RippeParams, msf):
    """Per-pixel scoring term, fast form.

    ra/ca: [..., PACK] packed endpoint rows; dn: [..., 2] rows of
    (observed count, poisson_norm(count)). Equal to `pp_from_attrs` up
    to f32 association: uses the single-exp Rippe form whose argument
    doubles as log10(expected) (expected_counts_with_log10 — 4
    elementwise transcendentals per pixel instead of 7) and the
    precomputed data-only Poisson normalization.
    """
    data = dn[..., 0]
    norm = dn[..., 1]
    cis = ra[..., 1] == ca[..., 1]
    s = jnp.abs(ra[..., 0] - ca[..., 0])
    s_z = jnp.abs(ra[..., 3] - ca[..., 3]) * msf
    circ = ra[..., 2] > 0
    s_tot = jnp.where(circ, ra[..., 2], 0.0)
    s_tot_z = jnp.where(circ, ra[..., 4] * msf, 0.0)
    ex_c, log_ex_c = expected_counts_with_log10(s, s_tot, p)
    log10_v = jnp.log(jnp.maximum(p.v_inter, 1e-38)) * np.float32(
        0.4342944819032518
    )
    ex = jnp.where(cis, ex_c, p.v_inter)
    log_ex = jnp.where(cis, log_ex_c, log10_v)
    ex_z = jnp.where(cis, expected_counts_fast(s_z, s_tot_z, p), p.v_inter)
    return data * log_ex - ex - norm + ex_z * LOG10_E


def zeros_from_packed(packed, p: RippeParams, msf, n_pix_total):
    """Analytic zeros term from packed attributes (kernel :3850)."""
    pos = packed[:, 3]
    l_cont = packed[:, 4]
    circ = packed[:, 2] > 0
    s = pos * msf
    s_tot_z = jnp.where(circ, l_cont * msf, 0.0)
    ex = expected_counts(s, s_tot_z, p)
    intra = jnp.sum(jnp.where(pos > 0, -ex * (l_cont - pos), 0.0))
    n_intra = jnp.sum(
        jnp.where(pos == 0, l_cont * (l_cont - 1.0) / 2.0, 0.0)
    )
    inter = (n_pix_total - n_intra) * (-p.v_inter)
    return LOG10_E * (intra + inter)


def zeros_packed_fast(packed, p: RippeParams, msf, n_pix_total):
    """`zeros_from_packed` with the single-transcendental Rippe form."""
    pos = packed[:, 3]
    l_cont = packed[:, 4]
    circ = packed[:, 2] > 0
    s = pos * msf
    s_tot_z = jnp.where(circ, l_cont * msf, 0.0)
    ex = expected_counts_fast(s, s_tot_z, p)
    intra = jnp.sum(jnp.where(pos > 0, -ex * (l_cont - pos), 0.0))
    n_intra = jnp.sum(
        jnp.where(pos == 0, l_cont * (l_cont - 1.0) / 2.0, 0.0)
    )
    inter = (n_pix_total - n_intra) * (-p.v_inter)
    return LOG10_E * (intra + inter)


def make_dist_fn(init_state: FragState, orientable):
    """Device-side structural distance from the initial genome
    (vectorized reference dist_inter_genome, cuda_lib_gl_single.py:665).
    """
    prev0 = init_state.prev
    next0 = init_state.next
    ori0 = jnp.ones_like(init_state.ori)
    orientable = jnp.asarray(orientable)
    n = prev0.shape[0]
    norm = 3.0 * n

    def dist(state: FragState):
        prev1, next1, ori1 = state.prev, state.next, state.ori
        d = jnp.full(n, 3.0)
        same_pair = ((prev1 == prev0) & (next1 == next0)) | (
            (prev1 == next0) & (next1 == prev0)
        )
        d = d - same_pair
        swap = jnp.where(orientable & (ori1 != ori0), -1, 1)
        p1 = jnp.where(swap == -1, next1, prev1)
        n1 = jnp.where(swap == -1, prev1, next1)

        def credit(nb1, nb0):
            match = nb1 == nb0
            nb_safe = jnp.clip(nb1, 0, n - 1)
            anchor_free = (nb0 == -1) | ~orientable[nb_safe]
            full = match & anchor_free
            half = match & ~anchor_free
            ori_match = half & (
                ori0[jnp.clip(nb0, 0, n - 1)] == swap * ori1[nb_safe]
            )
            return full * 1.0 + half * 0.5 + ori_match * 0.5

        d_orient = credit(p1, prev0) + credit(n1, next0)
        d_plain = (
            ((prev1 == prev0) | (prev1 == next0)) * 1.0
            + ((next1 == next0) | (next1 == prev0)) * 1.0
        )
        d = d - jnp.where(orientable, d_orient, d_plain)
        return jnp.sum(d) / norm

    return dist


def suggest_slice_capacity(sim, margin: float = 1.25, floor: int = 4096):
    """Data-driven capacity for `SweepEngine`'s gathered pixel set.

    Candidate scoring only gathers pixels with BOTH endpoints in the
    candidate pair's two contigs (single-endpoint pixels stay trans
    under every mutation — see score_candidate). For the *current*
    state the worst case over pairs (A, B) is
    ``cis(A) + cis(B) + cross(A, B)``; this returns ``min(nnz,
    margin * that bound)`` (with a floor).

    Contigs merge as scaffolding progresses, so capacities derived from
    a bombed state grow stale; with ``exact_overflow=True`` (the engine
    default) a stale capacity only costs occasional exact full-matrix
    fallbacks, never accuracy. The ``slice_max`` trace records the real
    per-step maxima for re-tuning between cycles. (Measured on yeast L4,
    278k nnz: worst pair 1.5k pixels on the 147-contig draft, 24k at the
    true 17-chromosome assembly.)
    """
    state = sim.state
    idx = sim.sub_index
    frag_of_sub = np.asarray(idx.frag_of_sub)
    contig_of_sub = np.asarray(state.id_c)[frag_of_sub]
    n_contigs = int(contig_of_sub.max()) + 1
    rows_c = contig_of_sub[np.asarray(sim.coo_rows)].astype(np.int64)
    cols_c = contig_of_sub[np.asarray(sim.coo_cols)].astype(np.int64)
    nnz = int(rows_c.shape[0])
    cis = np.bincount(
        rows_c[rows_c == cols_c], minlength=n_contigs
    )
    trans = rows_c != cols_c
    lo = np.minimum(rows_c[trans], cols_c[trans])
    hi = np.maximum(rows_c[trans], cols_c[trans])
    codes, cross = np.unique(lo * n_contigs + hi, return_counts=True)
    if codes.size:
        pair_tot = (
            cis[(codes // n_contigs)] + cis[(codes % n_contigs)] + cross
        )
        worst = int(pair_tot.max())
    else:
        worst = 0
    # a pair with no cross contacts can still pair the two heaviest cis
    top2_cis = int(np.sort(cis)[-2:].sum()) if n_contigs > 1 else int(
        cis.max() if cis.size else 0
    )
    worst = max(worst, top2_cis)
    return int(min(nnz, max(floor, round(margin * worst))))


class SweepEngine:
    """Builds the jitted cycle function for a Simulation."""

    def __init__(
        self,
        sim,
        n_neighbours: int = 5,
        backend: str = "auto",
        slice_capacity: int | None = None,
        neighbour_k: int | None = None,
        sample_param: bool = True,
        mesh=None,
        exact_overflow: bool = True,
        wide_rows: bool = False,
        block_capacity: int | str = "auto",
        block_tri: bool = False,
        shard_nnz: bool = False,
        steps_per_call: int | str | None = "auto",
        seg_local: bool | str = "auto",
        _seg_local_caps: tuple[int, int] | None = None,
    ):
        """mesh: optional 1D jax.sharding.Mesh with axis "shards". When
        given, candidate scoring is sharded across its devices with
        shard_map — the candidate count is rounded up to the device
        count, so every chip scores (at least) one candidate's 24
        mutations per step and a v5e-8 evaluates 8+ candidates at the
        single-candidate wall cost.

        shard_nnz: shard the contact-matrix COO arrays (rows, cols,
        data) along mesh's "shards" axis instead of sharding the
        candidate batch, so per-chip HBM scales as nnz / n_shards —
        the multi-host pod layout for genomes whose fine-level contact
        maps don't fit one chip (SURVEY.md §5.8, BASELINE config #5).
        The whole cycle runs inside one shard_map: every O(nnz)
        mask/compact/score reduction works on the local pixel shard
        and merges through psum; the O(n_frags) sweep control is
        replicated. Not composable with the block backend (whose dense
        grid is not pixel-sharded), wide_rows, or MultiChainSweep.

        steps_per_call: split each cycle into device calls of at most
        this many sweep steps (the per-pixel cache threads between
        calls, so results are bit-identical to the single-call cycle).
        Needed where a transport kills any single device execution
        past a wall-time budget — the tunneled TPU used for
        development faults runs >~60 s, which a fine-level cycle
        (thousands of fragments x ~10 ms) exceeds. None = whole cycle
        in one call. "auto" (default) = size calls from a per-backend
        cost model, then calibrate against a timed probe chunk on the
        first TPU cycle (calibrate_steps_per_call) so the sizing
        tracks the actual hardware; "model" = the cost model alone
        (no probe). Composes with shard_nnz (the cache shard stays
        resident per device between calls).

        exact_overflow: when True (default), any candidate whose
        touched slice exceeds ``slice_capacity`` triggers one exact
        full-matrix scoring pass for the step (`lax.cond`), whose rows
        replace the overflowed candidates' scores — so any capacity is
        safe; smaller caps only cost occasional full recomputes. The
        cond predicate aggregates over the whole candidate batch, so
        this stays a real branch under the per-step scan *and* remains
        correct (select of two exact values) under vmap.

        wide_rows: gather candidate attributes in sub-major layout
        ([n_sub, 24, 8]: one 768B gather per pixel-endpoint fetches all
        24 mutations) instead of mutation-major ([24, n_sub, 8]: 24
        separate 32B-row gathers). Candidate scoring is gather
        issue-rate bound (~0.6ns/row measured on v5e), so fewer, wider
        gathers trade issue count for bytes. Measured slower (see
        DESIGN.md) — kept as a documented negative result.

        block_capacity: max SUB-FRAGMENT count of a candidate pair's
        two contigs for the "block" backend (int, or "auto" = n_sub+1
        rounded to 128, capped at 640); larger pairs fall back to the
        exact full-matrix pass.

        block_tri: restrict the block backend's dense member-grid
        rescore to the strict upper triangle. The COO is canonical
        upper-triangular (pyramid/level.py triu k=1) and member ids
        come out of ``jnp.nonzero`` sorted, so every observed pixel of
        the pair's block lands at grid position (p, q) with p < q —
        the lower triangle and diagonal of the [24, bcap, bcap]
        pp grid are pure masked-out VPU waste. The triangle variant
        gathers the bcap*(bcap-1)/2 upper cells through STATIC
        `jnp.take` indices (no data-dependent gather) and halves the
        transcendental work per candidate, at the cost of
        materializing [24, T, PACK] gathered operands the square form
        never builds (its broadcasts fuse). Measured on a v5e chip
        (yeast-L4, bcap=384): 60 vs 422 steps/s — the gather
        materialization dwarfs the saved transcendentals, so this
        stays a tested, documented negative result. Keep it off."""
        self.sim = sim
        self.mesh = mesh
        self.shard_nnz = bool(shard_nnz)
        if shard_nnz:
            if mesh is None:
                raise ValueError("shard_nnz requires a mesh")
            if wide_rows:
                raise ValueError("shard_nnz + wide_rows not supported")
            if backend == "block":
                raise ValueError(
                    "the dense block backend is not pixel-sharded; use "
                    "backend='seg'/'full'/'sliced'/'plain' with "
                    "shard_nnz"
                )
        nnz = int(sim.coo_rows.shape[0])
        slice_capacity_req = slice_capacity
        if slice_capacity == "auto":
            slice_capacity = suggest_slice_capacity(sim)
        elif slice_capacity is None:
            slice_capacity = int(min(nnz, max(4096, nnz // 16)))
        n_sub_total = int(np.asarray(sim.sub_index.frag_of_sub).shape[0])
        # seg eligibility: the fast layouts (row-sorted canonical COO,
        # static CSR/CSC run windows — replicated, or per-shard under
        # shard_nnz) work at ANY genome scale: pixel compaction rides
        # static runs, no pair codes at all. Only the legacy
        # per-step-sorted shard variant (INSTAGRAAL_TPU_SEG_SORTED=1)
        # keys pixels by an int32 ordered contig-pair code
        # row*ncp + col, so only there must codes fit (~46k frags).
        rows_sorted = bool(
            np.all(np.diff(np.asarray(sim.coo_rows)) >= 0)
        )
        seg_codes_fit = (
            (sim.n_frags + SEG_ID_SLACK) ** 2 <= np.iinfo(np.int32).max
        )
        seg_sort_free = (
            _os.environ.get("INSTAGRAAL_TPU_SEG_SORTED", "0") != "1"
        )
        seg_ok = (
            (rows_sorted and (not shard_nnz or seg_sort_free))
            or seg_codes_fit
        )
        if backend == "auto":
            # "plain" scores all nnz pixels per mutation with no delta
            # bookkeeping — fastest below ~16k nnz (measured: synthetic
            # 7.8k-nnz bench 209 steps/s plain vs 188 delta). "block"
            # runs the cis/trans-split delta with per-contig-pair
            # aggregate matrices + DENSE rescoring of the candidate
            # pair's sub-matrix: no per-pixel index compaction at all
            # (profiled: jnp.nonzero over [n_cand, nnz] was 12 ms/step
            # of the 25 ms yeast-L4 step, half the whole budget) — the
            # preferred backend whenever the dense [n_sub+1]^2 observed
            # matrix fits HBM comfortably. Beyond that envelope "seg"
            # keeps the exact delta O(nnz)/step via the per-step sorted
            # contig-pair index (see module docstring). "full" and
            # "sliced" are the nonzero-compaction delta paths, kept for
            # genomes whose pair codes exceed int32 (> ~46k frags at
            # the scaffolding level) and as executable references; they
            # differ only in the reference's same-contig windowing of
            # the touch mask (unwindowed "full" is exact per candidate).
            # the block-vs-seg crossover is MEASURED at/above the
            # envelope, not below it (scripts/crossover_probe.py on
            # the real v5e, docs/crossover.json: block wins L4 600 vs
            # 109 steps/s and L3 197 vs 123; seg only takes over where
            # block cannot run) — so "block up to the envelope" IS the
            # winner-picking rule, per measurement (VERDICT r3 #8)
            if nnz < 16384:
                backend = "plain"
            elif n_sub_total <= 6144 and not shard_nnz:
                backend = "block"
            elif seg_ok:
                backend = "seg"
            else:
                backend = (
                    "full"
                    if suggest_slice_capacity(sim) <= slice_capacity
                    else "sliced"
                )
        if backend == "seg" and not seg_ok:
            raise ValueError(
                f"seg backend ineligible (n_frags={sim.n_frags}, "
                f"rows_sorted={rows_sorted}, shard_nnz={shard_nnz}, "
                f"sort_free={seg_sort_free}): the legacy sorted shard "
                f"variant needs (n_frags+{SEG_ID_SLACK})^2 < 2^31 for "
                f"int32 pair codes, and the fast layouts need the "
                f"canonical COO row-sorted; use 'full'/'sliced', unset "
                f"INSTAGRAAL_TPU_SEG_SORTED, or scaffold at a coarser "
                f"pyramid level"
            )
        self.seg_cap2 = None
        self.seg_updcaps = None
        self.seg_rowcaps = None
        if backend == "seg":
            # two-tier rescore capacity: the per-candidate 24-way
            # rescore costs ~1.3 us per capacity unit per step
            # (gather-issue bound, measured on the dev TPU at yeast
            # L2), so tier 1 is sized for the COMMON pair and tier 2
            # (the data-driven worst-pair bound) runs as a rare
            # lax.cond branch; anything beyond tier 2 takes the exact
            # full-matrix pass. An explicit slice_capacity int
            # overrides tier 1.
            # capacities bound PER-SHARD counts: with the pixels
            # sharded, every window/compaction is local, so caps size
            # on the local slice (a global-nnz cap would do ~n_shards
            # of wasted window work per shard)
            nnz_cap = nnz
            if shard_nnz:
                nnz_cap = -(-nnz // mesh.shape["shards"])
            if isinstance(slice_capacity_req, int):
                tier1 = int(min(nnz_cap, slice_capacity_req))
            else:
                # auto tier 1 = nnz/1024, clamped to [512, 2048]. The
                # nnz/1024 term matched the measured best at yeast-L2
                # (954 at 1M nnz, docs/seg_cap_probe.json); the upper
                # clamp was 8192 until the 7.1M-nnz config-#5 run
                # measured the formula's 6.9k cap at 55.4 ms/step vs
                # 33.4 with 2048 (bombed-start windows are ~3k pixels;
                # oversized caps cost pure window traffic). Tier-2 +
                # exact-overflow fallbacks keep any cap exact; probe
                # with scripts/seg_cap_probe.py / --slice-cap to tune.
                tier1 = int(
                    min(nnz_cap, max(512, min(nnz_cap // 1024, 2048)))
                )
            tier2 = int(
                min(
                    nnz_cap,
                    max(4 * tier1, suggest_slice_capacity(sim)),
                )
            )
            slice_capacity = tier1
            self.seg_cap2 = tier2
            # row-in window capacities (tier1, tier2): the two-stage
            # compaction first composes the pair's member CSR runs
            # (ALL pixels whose row endpoint is a member — ~1/cis-frac
            # larger than both-in) into a window, then compacts the
            # col-in pixels from it with a cheap window-sized nonzero
            self.seg_rowcaps = (
                int(min(nnz_cap, max(4096, 4 * tier1))),
                int(min(nnz_cap, 4 * max(4 * tier1, tier2))),
            )
            # post-accept geometry updates run over the row-in window
            self.seg_updcaps = self.seg_rowcaps
            # member-sub capacity (cheap: only O(mcap) index math
            # scales with it — size it so two chromosome-scale
            # contigs fit)
            self.seg_mcap = int(
                min(n_sub_total + 1, max(256, n_sub_total // 4))
            )
            # --- local candidate generation (seg_fast only) ----------
            # Mutations only touch the pair's member fragments, so the
            # 24 candidate states are generated in a COMPACT mini-state
            # of the members (locally renumbered; the ops run
            # unchanged) and projected only over the members' sub-frag
            # runs — per-step generation cost O(member window), not
            # O(n_frags) (the O(n) 5x24 materialization measured
            # ~146 ms of the 177 ms step at 200k frags,
            # docs/large_scale_probe.json). Two member-capacity tiers
            # mirror the scoring tiers; past tier 2 the exact
            # full-state fallback regenerates per candidate.
            fos = np.asarray(sim.sub_index.frag_of_sub)
            so = np.searchsorted(
                fos, np.arange(sim.n_frags + 1)
            ).astype(np.int32)
            # pad so the member fill id n_frags reads a zero-length run
            self.seg_suboff = jnp.asarray(np.concatenate([so, so[-1:]]))
            f2 = int(min(sim.n_frags + 1, max(128, sim.n_frags // 4)))
            m2 = self.seg_mcap
            if _seg_local_caps is not None:
                f1, m1 = (int(v) for v in _seg_local_caps)
                f1 = min(f1, f2)
                m1 = min(m1, m2)
            else:
                f1 = int(min(f2, max(64, sim.n_frags // 64)))
                m1 = int(min(m2, max(192, n_sub_total // 64)))
            self.seg_fcaps = (f1, f2)
            self.seg_mcaps = (m1, m2)
            pad0 = lambda a: jnp.concatenate(  # noqa: E731
                [a, jnp.zeros(1, dtype=a.dtype)]
            )
            self._seg_sub_ext = (
                pad0(sim.sub_index.j_of_sub),
                pad0(sim.sub_index.w_dist),
                pad0(sim.sub_index.c_dist),
            )
            env_local = _os.environ.get("INSTAGRAAL_TPU_SEG_LOCAL", "")
            if env_local in ("0", "1"):
                seg_local = env_local == "1"
            if seg_local == "auto":
                seg_local = sim.n_frags >= SEG_LOCAL_MIN_FRAGS
            self.seg_local = bool(seg_local)
        else:
            self.seg_local = False
        self._spc_mode = "fixed"
        self._spc_model = None
        if steps_per_call in ("auto", "model"):
            # bound a device call to ~20-30 s under the ~60 s transport
            # execution watchdog. The cost model below provides the
            # provisional value (its constants were measured on one
            # v5e chip generation — ~18 ns/pixel/candidate for the
            # delta backends at yeast L2, O((n_sub+1)^2) dense-grid
            # cells for block); "auto" then *calibrates* it against a
            # timed probe chunk on the first chunked run_cycle, so
            # other hardware gets a measured size rather than a stale
            # constant (calibrate_steps_per_call). "model" keeps the
            # constants-only behaviour. Under shard_nnz the per-call
            # pixel work is divided across the mesh, so the budget
            # scales up with it.
            if backend == "block":
                auto = int(2e10 / max((n_sub_total + 1) ** 2, 1))
            else:
                per_dev_nnz = nnz
                if shard_nnz:
                    per_dev_nnz = -(-nnz // mesh.shape["shards"])
                if backend == "seg":
                    # O(nnz) once per step (sort + masked sums), not
                    # per candidate: ~5x the delta backends' budget
                    auto = int(1.25e9 / max(per_dev_nnz, 1))
                else:
                    auto = int(2.5e8 / max(per_dev_nnz, 1))
            auto = max(64, min(1024, auto))
            if steps_per_call == "auto":
                self._spc_mode = "auto"
                self._spc_model = auto
            steps_per_call = auto if sim.n_frags > auto else None
        self.steps_per_call = steps_per_call
        if block_capacity == "auto":
            # dense rescore cost grows as block_capacity^2 while the
            # overflow fallback (one dense full pass) is cheap, so size
            # for the common case: ~30% of the sub-fragments covers a
            # worst-case contig pair on yeast-like assemblies (measured
            # max 237/1233 members over a full scaffold run); rare
            # larger pairs just take the exact fallback branch.
            block_capacity = int(
                min(
                    -(-(n_sub_total + 1) // 128) * 128,
                    max(128, -(-int(0.3 * (n_sub_total + 1)) // 128) * 128),
                    640,
                )
            )
        self.block_capacity = int(block_capacity)
        self.block_tri = bool(block_tri)
        n_dev = mesh.shape["shards"] if mesh is not None else 1
        if neighbour_k is None:
            # adaptive table width: wide enough that 95% of fragments
            # keep their FULL contact support (the reference samples an
            # exact categorical over every partner,
            # cuda_lib_gl_single.py:3053 — a fixed top-32 clips
            # repeat-rich / coarse-level fragments). Cap at 256 so the
            # per-step Gumbel top-k stays trivial.
            csr = sim.level.sparse_mat_csr
            sym = (csr + csr.T).tocsr()
            partners = np.diff(sym.indptr)
            neighbour_k = int(
                min(
                    max(sim.n_frags - 1, 1),
                    max(32, int(np.percentile(partners, 95))),
                    256,
                )
            )
        if mesh is not None and not shard_nnz:
            # candidate sharding wants the candidate count to fill the
            # device grid; nnz sharding keeps the user's neighbour count
            n_neighbours = max(n_neighbours, n_dev)
            n_neighbours = -(-n_neighbours // n_dev) * n_dev
            neighbour_k = max(neighbour_k, n_neighbours)
        self.neighbour_k = int(neighbour_k)
        self.n_neighbours = n_neighbours
        self.backend = backend
        self.sample_param = sample_param
        self.n_frags = sim.n_frags
        self.slice_capacity = slice_capacity
        if backend == "seg":
            self.update_capacity = int(self.seg_updcaps[1])
        else:
            self.update_capacity = int(min(nnz, 2 * slice_capacity))
        self.exact_overflow = exact_overflow
        self.wide_rows = wide_rows
        self.table = NeighbourTable.build(
            sim.level.sparse_mat_csr, sim.n_frags, k=neighbour_k
        )

        idx = sim.sub_index
        rows, cols = sim.coo_rows, sim.coo_cols
        data = sim.coo_data
        # (count, poisson_norm(count)) rows: one 8-byte gather fetches
        # both the observation and its precomputed normalization
        data_norm = jnp.stack(
            [data, jnp.asarray(poisson_norm(np.asarray(data)))], axis=1
        )
        dn_dense = None
        if backend == "block":
            # dense (count, poisson_norm) matrix with one zero pad
            # row/col at index n_sub: block gathers land padded member
            # slots there and the data==0 mask silences them
            dnd = np.zeros(
                (n_sub_total + 1, n_sub_total + 1, 2), np.float32
            )
            r_np = np.asarray(rows)
            c_np = np.asarray(cols)
            d_np = np.asarray(data, dtype=np.float32)
            codes = r_np.astype(np.int64) * (n_sub_total + 1) + c_np
            if np.unique(codes).size != codes.size:
                raise ValueError(
                    "COO pixel list has duplicate (row, col) entries; "
                    "the dense block backend requires canonical pixels"
                )
            dnd[r_np, c_np, 0] = d_np
            dnd[r_np, c_np, 1] = poisson_norm(d_np)
            dn_dense = jnp.asarray(dnd)
        msf = np.float32(sim.mean_size_frag_kb)
        n_pix = np.float32(sim.n_pix_total)
        n_cand = n_neighbours
        cap = self.slice_capacity
        cap_upd = self.update_capacity
        # max_bounds_insert window half-width for same-contig slices
        # (reference cuda_lib_gl_single.py:417-421)
        mean_sub_len = float(np.mean(np.asarray(sim.state.sub_len)))
        n_bounds = int(50 * round(mean_sub_len + 1))
        dist_fn = make_dist_fn(
            sim.state, np.asarray(sim.state.sub_len) > 1
        )

        # assemble the jitted cycle: either with the full pixel arrays
        # on every device (replicated — the single-chip / candidate-
        # sharded layout), or with the COO nnz axis sharded across the
        # mesh's "shards" axis (shard_nnz) so HBM per chip scales as
        # nnz / n_shards. Cross-pixel reductions go through psum/pmax
        # (identity functions when replicated).
        def _ident(x):
            return x

        if not shard_nnz:
            cycle_fn, initial_fn, chunk_fn, init_cache = self._make_cycle(
                idx, rows, cols, data_norm, dn_dense, msf, n_pix,
                n_cand, cap, cap_upd, n_bounds, dist_fn, backend,
                wide_rows, exact_overflow, mesh, None, _ident, _ident,
            )
            self._run_chunk = jax.jit(chunk_fn)
            self._init_cache = jax.jit(init_cache)

            def _batched_fns(n_chains):
                # chains as a plain vmap axis: every chain's pixel
                # arrays are the same replicated constants, so the
                # chain batch composes directly with the cycle/chunk
                # closures (the candidate shard_map does not — guarded
                # in make_chain_batched)
                return ChainBatchedFns(
                    cycle=jax.jit(
                        jax.vmap(cycle_fn, in_axes=(0, 0, 0, 0, None))
                    ),
                    chunk=jax.jit(
                        jax.vmap(
                            chunk_fn,
                            in_axes=(0, 0, 0, 0, 0, 0, 0, None),
                        )
                    ),
                    init_cache=jax.jit(jax.vmap(init_cache)),
                )

            self._make_batched_fns = _batched_fns
            # raw closures for mesh-placed chain batching
            # (MultiChainSweep wraps them in an explicit shard_map —
            # leaving the chain axis to GSPMD auto-partitioning was
            # measured 100x slower than single-chain on a CPU mesh)
            self._fns_unjit = (cycle_fn, chunk_fn, init_cache)
        else:
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            n_sh = mesh.shape["shards"]
            pad = (-nnz) % n_sh
            # physically place each device's pixel slice in its own
            # HBM: per-chip COO memory is nnz/n_shards from here on.
            # (Dev-tunnel caveat: the FIRST NamedSharding device_put
            # of a process measured ~6 min one-time on the tunneled
            # v5e — transfer-path warmup, not per-array cost; all
            # subsequent sharded puts are <1 s.)
            pix_sharding = jax.sharding.NamedSharding(mesh, P("shards"))
            rows_s = jax.device_put(jnp.pad(rows, (0, pad)), pix_sharding)
            cols_s = jax.device_put(jnp.pad(cols, (0, pad)), pix_sharding)
            dn_s = jax.device_put(
                jnp.pad(data_norm, ((0, pad), (0, 0))),
                jax.sharding.NamedSharding(mesh, P("shards", None)),
            )
            wm_s = jax.device_put(
                jnp.pad(jnp.ones(nnz, jnp.float32), (0, pad)),
                pix_sharding,
            )

            def _psum(x):
                return jax.lax.psum(x, "shards")

            def _pmax(x):
                return jax.lax.pmax(x, "shards")

            seg_ops = ()
            if backend == "seg" and seg_sort_free:
                # per-shard STATIC CSR/CSC run indexes (VERDICT r3
                # #4): each shard's slice of the row-sorted canonical
                # COO is itself row-sorted, so its run index is one
                # host-side searchsorted/lexsort at engine build —
                # the sharded seg step then never sorts on device.
                # Padding pixels get virtual sub id n_sub+1, a run no
                # member window ever composes (_seg_members fills
                # with n_sub, whose run is empty).
                n_sub1 = n_sub_total + 1
                r_pad = np.pad(
                    np.asarray(rows), (0, pad), constant_values=n_sub1
                ).astype(np.int64)
                c_pad = np.pad(
                    np.asarray(cols), (0, pad), constant_values=n_sub1
                ).astype(np.int64)
                L = (nnz + pad) // n_sh
                grid = np.arange(n_sub_total + 2)
                rps, cscs, cps = [], [], []
                for d in range(n_sh):
                    r_l = r_pad[d * L : (d + 1) * L]
                    c_l = c_pad[d * L : (d + 1) * L]
                    rps.append(
                        np.searchsorted(r_l, grid).astype(np.int32)
                    )
                    order = np.lexsort((r_l, c_l))
                    cscs.append(order.astype(np.int32))
                    cps.append(
                        np.searchsorted(c_l[order], grid).astype(
                            np.int32
                        )
                    )
                row_sharding = jax.sharding.NamedSharding(
                    mesh, P("shards", None)
                )
                seg_ops = (
                    jax.device_put(
                        jnp.asarray(np.stack(rps)), row_sharding
                    ),
                    jax.device_put(
                        jnp.asarray(np.stack(cscs)), row_sharding
                    ),
                    jax.device_put(
                        jnp.asarray(np.stack(cps)), row_sharding
                    ),
                )

            def _kern(r, c, dn, wm, *seg_o):
                # mesh=None inside: candidate scoring stays local, the
                # pixel axis is what's distributed here
                seg_static = (
                    tuple(o[0] for o in seg_o) if seg_o else None
                )
                return self._make_cycle(
                    idx, r, c, dn, dn_dense, msf, n_pix, n_cand,
                    cap, cap_upd, n_bounds, dist_fn, backend,
                    wide_rows, exact_overflow, None, wm, _psum, _pmax,
                    seg_static=seg_static,
                )

            pspec = (P("shards"),) * (4 + len(seg_ops))
            # per-pixel cache spec: sharded like the pixels, except the
            # cacheless plain backend's [1] dummy (replicated)
            pp_spec = P() if backend == "plain" else P("shards")

            pix_ops = (rows_s, cols_s, dn_s, wm_s) + seg_ops

            # The pixel arrays are passed as RUNTIME ARGUMENTS (*pix),
            # never captured as jit closure constants: a closed-over
            # jax.Array is serialized into the HLO as a literal, and
            # at config-#5 scale (7.1M nnz = hundreds of MB of COO +
            # run indexes) that blew the remote-compile transport's
            # request-size cap (HTTP 413) before XLA ever saw the
            # program. As arguments they are device-resident buffers
            # the executable merely binds.
            def chunk_sharded(state, params, ll_t, pp, nz, order, keys,
                              flags, *pix):
                def inner(state, params, ll_t, pp, nz, order, keys,
                          flags, *pix):
                    return _kern(*pix)[2](
                        state, params, ll_t, pp, nz, order, keys, flags
                    )

                return shard_map(
                    inner,
                    mesh=mesh,
                    in_specs=(
                        P(), P(), P(), pp_spec, P(), P(), P(), P()
                    ) + pspec,
                    out_specs=(P(), P(), P(), pp_spec, P(), P()),
                    check_vma=False,
                )(state, params, ll_t, pp, nz, order, keys, flags,
                  *pix)

            def init_cache_sharded(state, params, *pix):
                def inner(state, params, *pix):
                    return _kern(*pix)[3](state, params)

                return shard_map(
                    inner,
                    mesh=mesh,
                    in_specs=(P(), P()) + pspec,
                    out_specs=(pp_spec, P()),
                    check_vma=False,
                )(state, params, *pix)

            self._run_chunk = jax.jit(chunk_sharded)
            self._init_cache = jax.jit(init_cache_sharded)

            def cycle_fn(state, params, ll_t, key, flags, *pix):
                def inner(state, params, ll_t, key, flags, *pix):
                    return _kern(*pix)[0](
                        state, params, ll_t, key, flags
                    )

                return shard_map(
                    inner,
                    mesh=mesh,
                    in_specs=(P(), P(), P(), P(), P()) + pspec,
                    out_specs=P(),
                    check_vma=False,
                )(state, params, ll_t, key, flags, *pix)

            def initial_fn(state, params, *pix):
                def inner(state, params, *pix):
                    return _kern(*pix)[1](state, params)

                return shard_map(
                    inner,
                    mesh=mesh,
                    in_specs=(P(), P()) + pspec,
                    out_specs=P(),
                    check_vma=False,
                )(state, params, *pix)

            # handles for tests to verify real per-device pixel shards
            self._pix_sharded = (rows_s, cols_s, dn_s, wm_s)
            self._seg_static_ops = seg_ops or None
            self._pix_spec = pspec[0]
            self._pix_args = pix_ops

            def _batched_fns(n_chains):
                # chains x pixel shards on one 2-D mesh: chain-batched
                # state rides the "chains" axis, each chain's pixel
                # reduction stays sharded along "shards" (psum inside
                # the local-chain batch names only "shards", so the
                # two axes compose). Every device holds
                # n_chains/|chains| chain states and 1/|shards| of
                # the COO.
                pp_b = (
                    P("chains") if backend in ("plain", "block")
                    else P("chains", "shards")
                )
                return _chain_batched_shard_map(
                    mesh, n_chains, _kern, pix_ops, pspec, pp_b,
                )

            self._make_batched_fns = _batched_fns

        self._cycle_fn = cycle_fn
        self._run_cycle = jax.jit(cycle_fn)
        self._initial_ll = jax.jit(initial_fn)

        if mesh is not None:
            # Pin the carried operands (state/params/ll) to the mesh
            # BEFORE the first call. Without this the first call sees
            # host arrays (aval sharding {}) while every later call
            # sees the previous call's mesh-committed outputs (aval
            # {Auto: mesh}): a different tracing-cache key, so the
            # SECOND call silently retraced and recompiled the whole
            # cycle — ~80-450 s at yeast-L2, the entire round-4
            # "sharded seg is 17-27x slower" regression
            # (docs/seg_shard_probe.json: per-chunk times were
            # [313.7, 8.85, 8.78] ms/step; probes that averaged chunks
            # reported the poisoned mean). device_put is a no-op for
            # arrays already in the target sharding, so steady-state
            # calls pay nothing.
            _rep_sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            )

            def _place_carry(tree):
                return jax.tree.map(
                    lambda x: jax.device_put(x, _rep_sh), tree
                )

            self._place_carry = _place_carry
            _chunk_jit = self._run_chunk
            _init_jit = self._init_cache
            _cycle_jit = self._run_cycle
            _ill_jit = self._initial_ll
            # shard_nnz engines append the sharded pixel buffers as
            # runtime args (see chunk_sharded: closure constants blow
            # the remote-compile request cap at config-#5 nnz)
            _extra = getattr(self, "_pix_args", ())

            def _chunk_placed(state, params, ll_t, pp, nz, order, keys,
                              flags):
                state, params, ll_t = _place_carry(
                    (state, params, ll_t)
                )
                return _chunk_jit(
                    state, params, ll_t, pp, nz, order, keys, flags,
                    *_extra,
                )

            def _init_placed(state, params):
                state, params = _place_carry((state, params))
                return _init_jit(state, params, *_extra)

            def _cycle_placed(state, params, ll_t, key, flags):
                state, params, ll_t = _place_carry(
                    (state, params, ll_t)
                )
                return _cycle_jit(
                    state, params, ll_t, key, flags, *_extra
                )

            def _ill_placed(state, params):
                state, params = _place_carry((state, params))
                return _ill_jit(state, params, *_extra)

            self._run_chunk = _chunk_placed
            self._init_cache = _init_placed
            self._run_cycle = _cycle_placed
            self._initial_ll = _ill_placed
            # raw jits, exposed so tests can assert the one-compile
            # invariant (_cache_size() == 1 after repeated calls)
            self._jits = {
                "chunk": _chunk_jit,
                "init_cache": _init_jit,
                "cycle": _cycle_jit,
                "initial_ll": _ill_jit,
            }
        else:
            self._place_carry = lambda tree: tree
            self._jits = {
                "chunk": self._run_chunk,
                "init_cache": self._init_cache,
                "cycle": self._run_cycle,
                "initial_ll": self._initial_ll,
            }

    def _make_cycle(
        self, idx, rows, cols, data_norm, dn_dense, msf, n_pix, n_cand,
        cap, cap_upd, n_bounds, dist_fn, backend, wide_rows,
        exact_overflow, mesh, wmask, psum, pmax, seg_static=None,
    ):
        """Build (cycle_fn, initial_ll_fn) over the given pixel arrays.

        rows/cols/data_norm are either the full COO arrays (replicated
        layout) or one device's shard (inside the shard_nnz shard_map).
        wmask: None, or a per-pixel f32 validity mask (0 on the padding
        that makes nnz divisible by the shard count). psum/pmax merge
        pixel reductions across shards (identity when replicated).
        mesh here is the CANDIDATE-sharding mesh (None under nnz
        sharding). Every cross-shard value used as a branch predicate
        (slice overflow, update-set overflow) goes through pmax first,
        so all devices take the same lax.cond branch and collectives
        inside the branches cannot deadlock.

        seg_static: this shard's STATIC (rowptr, csc_pix, colptr) run
        index over its local pixel slice (seg + shard_nnz; VERDICT r3
        #4). Each shard's slice of the canonical COO is row-sorted, so
        its CSR/CSC run index is computed once at engine build on the
        host — the sharded seg step then composes member windows from
        static runs exactly like the replicated seg_fast variant, and
        the per-step O(nnz log nnz) lax.sort_key_val (XProf: 54% of
        the step) is gone. Padding pixels are parked under virtual
        sub id n_sub+1 in the index, so no window ever reads them.
        """
        n_sub_total = int(np.asarray(idx.frag_of_sub).shape[0])

        def _pp_all(packed, params):
            ra = packed[rows]
            ca = packed[cols]
            pp = pp_rows_fast(ra, ca, data_norm, params, msf)
            return pp if wmask is None else pp * wmask

        # --- dense-grid scoring (block backend) ----------------------
        # At block scale the whole [S, S] per-pixel score matrix is
        # cheaper to evaluate densely (regular VPU broadcast over the
        # padded sub-fragment axis, observed-count mask silencing empty
        # pixels) than to gather/scatter the sparse pixel list:
        # profiled on yeast L4, dense eval runs ~25x faster per pixel
        # than an XLA scatter-add update of the same pixels.
        def pp_dense_all(pcur_pad, params):
            """[S, S] score matrix of one genome; 0 at empty pixels."""
            val = pp_rows_fast(
                pcur_pad[:, None, :], pcur_pad[None, :, :],
                dn_dense, params, msf,
            )
            return jnp.where(dn_dense[..., 0] > 0, val, 0.0)

        def g_dense_all(params):
            """[S, S] flat-trans score matrix (see delta_candidate)."""
            v = jnp.asarray(params.v_inter)
            d0 = dn_dense[..., 0]
            g = (
                d0 * jnp.log10(jnp.maximum(v, 1e-38))
                - v
                - dn_dense[..., 1]
                + v * LOG10_E
            )
            return jnp.where(d0 > 0, g, 0.0)

        def _nz24_dense(p24pad, params):
            """Total nz log-likelihood of 24 genomes, dense grid."""

            def one(pk):
                val = pp_rows_fast(
                    pk[:, None, :], pk[None, :, :], dn_dense, params, msf
                )
                return jnp.sum(jnp.where(dn_dense[..., 0] > 0, val, 0.0))

            return jax.vmap(one)(p24pad)

        def _nz24_all(packed24, params):
            """Total nz log-likelihood for each of 24 mutated genomes."""
            if wide_rows:
                wide = jnp.swapaxes(packed24, 0, 1)  # [n_sub, 24, PACK]
                pp = pp_rows_fast(
                    wide[rows], wide[cols], data_norm[:, None, :],
                    params, msf,
                )  # [nnz, 24]
                return jnp.sum(pp, axis=0)
            return psum(
                jax.vmap(lambda pk: jnp.sum(_pp_all(pk, params)))(
                    packed24
                )
            )

        # --- candidate scoring: cis/trans-split delta -----------------
        # Every mutation of the pair (fA, fB) only rebuilds contigs out
        # of the fragments of contig(fA) ∪ contig(fB) (ops.py assigns
        # ids from {cA, cB, max_id+1, ...}, never an untouched contig's
        # id). Hence a pixel with exactly ONE endpoint in those contigs
        # is trans both before and after every mutation, and its score
        # term depends only on the observed count (the trans expectation
        # is the flat v_inter — rippe.py): no positional gathers needed.
        # Only pixels with BOTH endpoints in cA ∪ cB can change cis
        # status or genomic distance, and only they are compacted and
        # gathered per mutation. Measured on yeast L4: both-endpoint
        # sets are 1.5k-24k pixels where the old touch slices were
        # 35k-118k — the expensive 24-way gathers shrink ~5x.
        #
        # score(m) = ll_nz_cur - sum(pp_cur * touch)          # remove
        #          + sum(g_trans * (touch - both))            # single-in
        #          + sum_m pp(gathered both-in pixels)        # re-score
        #          + zeros(m)
        # with g_trans[i] = data_i*log10(v_inter) - v_inter - norm_i +
        # v_inter*log10(e), precomputed once per step.
        windowed = backend == "sliced"
        plain = backend == "plain"
        block = backend == "block"
        seg = backend == "seg"
        bcap = self.block_capacity
        block_tri = self.block_tri
        if block and block_tri:
            # static strict-upper-triangle cell indices of the
            # [bcap, bcap] member grid (see __init__ docstring)
            _ti, _tj = np.triu_indices(bcap, k=1)
            tri_i = jnp.asarray(_ti.astype(np.int32))
            tri_j = jnp.asarray(_tj.astype(np.int32))
            tri_flat = jnp.asarray(
                (_ti.astype(np.int64) * bcap + _tj).astype(np.int32)
            )
        ncp = self.n_frags + 1  # renumbered contig ids are < n_frags
        if seg:
            # sorted contig-pair index (see module docstring): pixels
            # keyed by the ORDERED code row_contig*ncp_seg + col_contig
            # (ordered, so the row side can come from the static-CSR
            # cumsum expansion below with no canonicalization gather);
            # ncp_seg leaves headroom for ids growing between the
            # periodic label compactions; the sentinel parks
            # shard-padding pixels past every reachable code
            ncp_seg = self.n_frags + SEG_ID_SLACK
            nnz_local = int(rows.shape[0])
            # the sorted-code variant is unreachable past the int32
            # code bound (eligibility enforces it); don't overflow the
            # eager sentinel there
            seg_sentinel = (
                np.int32(ncp_seg * ncp_seg - 1)
                if ncp_seg * ncp_seg <= np.iinfo(np.int32).max
                else None
            )
            # Static row-segment index: the canonical COO is sorted by
            # row, so per-pixel ROW contig labels never need a gather —
            # scatter each row's label *delta* at its static segment
            # start and cumsum (int32, exact). Measured on the dev TPU
            # at ~1M nnz: 0.05 ms vs 3.2 ms for the equivalent gather
            # (gathers are ~3-6 ns/row issue-bound; cumsum/sort/masked
            # sums stream at HBM rate). Only the COL side pays one
            # 1-lane gather per step.
            row_expand_ok = False
            if wmask is None:  # replicated: rows is a concrete array
                r_host = np.asarray(rows)
                row_expand_ok = bool(np.all(np.diff(r_host) >= 0))
            elif seg_static is not None:
                # sharded: this shard's static run index was built on
                # the host at engine setup (each shard's canonical COO
                # slice is row-sorted) — same seg_fast machinery, with
                # psum/pmax closing the cross-shard sums/predicates
                row_expand_ok = True
            # seg_fast: the steady-state no-O(nnz)-work layout —
            # replicated pixels + row-sorted canonical COO. It carries
            # ONE per-pixel cache: the scoring GEOMETRY (s, s_tot, s_z,
            # s_tot_z, with s=0 encoding trans so the flat v_inter
            # falls out of the curve's own s>0 gate), updated
            # incrementally after accepted moves. Everything a
            # candidate needs comes from bounded WINDOWS composed out
            # of static CSR/CSC runs of the pair's member subs (all
            # marginal sums + the both-in compaction), so per-step
            # costs are O(window), not O(nnz) — the only O(nnz) op
            # left is the nuisance MH's elementwise re-score, which is
            # gather-free thanks to the geometry cache and evaluates
            # the d_max / v_inter gates lazily under whatever params
            # the eval uses. The shard_nnz layout keeps the sorted
            # contig-pair-code variant (per-shard arrays).
            seg_fast = row_expand_ok
            if seg_fast and seg_static is not None:
                seg_rowptr, seg_csc_pix, seg_colptr = seg_static
            elif seg_fast:
                # static CSR run index: pixels with row sub s are the
                # contiguous id range [rowptr[s], rowptr[s+1]) of the
                # canonical order, so "all pixels whose ROW endpoint is
                # in the pair's member subs" is a union of STATIC runs
                # — no sorted index, hence no per-step O(nnz log nnz)
                # sort (XProf measured the sort at 54% of the step).
                # Padded so ids==n_sub (member fill) reads a 0-run.
                rowptr_np = np.searchsorted(
                    r_host, np.arange(n_sub_total + 1)
                ).astype(np.int32)
                seg_rowptr = jnp.asarray(
                    np.concatenate([rowptr_np, rowptr_np[-1:]])
                )
                # static CSC view: pixels grouped by col sub-fragment
                # (ids into the canonical order via csc_pix), for the
                # col-side windows
                c_host = np.asarray(cols)
                csc_order = np.lexsort((r_host, c_host))
                seg_csc_pix = jnp.asarray(csc_order.astype(np.int32))
                colptr_np = np.searchsorted(
                    c_host[csc_order], np.arange(n_sub_total + 1)
                ).astype(np.int32)
                # pad so ids==n_sub (the member fill value) reads a
                # zero-length run
                seg_colptr = jnp.asarray(
                    np.concatenate([colptr_np, colptr_np[-1:]])
                )
            mcap_seg = self.seg_mcap
            # local candidate generation: only meaningful on the
            # static-run fast layout (the member windows ARE the
            # mutation's support); the per-step-sorted legacy variant
            # keeps full-state generation
            seg_local_on = seg_fast and self.seg_local
            if seg_local_on:
                suboff = self.seg_suboff
                j_ext, w_ext, c_ext = self._seg_sub_ext
                fcap1, fcap2 = self.seg_fcaps
                mcap1, mcap2 = self.seg_mcaps
                nfr = self.n_frags
            seg_cap2 = self.seg_cap2
            upd1 = self.seg_updcaps[0]
            rcap1, rcap2 = (
                self.seg_rowcaps
                if self.seg_rowcaps is not None
                else (0, 0)
            )
            seg_full_sentinel = (
                np.int32(seg_cap2 + 1) if seg_cap2 else np.int32(0)
            )

        def _seg_members(sub_ci, a_i, b_i):
            """Member sub-fragments of contigs {a_i, b_i}: sorted ids
            (fill n_sub => zero-length runs) + exact count."""
            mem = (sub_ci == a_i) | (sub_ci == b_i)
            (ids,) = jnp.nonzero(
                mem, size=mcap_seg, fill_value=n_sub_total
            )
            return ids, jnp.sum(mem)

        def _seg_window(ptr, ids, capacity):
            """Compose the members' static runs of `ptr` into one
            O(capacity) position list (positions index the order `ptr`
            describes: canonical ids for rowptr, CSC positions for
            colptr). Returns (positions, valid f32 weights, count)."""
            lo = ptr[ids]
            lens = ptr[ids + 1] - lo
            offs = jnp.cumsum(lens)
            n_tot = offs[-1]
            j = jnp.arange(capacity)
            # run-of-position via scatter + cummax instead of a
            # vmapped searchsorted: the binary-search while loop
            # measured 2.1 ms/step at [5, 4096] on v5e where the
            # scatter/cummax form is 0.5 ms — runs mark their start
            # position (empty runs collapse onto the next start;
            # max keeps the later id) and a cummax paints run ids
            # across the window
            marks = jnp.zeros(capacity, jnp.int32).at[offs - lens].max(
                jnp.arange(ids.shape[0], dtype=jnp.int32), mode="drop"
            )
            run = jax.lax.cummax(marks)
            prev = offs[run] - lens[run]
            pos = jnp.clip(lo[run] + (j - prev), 0, nnz_local - 1)
            w = (j < n_tot).astype(jnp.float32)
            return pos, w, n_tot

        def _seg_rowin(ids, capacity):
            """All pixels whose ROW endpoint is a member sub (the run
            positions ARE canonical pixel ids)."""
            return _seg_window(seg_rowptr, ids, capacity)

        def _seg_colin(ids, capacity):
            """All pixels whose COL endpoint is a member sub: CSC runs
            mapped back to canonical pixel ids."""
            pos, w, n_tot = _seg_window(seg_colptr, ids, capacity)
            return seg_csc_pix[pos], w, n_tot

        def _g_of(dn, params):
            """Flat trans score term, data-only (see delta_candidate)."""
            v = jnp.asarray(params.v_inter)
            return (
                dn[..., 0] * jnp.log10(jnp.maximum(v, 1e-38))
                - v
                - dn[..., 1]
                + v * LOG10_E
            )

        def _seg_bounds(seg_idx, a_i, b_i):
            """Locate the four ordered contig-pair code segments (a,a)
            (a,b) (b,a) (b,b) of the per-step sorted index: O(log nnz)
            searchsorted. Returns (starts [4], lengths [4], total)."""
            sorted_codes, _ = seg_idx
            qaa = a_i * ncp_seg + a_i
            qab = a_i * ncp_seg + b_i
            qba = b_i * ncp_seg + a_i
            qbb = b_i * ncp_seg + b_i
            bounds = jnp.searchsorted(
                sorted_codes,
                jnp.stack(
                    [qaa, qaa + 1, qab, qab + 1, qba, qba + 1,
                     qbb, qbb + 1]
                ),
            )
            same = a_i == b_i  # all four segments collapse onto (a,a)
            l0 = bounds[1] - bounds[0]
            l1 = jnp.where(same, 0, bounds[3] - bounds[2])
            l2 = jnp.where(same, 0, bounds[5] - bounds[4])
            l3 = jnp.where(same, 0, bounds[7] - bounds[6])
            starts = jnp.stack(
                [bounds[0], bounds[2], bounds[4], bounds[6]]
            )
            lens = jnp.stack([l0, l1, l2, l3])
            return starts, lens, l0 + l1 + l2 + l3

        def _seg_take(seg_idx, starts, lens, n_sel, capacity):
            """Concatenate the located segments into one O(capacity)
            pixel-id gather. Returns (pixel ids, valid-weight f32)."""
            _, perm = seg_idx
            j = jnp.arange(capacity)
            c0 = lens[0]
            c1 = c0 + lens[1]
            c2 = c1 + lens[2]
            pos = jnp.where(
                j < c0,
                starts[0] + j,
                jnp.where(
                    j < c1,
                    starts[1] + (j - c0),
                    jnp.where(
                        j < c2,
                        starts[2] + (j - c1),
                        starts[3] + (j - c2),
                    ),
                ),
            )
            pos = jnp.clip(pos, 0, nnz_local - 1)
            w = (j < n_sel).astype(jnp.float32)
            return perm[pos], w

        def _seg_segments(seg_idx, a_i, b_i, capacity):
            """Pixel ids with both endpoints in contigs {a_i, b_i}."""
            starts, lens, n_sel = _seg_bounds(seg_idx, a_i, b_i)
            b_idx, w = _seg_take(seg_idx, starts, lens, n_sel, capacity)
            return b_idx, w, n_sel

        def gen_candidate(ctx, pair):
            """The 24 mutated states + packed projections for one pair."""
            (state, row_c, col_c, row_p, col_p, g_trans, pp_cur,
             ll_nz_cur, id_fA, max_id, params) = ctx
            id_fB, is_first = pair
            stacked, valid = all_candidate_states(
                state, id_fA, id_fB, max_id, flip_eject=is_first
            )
            packed24 = jax.vmap(
                lambda s: project_packed(s, idx)
            )(stacked)
            return stacked, packed24, valid

        def delta_candidate(ctx, id_fB, packed24):
            """cis/trans-split delta nz scores for one candidate pair."""
            (state, row_c, col_c, row_p, col_p, g_trans, pp_cur,
             ll_nz_cur, id_fA, max_id, params) = ctx
            cA = state.id_c[id_fA].astype(jnp.float32)
            cB = state.id_c[id_fB].astype(jnp.float32)
            row_in = (row_c == cA) | (row_c == cB)
            col_in = (col_c == cA) | (col_c == cB)
            touch = row_in | col_in
            if windowed:
                # same-contig windowing (reference slice_sp_mat :536-585)
                same = cA == cB
                pa = state.sub_pos[id_fA].astype(jnp.float32)
                la = state.sub_len[id_fA].astype(jnp.float32)
                pb = state.sub_pos[id_fB].astype(jnp.float32)
                lb = state.sub_len[id_fB].astype(jnp.float32)
                lo_a = jnp.maximum(0.0, pa - n_bounds - la)
                hi_a = pa + n_bounds + la
                lo_b = jnp.maximum(0.0, pb - lb)
                hi_b = pb + lb
                px = jnp.minimum(row_p, col_p)
                py = jnp.maximum(row_p, col_p)
                in_win = ((px <= hi_a) & (py >= lo_a)) | (
                    (px <= hi_b) & (py >= lo_b)
                )
                touch = jnp.where(same, touch & in_win, touch)
            if wmask is not None:
                # padded pixels gather endpoint 0's attributes and could
                # leak into the masks; they carry zero weight everywhere
                touch = touch & (wmask > 0)
            both = touch & row_in & col_in
            tmask = touch.astype(jnp.float32)
            bmask = both.astype(jnp.float32)
            cur_slice = psum(jnp.sum(pp_cur * tmask))
            g_single = psum(jnp.sum(g_trans * (tmask - bmask)))

            # compaction capacity is per pixel shard: each device
            # compacts only its local both-in pixels
            (b_idx,) = jnp.nonzero(both, size=cap, fill_value=0)
            n_sel = jnp.sum(both)
            w = (jnp.arange(cap) < n_sel).astype(jnp.float32)
            b_rows = rows[b_idx]
            b_cols = cols[b_idx]
            b_dn = data_norm[b_idx]

            if wide_rows:
                wide = jnp.swapaxes(packed24, 0, 1)  # [n_sub, 24, PACK]
                pp24 = pp_rows_fast(
                    wide[b_rows], wide[b_cols],
                    b_dn[:, None, :], params, msf,
                )  # [cap, 24]
                nz_both = jnp.sum(pp24 * w[:, None], axis=0)
            else:
                ra = jnp.take(packed24, b_rows, axis=1)  # [24, cap, PACK]
                ca = jnp.take(packed24, b_cols, axis=1)
                pp24 = pp_rows_fast(
                    ra, ca, b_dn[None, :, :], params, msf
                )
                nz_both = jnp.sum(pp24 * w[None, :], axis=1)
            nz24 = ll_nz_cur - cur_slice + g_single + psum(nz_both)
            # report the worst per-shard compacted count: the overflow
            # predicate (n_sel > cap) compares against the per-shard
            # capacity, and pmax makes it identical on every device
            return nz24, pmax(n_sel)

        # --- seg backend: geometry cache + sorted-index compaction ---
        def geom_from_rows(ra, ca):
            """Per-pixel scoring geometry from packed endpoint rows:
            (s_eff, s_tot, s_z_eff, s_tot_z), with s_eff = s_z_eff = 0
            encoding a trans pixel — the Rippe forms' own s > 0 gate
            then yields the flat v_inter, so cis/trans needs no extra
            lane and d_max / v_inter gates evaluate lazily under
            whatever params the eval uses (nuisance-safe)."""
            cis = ra[..., 1] == ca[..., 1]
            s = jnp.abs(ra[..., 0] - ca[..., 0])
            s_z = jnp.abs(ra[..., 3] - ca[..., 3]) * msf
            circ = ra[..., 2] > 0
            s_tot = jnp.where(circ, ra[..., 2], 0.0)
            s_tot_z = jnp.where(circ, ra[..., 4] * msf, 0.0)
            return jnp.stack(
                [
                    jnp.where(cis, s, 0.0),
                    s_tot,
                    jnp.where(cis, s_z, 0.0),
                    s_tot_z,
                ],
                axis=-1,
            )

        def pp_from_geom(geom_c, dn, params):
            """Per-pixel scores from the geometry cache: pure
            elementwise math, zero gathers — equal to pp_rows_fast on
            the same endpoints (f32-exact: identical operations on the
            stored operands). Window-shape agnostic: shard-padding is
            NOT masked here (windows exclude pads by construction —
            they live under virtual sub id n_sub+1); full-local-array
            callers use pp_from_geom_masked."""
            ex, log_ex = expected_counts_with_log10(
                geom_c[..., 0], geom_c[..., 1], params
            )
            ex_z = expected_counts_fast(
                geom_c[..., 2], geom_c[..., 3], params
            )
            return (
                dn[..., 0] * log_ex - ex - dn[..., 1] + ex_z * LOG10_E
            )

        def pp_from_geom_masked(geom_c, dn, params):
            """pp_from_geom over the full local pixel slice, with the
            shard-padding mask applied (pad scores are finite junk,
            so * 0 is exact)."""
            pp = pp_from_geom(geom_c, dn, params)
            return pp if wmask is None else pp * wmask

        def seg_candidate(ctx, id_fB, packed24, seg_idx, capacity):
            """The cis/trans-split delta with every O(nnz) pass removed.

            seg_fast: ALL of a candidate's pixel interaction lives in
            two bounded windows composed from the pair's member subs'
            STATIC CSR/CSC runs — the row-in window (every pixel whose
            row endpoint is a member) and the col-in window. Marginal
            sums over the windows give the touch/single terms by
            inclusion-exclusion (E_row + E_col − both), a window-sized
            nonzero compacts the both-endpoint pixels, and the 24-way
            rescore runs at the tight both-in capacity. Per-pixel
            scores come from the carried geometry cache (ctx's pp slot)
            so nothing is recomputed genome-wide. shard_nnz: the
            per-step sorted contig-pair-code index with masked sums.
            """
            (state, row_c, col_c, row_p, col_p, g_trans, pp_cur,
             ll_nz_cur, id_fA, max_id, params) = ctx
            a_i = state.id_c[id_fA]
            b_i = state.id_c[id_fB]
            if seg_fast:
                rcap, bcap_ = capacity
                geom_arr = pp_cur  # carried geometry cache
                (sub_ci,) = seg_idx
                ids, n_mem = _seg_members(sub_ci, a_i, b_i)
                # row-in window
                pix_r, w_r, n_row = _seg_rowin(ids, rcap)
                dn_r = data_norm[pix_r]
                pp_r = pp_from_geom(geom_arr[pix_r], dn_r, params)
                g_r = _g_of(dn_r, params)
                col_lab = sub_ci[cols[pix_r]]
                both_w = ((col_lab == a_i) | (col_lab == b_i)) & (
                    w_r > 0
                )
                bw_f = both_w.astype(jnp.float32)
                e_row_pp = jnp.sum(pp_r * w_r)
                e_row_g = jnp.sum(g_r * w_r)
                both_pp = jnp.sum(pp_r * bw_f)
                both_g = jnp.sum(g_r * bw_f)
                # col-in window (marginals only)
                pix_c, w_c, n_colw = _seg_colin(ids, rcap)
                dn_c = data_norm[pix_c]
                e_col_pp = jnp.sum(
                    pp_from_geom(geom_arr[pix_c], dn_c, params) * w_c
                )
                e_col_g = jnp.sum(_g_of(dn_c, params) * w_c)
                # inclusion-exclusion: every touch pixel appears once
                # per endpoint-in-pair across the two windows. LOCAL
                # partial sums here; one consolidated psum closes them
                # together with the rescore below (a scalar psum per
                # term measured 3.1x replicated cost on the virtual
                # mesh — collectives dominate the sharded step)
                cur_slice = e_row_pp + e_col_pp - both_pp
                g_single = (e_row_g + e_col_g - both_g) - both_g
                # compact the both-in pixels out of the row window
                (sel,) = jnp.nonzero(both_w, size=bcap_, fill_value=0)
                n_both = jnp.sum(both_w)
                w = (jnp.arange(bcap_) < n_both).astype(jnp.float32)
                b_idx = pix_r[sel]
                b_rows = rows[b_idx]
                b_cols = cols[b_idx]
                # report a value the tier/fallback predicates read:
                # tier-2 when the both-in count or either window
                # overflows tier 1, exact full pass past tier 2 or
                # past the member capacity
                need_t2 = (
                    (n_both > cap)
                    | (n_row > rcap1)
                    | (n_colw > rcap1)
                )
                need_full = (
                    (n_both > seg_cap2)
                    | (n_row > rcap2)
                    | (n_colw > rcap2)
                    | (n_mem > mcap_seg)
                )
                n_sel = jnp.where(
                    need_full,
                    seg_full_sentinel,
                    jnp.where(
                        need_t2,
                        jnp.maximum(n_both, jnp.int32(cap + 1)),
                        n_both,
                    ),
                )
            else:
                cA = a_i.astype(jnp.float32)
                cB = b_i.astype(jnp.float32)
                row_in = (row_c == cA) | (row_c == cB)
                col_in = (col_c == cA) | (col_c == cB)
                touch = row_in | col_in
                if wmask is not None:
                    touch = touch & (wmask > 0)
                both = touch & row_in & col_in
                tmask = touch.astype(jnp.float32)
                bmask = both.astype(jnp.float32)
                cur_slice = jnp.sum(pp_cur * tmask)
                g_single = jnp.sum(g_trans * (tmask - bmask))
                b_idx, w, n_sel = _seg_segments(
                    seg_idx, a_i, b_i, capacity
                )
                b_rows = rows[b_idx]
                b_cols = cols[b_idx]
            b_dn = data_norm[b_idx]
            ra = jnp.take(packed24, b_rows, axis=1)
            ca = jnp.take(packed24, b_cols, axis=1)
            pp24 = pp_rows_fast(ra, ca, b_dn[None, :, :], params, msf)
            nz_both = jnp.sum(pp24 * w[None, :], axis=1)
            # ONE consolidated psum per candidate: the local marginal
            # partials broadcast into the [24] rescore vector, so the
            # whole candidate costs a single cross-shard reduction
            # (and the pmax; under vmap each site batches into one
            # collective for all candidates). Identity when replicated.
            nz24 = ll_nz_cur + psum(g_single - cur_slice + nz_both)
            return nz24, pmax(n_sel)

        def update_geom(new_packed, a_i, b_i, sub_ci, geom_c):
            """Post-accept upkeep of the carried geometry cache.

            Geometry changes exactly at the both-endpoint pixels of the
            accepted pair — gathered from the members' static CSR runs
            and col-filtered with the per-sub labels as of the step
            (the mutation relabels only the pair's own fragments, so
            pre-move labels identify the changed pixels exactly). The
            update is a weighted-delta .add (padding aliases are
            no-ops). Tiered window capacities with an exact
            full-rebuild fallback."""
            ids, n_mem = _seg_members(sub_ci, a_i, b_i)
            # worst shard's update-window size: every device must take
            # the same tier/rebuild branch (identity when replicated)
            n_upd = pmax(
                jnp.sum(seg_rowptr[ids + 1] - seg_rowptr[ids])
            )

            def geom_upd(capc):
                pix, w0, _ = _seg_rowin(ids, capc)
                col_lab = sub_ci[cols[pix]]
                colin = (
                    (col_lab == a_i) | (col_lab == b_i)
                ).astype(jnp.float32)
                w = w0 * colin
                ra = new_packed[rows[pix]]
                ca = new_packed[cols[pix]]
                g_new = geom_from_rows(ra, ca)
                g_old = geom_c[pix]
                return geom_c.at[pix].add((g_new - g_old) * w[:, None])

            geom_fast = jax.lax.cond(
                n_upd > upd1,
                lambda _: geom_upd(cap_upd),
                lambda _: geom_upd(upd1),
                None,
            )
            over = (n_upd > cap_upd) | (n_mem > mcap_seg)

            def rebuild(_):
                return geom_from_rows(
                    new_packed[rows], new_packed[cols]
                )

            return jax.lax.cond(
                over, rebuild, lambda _: geom_fast, None
            )

        # --- seg backend: LOCAL candidate generation ------------------
        # A mutation of the pair (fA, fB) only rewrites fragments of
        # contig(fA) ∪ contig(fB) (ops.py), and the ops are pointwise
        # masked updates whose only cross-fragment reads are scalar
        # gathers at fA/fB/neighbour links — all members. So the 24
        # candidate states are generated in a COMPACT mini-state of
        # the member fragments (locally renumbered ids/links; contig
        # ids stay GLOBAL so cis tests and fresh max_id+1 ids remain
        # genome-consistent) with the UNCHANGED op implementations,
        # and projected only over the members' contiguous sub-frag
        # runs. Generation cost per candidate: O(member window), not
        # O(n_frags) — at 200k fragments the O(n) 5x24 state+projection
        # materialization was ~146 ms of the 177 ms step.

        def _zeros_parts(pk_rows, params, w=None):
            """(intra, n_intra) partial sums of the analytic zeros
            term over packed rows — the two state-dependent pieces of
            zeros_packed_fast, exposed so candidates can score zeros
            as a member-window delta."""
            pos = pk_rows[..., 3]
            l_cont = pk_rows[..., 4]
            circ = pk_rows[..., 2] > 0
            ex = expected_counts_fast(
                pos * msf, jnp.where(circ, l_cont * msf, 0.0), params
            )
            intra_t = jnp.where(pos > 0, -ex * (l_cont - pos), 0.0)
            ni_t = jnp.where(
                pos == 0, l_cont * (l_cont - 1.0) / 2.0, 0.0
            )
            if w is not None:
                intra_t = intra_t * w
                ni_t = ni_t * w
            return jnp.sum(intra_t, axis=-1), jnp.sum(ni_t, axis=-1)

        def _member_sub_window(fids, fc, mc):
            """Member sub-frags as (global ids, owner slot, weight,
            count): sub ids are contiguous per fragment in fragment
            order (setup.build_sub_index tiling), so the members' subs
            are a union of static runs of `suboff` — same composition
            trick as _seg_window. Fill id n_sub => zero-length run."""
            lo = suboff[fids]
            lens = suboff[fids + 1] - lo
            offs = jnp.cumsum(lens)
            n_smem = offs[-1]
            js = jnp.arange(mc)
            marks = jnp.zeros(mc, jnp.int32).at[offs - lens].max(
                jnp.arange(fc, dtype=jnp.int32), mode="drop"
            )
            run = jax.lax.cummax(marks)
            prev = offs[run] - lens[run]
            gsub = jnp.clip(lo[run] + (js - prev), 0, n_sub_total - 1)
            vsub = js < n_smem
            gsub = jnp.where(vsub, gsub, n_sub_total).astype(jnp.int32)
            return gsub, run, vsub.astype(jnp.float32), n_smem

        def project_packed_local(st_loc, gsub, run):
            """project_packed over the member window only: [mc, PACK]
            rows of one local mutated state (same lanes/formula;
            contig-id lane carries the GLOBAL ids the local state
            keeps). Pad slots hold junk — every consumer masks."""
            jg = j_ext[gsub]
            wd = w_ext[gsub]
            cd = c_ext[gsub]
            ori = st_loc.ori[run]
            d = jnp.where(ori == 1, wd, cd)
            pos = jnp.where(
                ori == 1,
                st_loc.sub_pos[run] + jg,
                st_loc.sub_pos[run] + (st_loc.sub_len[run] - 1) - jg,
            )
            z = jnp.zeros_like(d)
            return jnp.stack(
                [
                    st_loc.start_bp[run].astype(jnp.float32) / 1000.0
                    + d,
                    st_loc.id_c[run].astype(jnp.float32),
                    st_loc.circ[run].astype(jnp.float32)
                    * st_loc.l_cont_bp[run].astype(jnp.float32)
                    / 1000.0,
                    pos.astype(jnp.float32),
                    st_loc.sub_l_cont[run].astype(jnp.float32),
                    z,
                    z,
                    z,
                ],
                axis=1,
            )

        def gen_candidate_local(ctx, pair, fc, mc):
            """24 mutated MINI-states + member-window projections.

            Exact whenever the member counts fit (fc, mc); past the
            caps the outputs are truncated junk and the candidate's
            n_sel marker routes it to a bigger tier / the exact
            full-state fallback (same protocol as scoring overflow).
            """
            (state, _, _, _, _, lctx, _, _, id_fA, max_id, params) = ctx
            id_fB, is_first = pair
            a_i = state.id_c[id_fA]
            b_i = state.id_c[id_fB]
            mem = (state.id_c == a_i) | (state.id_c == b_i)
            # explicit cumsum+scatter compaction: jnp.nonzero's TPU
            # lowering measured ~1.5x slower at [5, 50k] under vmap
            csum = jnp.cumsum(mem.astype(jnp.int32))
            n_fmem = csum[-1]
            dst = jnp.where(mem, csum - 1, fc)
            fids = (
                jnp.full(fc, nfr, jnp.int32)
                .at[dst]
                .set(
                    jnp.arange(state.n_frags, dtype=jnp.int32),
                    mode="drop",
                )
            )
            # gather straight from the carried state: the fill index
            # nfr clamps onto row nfr-1 (jit gather semantics), so
            # pad slots DUPLICATE the last fragment's row — then the
            # cheap [fc] fix-up below makes them inert (id_c -2
            # matches no contig, so no op mask and no frag_at hit
            # ever selects a pad slot; link fields of pad rows are
            # only read by the pad rows' own discarded updates).
            # This replaces a 17-field sentinel-row concat of the
            # whole state per step, which profiled at ~0.33 ms per
            # field at 50k frags (pad_clamp fusions).
            gath = {
                name: getattr(state, name)[fids]
                for name in FragState._fields
            }
            pad = fids >= nfr
            gath["id_c"] = jnp.where(pad, -2, gath["id_c"])
            gath["activ"] = jnp.where(pad, 0, gath["activ"])

            def loc_of(v):
                return jnp.where(
                    v < 0,
                    -1,
                    jnp.searchsorted(fids, v).astype(jnp.int32),
                )

            st_loc = FragState(
                **{
                    **gath,
                    "id": jnp.arange(fc, dtype=jnp.int32),
                    "prev": jnp.where(pad, -1, loc_of(gath["prev"])),
                    "next": jnp.where(pad, -1, loc_of(gath["next"])),
                }
            )
            a_loc = jnp.searchsorted(fids, id_fA).astype(jnp.int32)
            b_loc = jnp.searchsorted(fids, id_fB).astype(jnp.int32)
            stacked_loc, valid = all_candidate_states(
                st_loc, a_loc, b_loc, max_id, flip_eject=is_first
            )
            gsub, run, w_sub, n_smem = _member_sub_window(fids, fc, mc)
            packed_loc = jax.vmap(
                lambda s: project_packed_local(s, gsub, run)
            )(stacked_loc)
            return (
                stacked_loc, packed_loc, valid, fids, n_fmem, gsub,
                run, w_sub, n_smem,
            )

        def seg_candidate_local(
            ctx, id_fB, packed_loc, gsub, n_smem, n_fmem, seg_idx, caps
        ):
            """seg_candidate's fast branch over LOCAL projections: the
            24-way rescore gathers member rows from the [24, mc, PACK]
            window (global sub id -> window slot via searchsorted on
            the sorted member ids) instead of full [24, n_sub, PACK]
            projections. Member-capacity overflow joins the tier /
            full-fallback predicates."""
            (state, _, _, _, _, _, pp_cur, ll_nz_cur, id_fA, _, params
             ) = ctx
            a_i = state.id_c[id_fA]
            b_i = state.id_c[id_fB]
            rcap, bcap_, fc, mc = caps
            geom_arr = pp_cur
            (sub_ci,) = seg_idx
            pix_r, w_r, n_row = _seg_rowin(gsub, rcap)
            dn_r = data_norm[pix_r]
            pp_r = pp_from_geom(geom_arr[pix_r], dn_r, params)
            g_r = _g_of(dn_r, params)
            col_lab = sub_ci[cols[pix_r]]
            both_w = ((col_lab == a_i) | (col_lab == b_i)) & (w_r > 0)
            bw_f = both_w.astype(jnp.float32)
            e_row_pp = jnp.sum(pp_r * w_r)
            e_row_g = jnp.sum(g_r * w_r)
            both_pp = jnp.sum(pp_r * bw_f)
            both_g = jnp.sum(g_r * bw_f)
            pix_c, w_c, n_colw = _seg_colin(gsub, rcap)
            dn_c = data_norm[pix_c]
            e_col_pp = jnp.sum(
                pp_from_geom(geom_arr[pix_c], dn_c, params) * w_c
            )
            e_col_g = jnp.sum(_g_of(dn_c, params) * w_c)
            cur_slice = e_row_pp + e_col_pp - both_pp
            g_single = (e_row_g + e_col_g - both_g) - both_g
            (sel,) = jnp.nonzero(both_w, size=bcap_, fill_value=0)
            n_both = jnp.sum(both_w)
            w = (jnp.arange(bcap_) < n_both).astype(jnp.float32)
            b_idx = pix_r[sel]
            b_rows = rows[b_idx]
            b_cols = cols[b_idx]
            need_t2 = (
                (n_both > cap)
                | (n_row > rcap1)
                | (n_colw > rcap1)
                | (n_fmem > fcap1)
                | (n_smem > mcap1)
            )
            need_full = (
                (n_both > seg_cap2)
                | (n_row > rcap2)
                | (n_colw > rcap2)
                | (n_fmem > fcap2)
                | (n_smem > mcap2)
            )
            n_sel = jnp.where(
                need_full,
                seg_full_sentinel,
                jnp.where(
                    need_t2,
                    jnp.maximum(n_both, jnp.int32(cap + 1)),
                    n_both,
                ),
            )
            b_dn = data_norm[b_idx]
            lrow = jnp.clip(
                jnp.searchsorted(gsub, b_rows), 0, mc - 1
            ).astype(jnp.int32)
            lcol = jnp.clip(
                jnp.searchsorted(gsub, b_cols), 0, mc - 1
            ).astype(jnp.int32)
            ra = jnp.take(packed_loc, lrow, axis=1)
            ca = jnp.take(packed_loc, lcol, axis=1)
            pp24 = pp_rows_fast(ra, ca, b_dn[None, :, :], params, msf)
            nz_both = jnp.sum(pp24 * w[None, :], axis=1)
            nz24 = ll_nz_cur + psum(g_single - cur_slice + nz_both)
            return nz24, pmax(n_sel)

        # --- candidate scoring: aggregate + dense block ---------------
        # Same cis/trans-split delta as delta_candidate but with ZERO
        # per-pixel index compaction (profiled at 12 ms/step on yeast
        # L4, half the step): the O(nnz) mask sums become O(1) lookups
        # into per-contig-pair aggregate matrices built once per step
        # by segment_sum, and the both-endpoint re-score runs on the
        # DENSE sub-matrix of the pair's member sub-fragments — regular
        # broadcast arithmetic the VPU streams at full rate, with the
        # observed-count mask silencing absent pixels.
        def block_candidate(ctx, bagg, id_fB, packed24):
            (state, row_c, col_c, row_p, col_p, g_trans, pp_cur,
             ll_nz_cur, id_fA, max_id, params) = ctx
            sub_ci, XU, Xrowcol = bagg
            a = state.id_c[id_fA]
            b = state.id_c[id_fB]
            diff = (a != b).astype(jnp.float32)
            # inclusion-exclusion over the (pp_cur, g_trans) aggregates:
            # touch = row-in + col-in - both-in; single = touch - both.
            # The candidate needs only 4 contig-pair entries and two
            # marginal sums, all linear in the HALF-contracted
            # aggregate XU[x, i, c] = sum_j X[x,i,j] U[j,c]:
            #   PG[:, c, d]   = XU[..., d] . mask_c
            #   rowsum+colsum = (X.sum(2) + X.sum(1)) . mask_c
            # — so the full [2, ncp, ncp] PG matrix (second einsum +
            # an unavoidable 86 ms/cycle layout copy, XProf) is never
            # materialized. The pad row's id_c is remapped to -1 so it
            # can't alias contig 0 (its X rows are all-zero anyway).
            ci_pad = jnp.pad(sub_ci, (0, 1), constant_values=-1)
            ma = (ci_pad == a).astype(jnp.float32)
            mb = (ci_pad == b).astype(jnp.float32)
            prec = _AGG_PRECISION
            t_sum = jnp.einsum(
                "xs,s->x", Xrowcol, ma, precision=prec
            ) + diff * jnp.einsum(
                "xs,s->x", Xrowcol, mb, precision=prec
            )
            Xa = jnp.take(XU, a, axis=2)  # [2, S+1]
            Xb = jnp.take(XU, b, axis=2)
            dot = lambda u, m: jnp.einsum(  # noqa: E731
                "xs,s->x", u, m, precision=prec
            )
            both = dot(Xa, ma) + diff * (
                dot(Xb, ma) + dot(Xa, mb) + dot(Xb, mb)
            )
            cur_slice = t_sum[0] - both[0]
            g_single = t_sum[1] - 2.0 * both[1]

            mem = (sub_ci == a) | (sub_ci == b)
            (ids,) = jnp.nonzero(mem, size=bcap, fill_value=n_sub_total)
            n_mem = jnp.sum(mem).astype(jnp.int32)
            p24 = jnp.pad(packed24, ((0, 0), (0, 1), (0, 0)))
            rows24 = jnp.take(p24, ids, axis=1)  # [24, bcap, PACK]
            # chained row/col takes (two contiguous-row gathers). The
            # "obvious" fused 2D advanced-indexing form
            # dn_dense[ids[:,None], ids[None,:]] lowers to a scalarized
            # general gather on TPU and measured 2.8x SLOWER end-to-end
            # (133 vs 368 steps/s) — the [bcap, n_sub, 2] intermediate
            # is the cheaper evil.
            dnb = jnp.take(
                jnp.take(dn_dense, ids, axis=0), ids, axis=1
            )  # [bcap, bcap, 2]
            if block_tri:
                # score only the strict upper triangle of the member
                # grid — the only cells an observed pixel can occupy
                # (canonical triu COO + sorted member ids). Static
                # flat take keeps the gathers vectorized.
                dnt = jnp.take(
                    dnb.reshape(bcap * bcap, 2), tri_flat, axis=0
                )  # [T, 2]
                pp_t = pp_rows_fast(
                    jnp.take(rows24, tri_i, axis=1),
                    jnp.take(rows24, tri_j, axis=1),
                    dnt[None],
                    params,
                    msf,
                )  # [24, T]
                nz_b = jnp.sum(
                    jnp.where(dnt[None, :, 0] > 0, pp_t, 0.0), axis=1
                )
            else:
                pp_grid = pp_rows_fast(
                    rows24[:, :, None, :],
                    rows24[:, None, :, :],
                    dnb[None],
                    params,
                    msf,
                )  # [24, bcap, bcap]
                nz_b = jnp.sum(
                    jnp.where(dnb[None, :, :, 0] > 0, pp_grid, 0.0),
                    axis=(1, 2),
                )
            nz24 = ll_nz_cur - cur_slice + g_single + nz_b
            return nz24, n_mem

        def score_all(ctx, cand, first, bagg):
            """Generate + score every candidate pair of the step.

            Returns (stacked [n_cand,24,...] states, packed
            [n_cand,24,n_sub,PACK], scores [n_cand,24], raw nz
            [n_cand,24], n_sel [n_cand]). Under the candidate-sharding
            mesh the overflow rescore cond runs per shard (only shards
            whose local candidates overflow pay the exact pass).

            seg_local mode: stacked/packed are the LOCAL
            mini-stack/projections (truncated to the member caps);
            the accept path regenerates the winner in full instead of
            reading them.
            """

            def local_seg(cand_l, first_l, ctx_l, bagg_l):
                state = ctx_l[0]
                lctx = ctx_l[5]
                id_fA = ctx_l[8]
                max_id = ctx_l[9]
                prm = ctx_l[-1]

                def gen_and_score(fc, mc, rc, bc):
                    gen = jax.vmap(
                        lambda b, f: gen_candidate_local(
                            ctx_l, (b, f), fc, mc
                        )
                    )(cand_l, first_l)
                    (stacked_loc, packed_loc, valid, fids, n_fmem,
                     gsub, run, w_sub, n_smem) = gen
                    nz, n_sel = jax.vmap(
                        lambda b, pk, gs, ns, nf: seg_candidate_local(
                            ctx_l, b, pk, gs, ns, nf, bagg_l,
                            (rc, bc, fc, mc),
                        )
                    )(cand_l, packed_loc, gsub, n_smem, n_fmem)

                    # zeros as a member-window delta against the
                    # step's (intra_cur, ni_cur) — O(mc) per mutation
                    # instead of O(n_sub)
                    def zcand(gs, ws, pk24):
                        iw_c, nw_c = _zeros_parts(
                            lctx.packed_cur[gs], prm, ws
                        )
                        iw_m, nw_m = jax.vmap(
                            lambda p1: _zeros_parts(p1, prm, ws)
                        )(pk24)
                        intra_m = lctx.intra_cur - iw_c + iw_m
                        ni_m = lctx.ni_cur - nw_c + nw_m
                        v = jnp.asarray(prm.v_inter)
                        return LOG10_E * (
                            intra_m + (n_pix - ni_m) * (-v)
                        )

                    zeros = jax.vmap(zcand)(gsub, w_sub, packed_loc)
                    return (
                        stacked_loc, packed_loc, valid, nz, n_sel,
                        zeros, fids, gsub, run,
                    )

                (stacked_loc, packed_loc, valid, nz, n_sel, zeros,
                 fids, gsub, run) = gen_and_score(
                    fcap1, mcap1, rcap1, cap
                )

                if exact_overflow and seg_cap2 > cap:
                    over1 = n_sel > cap

                    def tier2_fn(_):
                        t2 = gen_and_score(
                            fcap2, mcap2, rcap2, seg_cap2
                        )
                        return t2[3], t2[5], t2[2]

                    nz2, zeros2, valid2 = jax.lax.cond(
                        jnp.any(over1),
                        tier2_fn,
                        lambda _: (nz, zeros, valid),
                        None,
                    )
                    nz = jnp.where(over1[:, None], nz2, nz)
                    zeros = jnp.where(over1[:, None], zeros2, zeros)
                    valid = jnp.where(over1[:, None], valid2, valid)

                if exact_overflow:
                    # exact any-scale fallback: serial full-state
                    # regeneration per (candidate, mutation) — O(n)
                    # buffers one at a time, validity recomputed on
                    # the full state (the truncated local get_bounds
                    # cannot be trusted past the caps)
                    over2 = n_sel > seg_cap2

                    def full_fb(_):
                        def per_cand(args):
                            b, f = args
                            vfull = candidate_validity(
                                state, id_fA, b, f
                            )

                            def per_op(op):
                                stf = single_candidate_state(
                                    state, id_fA, b, max_id, op
                                )
                                pk = project_packed(stf, idx)
                                nzv = psum(
                                    jnp.sum(_pp_all(pk, prm))
                                )
                                zv = zeros_packed_fast(
                                    pk, prm, msf, n_pix
                                )
                                return nzv, zv

                            nzs, zvs = jax.lax.map(
                                per_op,
                                jnp.arange(
                                    N_MUTATIONS, dtype=jnp.int32
                                ),
                            )
                            return nzs, zvs, vfull

                        return jax.lax.map(
                            per_cand, (cand_l, first_l)
                        )

                    nz_f, z_f, v_f = jax.lax.cond(
                        jnp.any(over2),
                        full_fb,
                        lambda _: (nz, zeros, valid),
                        None,
                    )
                    nz = jnp.where(over2[:, None], nz_f, nz)
                    zeros = jnp.where(over2[:, None], z_f, zeros)
                    valid = jnp.where(over2[:, None], v_f, valid)

                scores = jnp.where(valid, nz + zeros, -jnp.inf)
                # stacked_loc/packed_loc are the (mini) generation
                # outputs; the accept path regenerates the winner's
                # STATE in full instead of reading them (so XLA DCEs
                # what scoring didn't consume) and uses the tier-1
                # member windows (the aux sixth element) to update
                # the carried projection by scatter
                return (
                    stacked_loc, packed_loc, scores, nz, n_sel,
                    (fids, gsub, run),
                )

            def local(cand_l, first_l, ctx_l, bagg_l):
                if seg and seg_local_on:
                    return local_seg(cand_l, first_l, ctx_l, bagg_l)
                stacked, packed, valid = jax.vmap(
                    lambda b, f: gen_candidate(ctx_l, (b, f))
                )(cand_l, first_l)
                if plain:
                    nz = jax.vmap(
                        lambda pk: _nz24_all(pk, ctx_l[-1])
                    )(packed)
                    n_sel = jnp.zeros(cand_l.shape[0], dtype=jnp.int32)
                elif block:
                    nz, n_sel = jax.vmap(
                        lambda b, pk: block_candidate(
                            ctx_l, bagg_l, b, pk
                        )
                    )(cand_l, packed)
                elif seg:
                    t1 = (rcap1, cap) if seg_fast else cap
                    nz, n_sel = jax.vmap(
                        lambda b, pk: seg_candidate(
                            ctx_l, b, pk, bagg_l, t1
                        )
                    )(cand_l, packed)
                else:
                    nz, n_sel = jax.vmap(
                        lambda b, pk: delta_candidate(ctx_l, b, pk)
                    )(cand_l, packed)

                prm = ctx_l[-1]
                if seg and exact_overflow and seg_cap2 > cap:
                    # tier-2 rescore: candidates past the common-case
                    # capacity re-run through the same segment gather
                    # at the data-driven worst-pair bound — a rare
                    # lax.cond branch, so the big gathers cost nothing
                    # on the common path. Anything past tier 2 falls
                    # through to the exact full-matrix pass below.
                    over1 = n_sel > cap

                    def tier2_fn(_):
                        t2 = (
                            (rcap2, seg_cap2) if seg_fast else seg_cap2
                        )
                        nz2, _ = jax.vmap(
                            lambda b, pk: seg_candidate(
                                ctx_l, b, pk, bagg_l, t2
                            )
                        )(cand_l, packed)
                        return nz2

                    nz_t2 = jax.lax.cond(
                        jnp.any(over1), tier2_fn, lambda _: nz, None
                    )
                    nz = jnp.where(over1[:, None], nz_t2, nz)
                if exact_overflow and not plain:
                    # one exact full-matrix pass for the whole
                    # candidate batch when any slice overflows; its
                    # rows replace only the overflowed candidates.
                    # Aggregating the predicate over candidates keeps
                    # this a real branch in the scan and an exact
                    # select under vmap. (In block mode the capacity is
                    # in member sub-fragments, not pixels; in seg mode
                    # only candidates past tier 2 reach the full pass.)
                    if block:
                        over = n_sel > bcap
                    elif seg and seg_cap2 > cap:
                        over = n_sel > seg_cap2
                    else:
                        over = n_sel > cap

                    # the fallback is SERIALIZED over candidates and
                    # mutations (lax.map, not vmap): a vmapped exact
                    # pass materializes [n_cand, 24, nnz, PACK] gather
                    # buffers inside the cond branch — ~10 GB at yeast
                    # L2 (1.4M nnz), which crashed the TPU worker even
                    # though the branch is rarely executed (XLA
                    # allocates the union of branch buffers). One
                    # [nnz]-sized rescore at a time keeps the peak at
                    # ~100 MB; the fallback is rare, so the serial
                    # latency is irrelevant.
                    if block:

                        def full_all(pk):
                            def per_cand(pk24):
                                pkp = jnp.pad(pk24, ((0, 0), (0, 1), (0, 0)))
                                return jax.lax.map(
                                    lambda p1: jnp.sum(
                                        jnp.where(
                                            dn_dense[..., 0] > 0,
                                            pp_rows_fast(
                                                p1[:, None, :],
                                                p1[None, :, :],
                                                dn_dense, prm, msf,
                                            ),
                                            0.0,
                                        )
                                    ),
                                    pkp,
                                )

                            return jax.lax.map(per_cand, pk)

                    else:

                        def full_all(pk):
                            def per_cand(pk24):
                                return jax.lax.map(
                                    lambda p1: psum(
                                        jnp.sum(_pp_all(p1, prm))
                                    ),
                                    pk24,
                                )

                            return jax.lax.map(per_cand, pk)

                    nz_full = jax.lax.cond(
                        jnp.any(over), full_all, lambda pk: nz, packed
                    )
                    nz = jnp.where(over[:, None], nz_full, nz)

                zeros = jax.vmap(
                    jax.vmap(
                        lambda pk: zeros_packed_fast(pk, prm, msf, n_pix)
                    )
                )(packed)
                scores = jnp.where(valid, nz + zeros, -jnp.inf)
                # nz returned for the accept shortcut (the winner's nz
                # row IS the new genome's total nz log-likelihood).
                # Measured negative result: dropping stacked/packed
                # from the outputs and RE-generating the winning
                # mutation after the argmax (hoping XLA would DCE the
                # unread lanes of the 120 mutated states) ran 14%
                # slower end-to-end (338 vs 393 steps/s yeast-L4) —
                # the select from the existing stack is cheaper than
                # one extra 24-way generation.
                return stacked, packed, scores, nz, n_sel

            if mesh is None:
                return local(cand, first, ctx, bagg)

            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            return shard_map(
                local,
                mesh=mesh,
                in_specs=(P("shards"), P("shards"), P(), P()),
                out_specs=P("shards"),
                check_vma=False,
            )(cand, first, ctx, bagg)

        # --- exact incremental pp_cur update after an accepted move --
        def update_pp(
            new_packed, row_c, col_c, cA, cB, pp_cur, ll_nz_cur,
            params, seg_idx=None,
        ):
            """Re-score exactly the pixels whose pp can change under the
            accepted move — those with BOTH endpoints in the affected
            contigs (old labels): single-endpoint pixels are trans both
            before and after, so their term is untouched (see
            delta_candidate). Full-recompute fallback when the update
            set overflows. The seg backend reuses the step's sorted
            contig-pair index (built from the same old labels) instead
            of the jnp.nonzero compaction."""
            if seg_idx is not None:
                upd_idx, w, n_upd = _seg_segments(
                    seg_idx,
                    cA.astype(jnp.int32),
                    cB.astype(jnp.int32),
                    cap_upd,
                )
            else:
                row_in = (row_c == cA) | (row_c == cB)
                col_in = (col_c == cA) | (col_c == cB)
                touch = row_in & col_in
                if wmask is not None:
                    touch = touch & (wmask > 0)
                (upd_idx,) = jnp.nonzero(
                    touch, size=cap_upd, fill_value=0
                )
                n_upd = jnp.sum(touch)
                w = (jnp.arange(cap_upd) < n_upd).astype(jnp.float32)
            ra = new_packed[rows[upd_idx]]
            ca = new_packed[cols[upd_idx]]
            pp_new = pp_rows_fast(ra, ca, data_norm[upd_idx], params, msf)
            old_vals = pp_cur[upd_idx]
            if seg_idx is not None:
                # clipped padding positions can alias a real updated
                # pixel (segment ending at the array tail), so a .set
                # with duplicate indices would be nondeterministic;
                # the weighted-delta .add makes padding a true no-op
                pp_fast = pp_cur.at[upd_idx].add(
                    (pp_new - old_vals) * w
                )
            else:
                merged = jnp.where(w > 0, pp_new, old_vals)
                pp_fast = pp_cur.at[upd_idx].set(merged)
            ll_fast = ll_nz_cur + psum(jnp.sum((pp_new - old_vals) * w))

            def recompute(_):
                pp = _pp_all(new_packed, params)
                return pp, psum(jnp.sum(pp))

            def keep(_):
                return pp_fast, ll_fast

            # pmax makes the predicate identical on every shard, so the
            # recompute branch's psum cannot deadlock
            return jax.lax.cond(
                pmax(n_upd) > cap_upd, recompute, keep, None
            )

        # --- nuisance MH (reference cuda_lib_gl_single.py:2961) ------
        def propose_nuisance(key, params):
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
                * jnp.exp((d - 2.0) / (jnp.square(s_safe * lm / kuhn) + d))
            )
            new_d_nuc = jnp.where(id_modif == 2, curve, new_d_nuc)
            new_c1 = (
                0.53 * jnp.power(lm / kuhn, new_slope) * jnp.power(kuhn, -3.0)
            )
            test = RippeParams(
                kuhn, lm, new_c1, new_slope, d, new_d_max, new_fact,
                new_d_nuc,
            )
            return test, k_acc

        def nuisance_step_dense(key, packed_pad, params, ll_t):
            """Nuisance MH with the dense-grid likelihood (block mode)."""
            test, k_acc = propose_nuisance(key, params)
            ll_test = jnp.sum(
                pp_dense_all(packed_pad, test)
            ) + zeros_packed_fast(packed_pad, test, msf, n_pix)
            accept = jnp.exp(
                jnp.clip(ll_test - ll_t, -50.0, 50.0)
            ) >= jax.random.uniform(k_acc, ())
            out_params = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), test, params
            )
            return out_params, jnp.where(accept, ll_test, ll_t), accept

        def nuisance_step(key, state, packed, params, ll_t, pp_cur, ll_nz):
            test, k_acc = propose_nuisance(key, params)
            pp_test = _pp_all(packed, test)
            nz_test = psum(jnp.sum(pp_test))
            ll_test = nz_test + zeros_packed_fast(packed, test, msf, n_pix)
            accept = jnp.exp(
                jnp.clip(ll_test - ll_t, -50.0, 50.0)
            ) >= jax.random.uniform(k_acc, ())
            out_params = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), test, params
            )
            out_pp = jnp.where(accept, pp_test, pp_cur)
            out_nz = jnp.where(accept, nz_test, ll_nz)
            return (
                out_params,
                jnp.where(accept, ll_test, ll_t),
                out_pp,
                out_nz,
                accept,
            )

        # --- one sweep step ------------------------------------------
        def sweep_step(carry, inputs):
            id_fA, key, do_nuis = inputs
            if seg and seg_local_on:
                # local mode carries the [n_sub, PACK] projection and
                # updates it by member-window scatter after accepts:
                # the full projection's 8 O(n_sub) endpoint gathers
                # (profiled ~0.33 ms EACH at 50k subs, twice per step)
                # happen once per CHUNK, at the boundary. Per-step
                # contig renumbering is skipped too: scoring only ever
                # compares contig ids for equality, so the compaction
                # sort buys nothing inside the scan (ids stay bounded
                # by the chunk-boundary renumber + <=3 fresh ids per
                # accepted move). n_contigs needs no compaction:
                # every contig has exactly one pos==0 fragment.
                (state, params, ll_t, pp_cur, ll_nz_cur,
                 packed_cur) = carry
                n_contigs = jnp.sum(state.pos == 0).astype(jnp.int32)
                mean_len = (
                    jnp.float32(self.n_frags)
                    / n_contigs.astype(jnp.float32)
                )
                max_id = jnp.max(state.id_c)
            else:
                state, params, ll_t, pp_cur, ll_nz_cur = carry
                state, n_contigs, mean_len = renumber_contigs(state)
                max_id = (n_contigs - 1).astype(jnp.int32)
                packed_cur = project_packed(state, idx)
            k_nb, k_nuis = jax.random.split(key)
            if block:
                # dense current-genome score matrix + contig-pair
                # aggregates via one-hot matmuls: P[c1,c2] = U^T X U
                # rides the MXU instead of an XLA scatter-add (which
                # profiled at 4 ms/step for the same reduction)
                pcur = jnp.pad(packed_cur, ((0, 1), (0, 0)))
                pp_d = pp_dense_all(pcur, params)
                g_d = g_dense_all(params)
                ll_nz_cur = jnp.sum(pp_d)
                sub_ci = packed_cur[:, 1].astype(jnp.int32)
                # pad row projects into contig 0 but both its dense
                # rows are all-zero, so it adds nothing to any bin
                u_src = pcur[:, 1].astype(jnp.int32)
                U = (
                    u_src[:, None] == jnp.arange(ncp)[None, :]
                ).astype(jnp.float32)
                X = jnp.stack([pp_d, g_d])
                # half-contracted aggregate: candidates finish the
                # second contraction themselves with masked dots (see
                # block_candidate) — the full PG is never built
                XU = jnp.einsum(
                    "bij,jc->bic", X, U,
                    precision=_AGG_PRECISION,
                )
                bagg = (sub_ci, XU, X.sum(2) + X.sum(1))
                z = jnp.zeros(())
                row_c = col_c = row_p = col_p = g_trans = z
            elif plain:
                # all-pixel scoring needs no per-pixel step context:
                # no endpoint gathers, no trans term, no pixel cache
                z = jnp.zeros(())
                row_c = col_c = row_p = col_p = g_trans = z
                bagg = ()
            elif seg:
                sub_ci = packed_cur[:, 1].astype(jnp.int32)
                z = jnp.zeros(())
                if seg_fast:
                    # nothing per-step to build at all: candidates pull
                    # everything from bounded member-run windows + the
                    # carried geometry cache (ctx's pp slot) and the
                    # carried nz total. No per-pixel labels, no sort,
                    # no O(nnz) masked sums.
                    geom_c = pp_cur
                    pp_arr = geom_c
                    row_c = col_c = row_p = col_p = g_trans = z
                    bagg = (sub_ci,)
                    if seg_local_on:
                        # local-generation context: the current
                        # genome's zeros partial sums (candidates
                        # score zeros as a window delta against them)
                        intra_cur, ni_cur = _zeros_parts(
                            packed_cur, params
                        )
                        g_trans = SegLocalCtx(
                            packed_cur=packed_cur,
                            intra_cur=intra_cur,
                            ni_cur=ni_cur,
                        )
                else:
                    # shard layout: per-shard label gathers + a sorted
                    # contig-pair-code index shared by all candidates
                    # and the post-accept cache update — one per-shard
                    # O(nnz log nnz) sort replaces n_cand + 1
                    # jnp.nonzero compactions
                    row_ci = sub_ci[rows]
                    col_ci = sub_ci[cols]
                    pp_arr = pp_cur
                    row_c = row_ci.astype(jnp.float32)
                    col_c = col_ci.astype(jnp.float32)
                    row_p = col_p = z
                    v = jnp.asarray(params.v_inter)
                    g_trans = (
                        data_norm[:, 0]
                        * jnp.log10(jnp.maximum(v, 1e-38))
                        - v
                        - data_norm[:, 1]
                        + v * LOG10_E
                    )
                    if wmask is not None:
                        g_trans = g_trans * wmask
                    codes = row_ci * np.int32(ncp_seg) + col_ci
                    if wmask is not None:
                        codes = jnp.where(
                            wmask > 0, codes, seg_sentinel
                        )
                    sorted_codes, perm = jax.lax.sort_key_val(
                        codes, jnp.arange(nnz_local, dtype=jnp.int32)
                    )
                    bagg = (sorted_codes, perm)
            else:
                # only the contig-id and position lanes are needed per
                # pixel-endpoint: gather 8-byte (id_c, pos) rows, not
                # the full 32-byte attribute rows
                cp = packed_cur[:, (1, 3)]
                row_cp = cp[rows]
                col_cp = cp[cols]
                row_c, row_p = row_cp[:, 0], row_cp[:, 1]
                col_c, col_p = col_cp[:, 0], col_cp[:, 1]
                # flat trans score term, data-only (delta_candidate)
                v = jnp.asarray(params.v_inter)
                g_trans = (
                    data_norm[:, 0] * jnp.log10(jnp.maximum(v, 1e-38))
                    - v
                    - data_norm[:, 1]
                    + v * LOG10_E
                )
                if wmask is not None:
                    g_trans = g_trans * wmask
                bagg = ()

            cand = jnp.sort(
                sample_neighbours(k_nb, self.table, id_fA, n_cand)
            )
            first = jnp.arange(n_cand) == 0
            ctx = (
                state, row_c, col_c, row_p, col_p, g_trans,
                pp_arr if seg else pp_cur,
                ll_nz_cur, id_fA, max_id, params,
            )
            out_sc = score_all(ctx, cand, first, bagg)
            if seg and seg_local_on:
                stacked, packed_c, scores, nz_c, n_sel, laux = out_sc
            else:
                stacked, packed_c, scores, nz_c, n_sel = out_sc
            n_overflow = jnp.sum(n_sel > (bcap if block else cap))
            slice_max = jnp.max(n_sel)
            flat = scores.reshape(-1)
            best = jnp.argmax(flat)
            cand_i = best // N_MUTATIONS
            op = best % N_MUTATIONS
            id_fB = cand[cand_i]

            cA = state.id_c[id_fA].astype(jnp.float32)
            cB = state.id_c[id_fB].astype(jnp.float32)
            if seg and seg_local_on:
                # local mode: the stack holds truncated MINI-states —
                # regenerate the winner's STATE in full (ONE O(n)
                # elementwise mutation via lax.switch, exact at any
                # member-window size; a select-from-local-stack +
                # per-field scatter variant measured slower through
                # the cond's whole-state copies), then update the
                # carried projection by scattering the winner's
                # freshly-projected member rows — mutations only
                # change the old pair's member fragments, so every
                # other packed row is bit-identical. The winner's
                # tier-1 member window (aux) covers the common case;
                # overflowed winners recompute members at tier-2 caps
                # or fall back to the full projection under rare
                # conds whose outputs are just the [n_sub, 8] matrix.
                new_state = single_candidate_state(
                    state, id_fA, id_fB, max_id, op
                )
                fids_all, gsub_all, run_all = laux

                def _project_members(fids_w, gsub_w, run_w):
                    st_l = _types.SimpleNamespace(
                        **{
                            f: getattr(new_state, f)[fids_w]
                            for f in (
                                "ori", "sub_pos", "sub_len",
                                "start_bp", "id_c", "circ",
                                "l_cont_bp", "sub_l_cont",
                            )
                        }
                    )
                    rows_new = project_packed_local(
                        st_l, gsub_w, run_w
                    )
                    return packed_cur.at[gsub_w].set(
                        rows_new, mode="drop"
                    )

                def t1_upd(_):
                    return _project_members(
                        fids_all[cand_i], gsub_all[cand_i],
                        run_all[cand_i],
                    )

                def slow_upd(_):
                    def full_upd(_):
                        return project_packed(new_state, idx)

                    def t2_upd(_):
                        a0 = state.id_c[id_fA]
                        b0 = state.id_c[id_fB]
                        mem = (state.id_c == a0) | (
                            state.id_c == b0
                        )
                        csum = jnp.cumsum(mem.astype(jnp.int32))
                        dst = jnp.where(mem, csum - 1, fcap2)
                        fids_w = (
                            jnp.full(fcap2, nfr, jnp.int32)
                            .at[dst]
                            .set(
                                jnp.arange(
                                    self.n_frags, dtype=jnp.int32
                                ),
                                mode="drop",
                            )
                        )
                        gsub_w, run_w, _, _ = _member_sub_window(
                            fids_w, fcap2, mcap2
                        )
                        return _project_members(
                            fids_w, gsub_w, run_w
                        )

                    return jax.lax.cond(
                        n_sel[cand_i] > seg_cap2,
                        full_upd,
                        t2_upd,
                        None,
                    )

                new_packed = jax.lax.cond(
                    n_sel[cand_i] <= cap, t1_upd, slow_upd, None
                )
            else:
                # select the accepted state/projection from the
                # candidate stack instead of re-generating the 24
                # mutations
                new_state = jax.tree.map(
                    lambda a: a[cand_i, op], stacked
                )
                new_packed = packed_c[cand_i, op]

            if block:
                new_pad = jnp.pad(new_packed, ((0, 1), (0, 0)))
            if plain or (block and exact_overflow):
                # the chosen candidate's nz row already IS the accepted
                # genome's exact total nz log-likelihood (plain scores
                # every pixel; block's delta is exact and overflow rows
                # were re-scored in full), so the post-accept dense
                # re-score is redundant
                ll_nz_cur = nz_c[cand_i, op]
            elif block:
                # truncating block mode (exact_overflow=False): keep
                # the exact dense re-score so truncation can only
                # affect the argmax, never the likelihood trajectory
                ll_nz_cur = jnp.sum(pp_dense_all(new_pad, params))
            elif seg and seg_fast:
                # the chosen candidate's nz row is exact (tier-2 +
                # full-pass overflow handling), and the carried cache
                # is geometry, not scores: update it at the accepted
                # pair's pixels and move on. The delta-chained nz total
                # is refreshed from the cache on every nuisance step
                # (and per-cycle by init_cache), bounding f32 drift.
                geom_c = update_geom(
                    new_packed, state.id_c[id_fA], state.id_c[id_fB],
                    sub_ci, geom_c,
                )
                pp_cur = geom_c
                if exact_overflow:
                    ll_nz_cur = nz_c[cand_i, op]
                else:
                    # truncating mode: derive the exact total from the
                    # (always exact) geometry cache so truncation can
                    # only affect the argmax
                    ll_nz_cur = psum(
                        jnp.sum(
                            pp_from_geom_masked(
                                geom_c, data_norm, params
                            )
                        )
                    )
            else:
                pp_cur, ll_nz_cur = update_pp(
                    new_packed, row_c, col_c, cA, cB, pp_cur, ll_nz_cur,
                    params, bagg if seg else None,
                )

            # carried likelihood comes from the exactly-updated pixel
            # cache + the analytic zeros term, not from the accepted
            # candidate's slice score: windowing/truncation can then
            # only affect which move wins the argmax, never the
            # likelihood trajectory itself.
            ll_t = ll_nz_cur + zeros_packed_fast(
                new_packed, params, msf, n_pix
            )
            # lax.cond so steps with the nuisance MH disabled skip its
            # full-matrix pass at runtime (under the scan the cond is a
            # real branch; under a chain-vmap it lowers to a
            # both-branches select, which is no worse than the
            # unconditional call it replaces)
            if block:

                def with_nuis(_):
                    return nuisance_step_dense(
                        k_nuis, new_pad, params, ll_t
                    )

                def without_nuis(_):
                    return params, ll_t, jnp.asarray(False)

                params, ll_t, accepted = jax.lax.cond(
                    do_nuis, with_nuis, without_nuis, None
                )
            elif plain:
                # no pixel cache to refresh: score the proposal over
                # all pixels and keep params/ll on acceptance
                def with_nuis(_):
                    test, k_acc = propose_nuisance(k_nuis, params)
                    nz_test = psum(jnp.sum(_pp_all(new_packed, test)))
                    ll_test = nz_test + zeros_packed_fast(
                        new_packed, test, msf, n_pix
                    )
                    accept = jnp.exp(
                        jnp.clip(ll_test - ll_t, -50.0, 50.0)
                    ) >= jax.random.uniform(k_acc, ())
                    out_params = jax.tree.map(
                        lambda a, b: jnp.where(accept, a, b), test, params
                    )
                    return (
                        out_params,
                        jnp.where(accept, ll_test, ll_t),
                        jnp.where(accept, nz_test, ll_nz_cur),
                        accept,
                    )

                def without_nuis(_):
                    return params, ll_t, ll_nz_cur, jnp.asarray(False)

                params, ll_t, ll_nz_cur, accepted = jax.lax.cond(
                    do_nuis, with_nuis, without_nuis, None
                )
            elif seg and seg_fast:
                # nuisance MH straight off the geometry cache: a
                # param-only proposal re-scores every pixel with pure
                # elementwise math (geometry is invariant; the d_max /
                # v_inter gates evaluate under the proposal), replacing
                # the gather-based full-matrix pass — measured ~8 ms ->
                # ~0.5 ms per step at yeast L2 (1M nnz). The same pass
                # also re-derives the CURRENT-params total, refreshing
                # the delta-chained nz carry (f32 drift correction).
                def with_nuis(_):
                    test, k_acc = propose_nuisance(k_nuis, params)
                    # one consolidated psum for both totals
                    nz_pair = psum(
                        jnp.stack(
                            [
                                jnp.sum(
                                    pp_from_geom_masked(
                                        geom_c, data_norm, test
                                    )
                                ),
                                jnp.sum(
                                    pp_from_geom_masked(
                                        geom_c, data_norm, params
                                    )
                                ),
                            ]
                        )
                    )
                    nz_test, nz_fresh = nz_pair[0], nz_pair[1]
                    zeros_cur = zeros_packed_fast(
                        new_packed, params, msf, n_pix
                    )
                    ll_base = nz_fresh + zeros_cur
                    ll_test = nz_test + zeros_packed_fast(
                        new_packed, test, msf, n_pix
                    )
                    accept = jnp.exp(
                        jnp.clip(ll_test - ll_base, -50.0, 50.0)
                    ) >= jax.random.uniform(k_acc, ())
                    out_params = jax.tree.map(
                        lambda a, b: jnp.where(accept, a, b), test,
                        params,
                    )
                    return (
                        out_params,
                        jnp.where(accept, ll_test, ll_base),
                        jnp.where(accept, nz_test, nz_fresh),
                        accept,
                    )

                def without_nuis(_):
                    return params, ll_t, ll_nz_cur, jnp.asarray(False)

                params, ll_t, ll_nz_cur, accepted = jax.lax.cond(
                    do_nuis, with_nuis, without_nuis, None
                )
            else:

                def with_nuis(_):
                    return nuisance_step(
                        k_nuis, new_state, new_packed, params, ll_t,
                        pp_cur, ll_nz_cur,
                    )

                def without_nuis(_):
                    return (
                        params, ll_t, pp_cur, ll_nz_cur,
                        jnp.asarray(False),
                    )

                params, ll_t, pp_cur, ll_nz_cur, accepted = jax.lax.cond(
                    do_nuis, with_nuis, without_nuis, None
                )

            # packed trace vector (see TRACE_KEYS; one D2H per cycle)
            trace = jnp.stack([
                jnp.asarray(v, jnp.float32)
                for v in (
                    ll_t, op, id_fA, id_fB, n_contigs, mean_len,
                    params.fact, params.slope, params.d_max,
                    params.v_inter, params.d, accepted, n_overflow,
                    slice_max, dist_fn(new_state),
                )
            ])
            if seg and seg_local_on:
                return (
                    new_state, params, ll_t, pp_cur, ll_nz_cur,
                    new_packed,
                ), trace
            return (new_state, params, ll_t, pp_cur, ll_nz_cur), trace

        def init_cache(state, params):
            if block or plain:
                # no per-pixel cache: block recomputes the dense score
                # matrix inside every step, plain re-scores all pixels
                # per candidate anyway
                return jnp.zeros((1,), jnp.float32), jnp.float32(0.0)
            if seg and seg_fast:
                # geometry cache: the only O(nnz) gathers of the whole
                # cycle happen here, once
                packed0 = project_packed(state, idx)
                geom0 = geom_from_rows(packed0[rows], packed0[cols])
                nz0 = psum(
                    jnp.sum(
                        pp_from_geom_masked(geom0, data_norm, params)
                    )
                )
                return geom0, nz0
            # fresh per-pixel cache each cycle (bounds drift)
            packed0 = project_packed(state, idx)
            pp0 = _pp_all(packed0, params)
            return pp0, psum(jnp.sum(pp0))

        def chunk_fn(state, params, ll_t, pp, nz, order, keys, flags):
            """Advance a contiguous slice of the cycle's sweep steps.

            order/keys/flags carry the slice; the per-pixel cache
            (pp, nz) threads across calls so a cycle split into
            bounded-wall-time device calls is bit-identical to the
            single-call cycle (some TPU transports kill any single
            execution past ~60 s — see SweepEngine(steps_per_call=)).
            """
            if seg and seg_local_on:
                # chunk-boundary prologue: one contig renumbering
                # (headroom covers the ids any previous un-renumbered
                # chunk could have minted: <= 3 per accepted step, at
                # most one cycle of n_frags steps between renumbers)
                # and ONE full projection, both amortized over the
                # whole chunk — the scan maintains the projection by
                # member scatter and never renumbers (see sweep_step)
                state = renumber_contigs(
                    state, headroom=3 * self.n_frags + 8
                )[0]
                packed0 = project_packed(state, idx)
                (state, params, ll_t, pp, nz, _), traces = (
                    jax.lax.scan(
                        sweep_step,
                        (state, params, ll_t, pp, nz, packed0),
                        (order, keys, flags),
                    )
                )
                return state, params, ll_t, pp, nz, traces
            (state, params, ll_t, pp, nz), traces = jax.lax.scan(
                sweep_step,
                (state, params, ll_t, pp, nz),
                (order, keys, flags),
            )
            return state, params, ll_t, pp, nz, traces

        def cycle_fn(state, params, ll_t, key, sample_param_on):
            k_perm, k_steps = jax.random.split(key)
            order = jax.random.permutation(
                k_perm, self.n_frags
            ).astype(jnp.int32)
            keys = jax.random.split(k_steps, self.n_frags)
            pp0, nz0 = init_cache(state, params)
            state, params, ll_t, _, _, traces = chunk_fn(
                state, params, ll_t, pp0, nz0, order, keys,
                sample_param_on,
            )
            return state, params, ll_t, traces

        def initial_fn(state, params):
            packed = project_packed(state, idx)
            return psum(
                jnp.sum(_pp_all(packed, params))
            ) + zeros_packed_fast(packed, params, msf, n_pix)

        return cycle_fn, initial_fn, chunk_fn, init_cache

    # ------------------------------------------------------------------
    def calibrate_steps_per_call(
        self,
        state: FragState,
        params: RippeParams,
        *,
        local_batch: int = 1,
        probe_steps: int = 16,
        target_s: float = 20.0,
    ) -> int | None:
        """Resize the auto steps_per_call from a timed probe chunk.

        The constructor's cost model uses constants measured on one
        chip generation; this probes the actual hardware instead: run
        a probe_steps-long chunk twice on the real inputs (the first
        call compiles, the second is timed), derive the steps that fit
        a ~target_s device call, and install that for subsequent
        calls. The probe is functionally pure — its outputs are
        discarded — and chunk size never changes the trajectory (the
        chunked cycle is bit-identical to the single-call cycle by
        construction), so calibration only moves wall-time boundaries.

        local_batch: chains each device advances per call in a
        chain-batched layout — per-call cost scales with it, so the
        step budget is divided accordingly.

        No-op (returns the current value) unless the engine was built
        with steps_per_call="auto" and chunking is active; runs at
        most once per engine. steps_per_call="model" keeps the
        constants-only sizing.
        """
        if self._spc_mode != "auto" or self.steps_per_call is None:
            return self.steps_per_call
        self._spc_mode = "calibrated"
        import logging
        import time

        n = self.n_frags
        k = int(min(probe_steps, n))
        k_perm, k_steps = jax.random.split(jax.random.PRNGKey(0))
        order = jax.random.permutation(k_perm, n).astype(jnp.int32)[:k]
        keys = jax.random.split(k_steps, n)[:k]
        flags = np.ones(k, dtype=bool)  # nuisance MH on: worst case
        params = jax.tree.map(jnp.asarray, params)
        pp, nz = self._init_cache(state, params)
        args = (
            state, params, jnp.float32(0.0), pp, nz, order, keys, flags,
        )
        jax.block_until_ready(self._run_chunk(*args))  # compile + run
        t0 = time.perf_counter()
        jax.block_until_ready(self._run_chunk(*args))
        per_step = (
            (time.perf_counter() - t0) / k * max(int(local_batch), 1)
        )
        measured = max(
            64, min(1024, int(target_s / max(per_step, 1e-9)))
        )
        spc = measured if n > measured else None
        logging.getLogger("instagraal_tpu").info(
            "steps_per_call calibrated: cost model said %s, probe "
            "measured %.2f ms/step (x%d local chains) -> %s",
            self._spc_model, per_step * 1e3, local_batch, spc,
        )
        self.steps_per_call = spc
        return spc

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

        With steps_per_call set, the cycle runs as ceil(n_frags /
        steps_per_call) bounded device calls; the PRNG derivation
        matches the single-call path exactly (same key split, same
        permutation), so the trajectory is bit-identical. "auto"
        sizing is calibrated against a timed probe chunk on the first
        chunked cycle (calibrate_steps_per_call).
        """
        flags = np.full(self.n_frags, bool(sample_param))
        spc = self.steps_per_call
        if (
            spc is not None
            and spc < self.n_frags
            and jax.default_backend() == "tpu"
        ):
            # probe-calibrate only where call sizing matters (TPU
            # watchdog transports); CPU/test runs keep the cost-model
            # value and skip the probe's extra compile. The method
            # remains explicitly callable on any backend.
            spc = self.calibrate_steps_per_call(state, params)
        if spc is None or spc >= self.n_frags:
            import time

            t0 = time.perf_counter()
            state, params, ll, traces = self._run_cycle(
                state, jax.tree.map(jnp.asarray, params),
                np.float32(ll_t), key, flags,
            )
            ll = float(ll)
            elapsed = time.perf_counter() - t0
            warm = getattr(self, "_spc_warm", False)
            self._spc_warm = True
            if (
                self._spc_mode == "auto"
                and warm  # first call's timing is mostly compile
                and elapsed > 45.0
                and self.n_frags > 64
                and jax.default_backend() == "tpu"
            ):
                # reverse-direction guard: the cost model said "whole
                # cycle in one call" but this hardware is slower than
                # the model's chip, and per-execution watchdogs only
                # exist on (tunneled) TPU transports — chunk
                # subsequent cycles. CPU runs skip this: no watchdog,
                # and chunking there only adds compiles.
                import logging

                self.steps_per_call = max(
                    64, int(self.n_frags * 20.0 / elapsed)
                )
                self._spc_mode = "calibrated"
                logging.getLogger("instagraal_tpu").info(
                    "single-call cycle took %.0f s (> watchdog "
                    "margin); chunking subsequent cycles at "
                    "steps_per_call=%d", elapsed, self.steps_per_call,
                )
            traces = traces_to_host(traces)
            return state, params, ll, traces

        k_perm, k_steps = jax.random.split(key)
        order = jax.random.permutation(k_perm, self.n_frags).astype(
            jnp.int32
        )
        keys = jax.random.split(k_steps, self.n_frags)
        params = jax.tree.map(jnp.asarray, params)
        pp, nz = self._init_cache(state, params)
        ll = jnp.float32(ll_t)
        chunks = []
        for s in range(0, self.n_frags, spc):
            e = min(s + spc, self.n_frags)
            state, params, ll, pp, nz, tr = self._run_chunk(
                state, params, ll, pp, nz,
                order[s:e], keys[s:e], flags[s:e],
            )
            chunks.append(tr)
        traces = traces_to_host(
            np.concatenate([np.asarray(t) for t in chunks], axis=0)
        )
        return state, params, float(ll), traces

    def initial_ll(self, state: FragState, params: RippeParams) -> float:
        return float(self._initial_ll(state, params))

    @classmethod
    def probe_seg_capacity(
        cls,
        sim,
        state: FragState,
        params=None,
        caps=(256, 512, 954, 2048),
        probe_steps: int = 64,
        log=None,
        **engine_kw,
    ) -> dict:
        """Measure the seg tier-1 capacity's real per-step cost on the
        running device and pick the fastest (VERDICT r3 #7: replaces
        the one-chip "~1.3 us per capacity unit" constant with a
        measurement). Builds one engine per candidate capacity (the
        row-window/update caps derive from tier 1), times a
        probe_steps chunk of real sweep steps each, fits the linear
        per-unit cost, and returns
        {"measured": [{"cap", "steps_per_sec", "ms_per_step"}...],
         "best_cap", "us_per_capacity_unit", ...}.
        Capacity never changes results (tier-2 + exact-overflow
        fallbacks keep scoring exact), so the winner is purely a
        wall-time choice. Cost: one compile per candidate capacity.
        """
        import time

        import numpy as np

        if params is None:
            # SyntheticSim carries fitted params; a real Simulation
            # returns them from estimate_parameters_rippe()
            params = getattr(sim, "params", None)
            if params is None:
                params = sim.estimate_parameters_rippe()
        measured = []
        for cap_c in caps:
            engine = cls(
                sim, backend="seg", sample_param=True,
                slice_capacity=int(cap_c),
                steps_per_call=int(probe_steps), **engine_kw,
            )
            p = jax.tree.map(jnp.asarray, params)
            k_perm, k_steps = jax.random.split(jax.random.PRNGKey(0))
            order = jax.random.permutation(
                k_perm, engine.n_frags
            ).astype(jnp.int32)[:probe_steps]
            keys = jax.random.split(k_steps, engine.n_frags)[
                :probe_steps
            ]
            flags = np.ones(probe_steps, dtype=bool)
            pp, nz = engine._init_cache(state, p)
            args = (
                state, p, jnp.float32(0.0), pp, nz, order, keys, flags,
            )
            jax.block_until_ready(engine._run_chunk(*args))  # compile
            t0 = time.perf_counter()
            jax.block_until_ready(engine._run_chunk(*args))
            t1 = time.perf_counter()
            jax.block_until_ready(engine._run_chunk(*args))
            t2 = time.perf_counter()
            per = min(t1 - t0, t2 - t1) / probe_steps
            row = {
                "cap": int(cap_c),
                "rowcap1": int(engine.seg_rowcaps[0]),
                "steps_per_sec": round(1.0 / per, 1),
                "ms_per_step": round(per * 1e3, 3),
            }
            measured.append(row)
            if log:
                log(f"seg capacity probe: {row}")
        best = min(measured, key=lambda r: r["ms_per_step"])
        lo, hi = (
            min(measured, key=lambda r: r["cap"]),
            max(measured, key=lambda r: r["cap"]),
        )
        us_per_unit = (
            (hi["ms_per_step"] - lo["ms_per_step"])
            * 1e3
            / max(hi["cap"] - lo["cap"], 1)
        )
        return {
            "workload": f"{sim.n_frags} frags, "
            f"{int(np.asarray(sim.coo_rows.shape)[0])} nnz",
            "device": jax.devices()[0].platform,
            "measured": measured,
            "best_cap": best["cap"],
            "us_per_capacity_unit": round(us_per_unit, 3),
            "note": "pass best_cap via slice_capacity= / --slice-cap; "
            "capacity only moves wall time (exactness is "
            "fallback-guaranteed)",
        }

    def make_chain_batched(self, n_chains: int) -> ChainBatchedFns:
        """Entry points batched over a leading chain axis (C chains).

        Replicated engines (mesh=None) get a plain chain vmap;
        shard_nnz engines get a ("chains", "shards") shard_map where
        each device holds its chains-row's states and its shards-column
        pixel slice — the composition BASELINE config #5 asks for.
        Candidate-sharded engines (mesh without shard_nnz) cannot be
        chain-batched: the candidate shard_map claims the whole mesh.
        """
        if self.mesh is not None and not self.shard_nnz:
            raise ValueError(
                "candidate-sharded engines do not compose with a chain "
                "batch; build with mesh=None (replicated) or "
                "shard_nnz=True (chains x pixel shards)"
            )
        key = int(n_chains)
        cache = getattr(self, "_chain_fns_cache", None)
        if cache is None:
            cache = self._chain_fns_cache = {}
        if key not in cache:
            cache[key] = self._make_batched_fns(key)
        return cache[key]


class MultiChainSweep:
    """Independent chains, each running whole cycles on device.

    Batches the SweepEngine's cycle over a leading chain axis sharded
    across the mesh's "chains" dimension: C chains x n_frags sweep steps
    per device call, with no host synchronisation inside a cycle. This is
    the v5e-8 scaling path for wall-clock-to-solution: chains explore
    independently and the best final genome wins (SURVEY.md §2.3).

    Two layouts, picked by how the engine was built:

    - replicated (engine mesh=None): chains are a plain vmap axis, the
      pixel arrays are shared constants; place the batch over a
      ("chains",) mesh via the `mesh` argument.
    - chains x pixel shards (engine shard_nnz=True over a 2-D
      ("chains", "shards") mesh): each device holds its chains-row's
      states and 1/|shards| of the COO; per-chain likelihood reductions
      psum over "shards" only. HBM per chip scales as nnz/|shards| even
      with many chains — BASELINE config #5's layout.

    Scoring stays exact under the chain batch: the engine's overflow
    fallback is a step-level cond over the whole candidate batch, which
    lowers to a select between two exact scorings.

    Cycles honor the engine's steps_per_call chunking in both layouts
    (bit-identical PRNG derivation to the single-call path), so
    multi-chain runs stay within per-execution wall-time budgets on
    watchdog transports.
    """

    def __init__(
        self,
        engine: SweepEngine,
        mesh=None,
        n_chains: int = 2,
        sequential: bool | None = None,
    ):
        """sequential: run the chains one after another through the
        engine's own run_cycle instead of a batched device call. Same
        PRNG derivation, so trajectories match the batched layouts;
        wall time is C x the single-chain cycle. Default (None) picks
        sequential exactly when there is nothing to parallelize over —
        no mesh and a non-sharded engine, i.e. all chains share one
        device — where the vmapped batch was measured ~3x slower per
        chain than just running the chains back to back (the vmapped
        scan body defeats XLA's gather fusion)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.engine = engine
        if engine.shard_nnz:
            if mesh is not None and mesh is not engine.mesh:
                raise ValueError(
                    "shard_nnz engines carry their own (chains, shards) "
                    "mesh; pass mesh=None or the engine's mesh"
                )
            mesh = engine.mesh
            if "chains" not in mesh.shape:
                raise ValueError(
                    "shard_nnz multi-chain needs a mesh with a 'chains' "
                    "axis (parallel.mesh.make_mesh(chains=C))"
                )
        self.mesh = mesh
        self.n_chains = n_chains
        if sequential is None:
            sequential = mesh is None and not engine.shard_nnz
        self.sequential = bool(sequential)
        self._sharding = (
            NamedSharding(mesh, P("chains")) if mesh is not None else None
        )
        # every per-chain quantity (state, params, ll, key) is batched:
        # nuisance MH makes parameters diverge between chains after the
        # first sampled cycle
        if self.sequential:
            fns = None
        elif mesh is not None and not engine.shard_nnz:
            # replicated engine on a mesh: place each chain on its
            # chains-row with an explicit shard_map (collective-free —
            # the pixel arrays are closure constants replicated
            # everywhere). Leaving the batch to vmap + GSPMD
            # auto-partitioning was measured ~6x (vmap, one device)
            # to ~100x (GSPMD over the mesh) slower per chain than the
            # single-chain cycle on a virtual CPU mesh.
            fns = self._shard_mapped_fns(engine, mesh, n_chains)
        else:
            fns = engine.make_chain_batched(n_chains)
        self._cycle_all = fns.cycle if fns else None
        self._chunk_all = fns.chunk if fns else None
        self._init_cache_all = fns.init_cache if fns else None
        # per-chain PRNG derivation identical to the single-call cycle:
        # split into (permutation key, step keys) per chain
        n = engine.n_frags

        def _derive(chain_keys):
            def one(k):
                k_perm, k_steps = jax.random.split(k)
                order = jax.random.permutation(k_perm, n).astype(
                    jnp.int32
                )
                return order, jax.random.split(k_steps, n)

            return jax.vmap(one)(chain_keys)

        self._derive = jax.jit(_derive)

    @staticmethod
    def _shard_mapped_fns(engine, mesh, n_chains):
        """Mesh-placed chain batch for a replicated engine: the pixel
        arrays are closure constants, so the shard_map takes no extra
        operands and the per-pixel cache is per-chain (P("chains")).
        Cached on the engine per (mesh, n_chains)."""
        from jax.sharding import PartitionSpec as P

        if engine.mesh is not None:
            raise ValueError(
                "candidate-sharded engines do not compose with a chain "
                "batch; build with mesh=None"
            )
        cache = getattr(engine, "_mesh_chain_fns_cache", None)
        if cache is None:
            cache = engine._mesh_chain_fns_cache = {}
        key = (id(mesh), int(n_chains))
        if key not in cache:
            cyc, chk, ini = engine._fns_unjit
            cache[key] = _chain_batched_shard_map(
                mesh, n_chains, lambda: (cyc, None, chk, ini),
                (), (), P("chains"),
            )
        return cache[key]

    def _put(self, tree):
        if self._sharding is not None:
            tree = jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), tree
            )
        return tree

    def broadcast_state(self, state: FragState) -> FragState:
        return self._put(
            jax.tree.map(
                lambda x: jnp.broadcast_to(x, (self.n_chains, *x.shape)),
                state,
            )
        )

    def broadcast_params(self, params):
        return self._put(
            jax.tree.map(
                lambda x: jnp.broadcast_to(
                    jnp.asarray(x, jnp.float32), (self.n_chains,)
                ),
                params,
            )
        )

    def run_cycle(self, states, params_all, lls, key, sample_param=True):
        """Advance every chain one full cycle.

        states: FragState stacked on a leading chain axis; params_all:
        RippeParams with [C] leaves (see broadcast_params); lls: [C].
        Returns (states, params_all, per-chain lls, traces [C, n]).
        """
        keys = jax.random.split(key, self.n_chains)
        if self.sequential:
            return self._run_cycle_sequential(
                states, params_all, lls, keys, sample_param
            )
        flags = np.full(self.engine.n_frags, bool(sample_param))
        spc = self.engine.steps_per_call
        if (
            spc is not None
            and spc < self.engine.n_frags
            and jax.default_backend() == "tpu"
        ):
            # calibrate the call size against the actual hardware,
            # scaled by how many chains each device advances per call
            # (see SweepEngine.calibrate_steps_per_call); the probe
            # uses chain 0's state — chain states share shapes, and
            # chunk size never changes trajectories
            if self.mesh is not None:
                local = -(-self.n_chains // self.mesh.shape["chains"])
            else:
                local = self.n_chains
            spc = self.engine.calibrate_steps_per_call(
                jax.tree.map(lambda x: x[0], states),
                jax.tree.map(lambda x: jnp.asarray(x)[0], params_all),
                local_batch=local,
            )
        if spc is not None and spc < self.engine.n_frags:
            return self._run_cycle_chunked(
                states, params_all, lls, keys, flags, spc
            )
        # pin the carry to the mesh so the first call's tracing key
        # matches later calls' mesh-committed outputs (the SweepEngine
        # carry-placement fix, applied to the chain batch): without it
        # the second cycle silently retraced + recompiled
        states, params_all, lls3 = self._put((
            states,
            jax.tree.map(jnp.asarray, params_all),
            jnp.asarray(lls, dtype=jnp.float32),
        ))
        states, params_all, lls, traces = self._cycle_all(
            states, params_all, lls3, keys, flags,
        )
        traces = traces_to_host(traces)
        return states, params_all, np.asarray(lls), traces

    def _run_cycle_sequential(
        self, states, params_all, lls, keys, sample_param
    ):
        """One chain after another through the engine's run_cycle
        (which itself honors steps_per_call chunking). The per-chain
        key is the same split the batched layouts use, so the
        trajectories are identical — this is a pure execution-order
        choice for the everything-on-one-device case."""
        out_s, out_p, out_ll, out_tr = [], [], [], []
        for c in range(self.n_chains):
            st_c = jax.tree.map(lambda x: x[c], states)
            pa_c = jax.tree.map(lambda x: x[c], params_all)
            s, p, ll, tr = self.engine.run_cycle(
                st_c, pa_c, float(np.asarray(lls)[c]), keys[c],
                sample_param=sample_param,
            )
            out_s.append(s)
            out_p.append(p)
            out_ll.append(ll)
            out_tr.append(tr)
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *out_s)
        params_all = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *out_p
        )
        traces = {
            k: np.stack([t[k] for t in out_tr]) for k in out_tr[0]
        }
        return states, params_all, np.asarray(out_ll), traces

    def _run_cycle_chunked(
        self, states, params_all, lls, keys, flags, spc
    ):
        n = self.engine.n_frags
        orders, step_keys = self._derive(keys)
        # same carry-pinning as run_cycle: keep every call's tracing
        # key identical to the mesh-committed steady state
        states, params_all, ll = self._put((
            states,
            jax.tree.map(jnp.asarray, params_all),
            jnp.asarray(lls, dtype=jnp.float32),
        ))
        pp, nz = self._init_cache_all(states, params_all)
        chunks = []
        for s in range(0, n, spc):
            e = min(s + spc, n)
            states, params_all, ll, pp, nz, tr = self._chunk_all(
                states, params_all, ll, pp, nz,
                orders[:, s:e], step_keys[:, s:e], flags[s:e],
            )
            chunks.append(tr)
        traces = traces_to_host(
            np.concatenate([np.asarray(t) for t in chunks], axis=1)
        )
        return states, params_all, np.asarray(ll), traces

    def best(self, states, lls):
        c = int(np.argmax(lls))
        return jax.tree.map(lambda a: a[c], states), float(lls[c])

    def restart_from_best(
        self, states, params_all, lls, thresh: float = 0.0
    ):
        """Elitist chain exchange: re-seed lagging chains from the
        best chain.

        Chains whose likelihood trails the best by more than `thresh`
        log-units adopt the best chain's genome, parameters and
        likelihood; their PRNG streams stay their own, so they diverge
        again from the next cycle. Independent chains measured only
        1.0-1.9x cycles-to-target at C=8 (docs/tts_yeast_l4.json) —
        this is the algorithmic lever on the chains axis beyond
        independence. Returns (states, params_all, lls, n_restarted).
        """
        lls_h = np.asarray(lls, dtype=np.float64)
        best_c = int(np.argmax(lls_h))
        mask = (lls_h[best_c] - lls_h) > float(thresh)
        mask[best_c] = False
        n_re = int(mask.sum())
        if n_re == 0:
            return states, params_all, lls, 0
        mask_j = jnp.asarray(mask)

        def adopt(a):
            a = jnp.asarray(a)
            m = mask_j.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a[best_c][None], a)

        states = self._put(jax.tree.map(adopt, states))
        params_all = self._put(jax.tree.map(adopt, params_all))
        lls_h[mask] = lls_h[best_c]
        return states, params_all, lls_h, n_re
