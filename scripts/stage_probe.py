#!/usr/bin/env python3
"""Per-stage timing of the seg sweep step at real L2 shapes.

Times each stage of the sweep step as its own chained jitted function
so the dominant cost is attributed by measurement, not guesswork.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.core.moves import (
        all_candidate_states,
        renumber_contigs,
    )
    from instagraal_tpu.core.ops import explode_genome
    from instagraal_tpu.model.likelihood import poisson_norm
    from instagraal_tpu.sampler.device_sweep import (
        project_packed,
        pp_rows_fast,
        zeros_packed_fast,
    )
    from instagraal_tpu.sampler.setup import Simulation
    from scripts.yeast_probe import ensure_bench_data

    level = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    repo = pathlib.Path(__file__).resolve().parents[1]
    hic = ensure_bench_data(log=lambda *a: print(*a, file=sys.stderr))
    sim = Simulation(
        "hic", hic, "/root/reference/tests/data/yeast.contigs.fa.gz",
        level, output_folder=repo / ".bench_data" / f"out_l{level}",
    )
    params = sim.estimate_parameters_rippe()
    nnz = int(sim.coo_rows.shape[0])
    n_sub = int(np.asarray(sim.sub_index.frag_of_sub).shape[0])
    idx = sim.sub_index
    rows, cols, data = sim.coo_rows, sim.coo_cols, sim.coo_data
    dn = jnp.stack(
        [data, jnp.asarray(poisson_norm(np.asarray(data)))], axis=1
    )
    msf = np.float32(sim.mean_size_frag_kb)
    n_pix = np.float32(sim.n_pix_total)
    state = explode_genome(
        sim.state, np.arange(sim.n_frags, dtype=np.int32)
    )
    state, n_contigs, _ = jax.jit(renumber_contigs)(state)
    max_id = np.int32(int(n_contigs) - 1)
    print(
        f"L{level}: n_frags={sim.n_frags} n_sub={n_sub} nnz={nnz} "
        f"cap={cap}",
        flush=True,
    )
    n_cand = 5
    cand = np.array([3, 77, 191, 1001, 2300][:n_cand], np.int32) % sim.n_frags
    first = np.zeros(n_cand, bool)
    first[0] = True
    p = jax.tree.map(jnp.asarray, params)

    def timeit(name, fn, *args, n=10):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:48s}: {dt * 1000:7.2f} ms", flush=True)
        return out

    # stage 1: candidate generation (24 mutated states x n_cand)
    def gen(state):
        def one(b, f):
            return all_candidate_states(
                state, jnp.int32(3), b, max_id, flip_eject=f
            )
        return jax.vmap(one)(jnp.asarray(cand), jnp.asarray(first))
    stacked, valid = timeit("gen: all_candidate_states x5", gen, state)

    # stage 2: full projection of all 120 mutated states
    def proj(stacked):
        return jax.vmap(
            jax.vmap(lambda s: project_packed(s, idx))
        )(stacked)
    packed = timeit("project_packed x120 (full n_sub)", proj, stacked)

    # stage 2b: projection of the CURRENT state only
    timeit("project_packed x1 (current)", lambda s: project_packed(s, idx), state)

    # stage 3: zeros over all 120 projections
    def zer(packed):
        return jax.vmap(
            jax.vmap(lambda pk: zeros_packed_fast(pk, p, msf, n_pix))
        )(packed)
    timeit("zeros_packed_fast x120 (full n_sub)", zer, packed)

    # stage 4: per-pixel labels: expand vs gather
    sub_ci = jnp.asarray(
        np.asarray(state.id_c)[np.asarray(idx.frag_of_sub)]
    )
    r_host = np.asarray(rows)
    indptr = jnp.asarray(
        np.searchsorted(r_host, np.arange(n_sub)).astype(np.int32)
    )

    def labels_expand(ci):
        deltas = jnp.concatenate([ci[:1], ci[1:] - ci[:-1]])
        base = jnp.zeros(nnz, jnp.int32).at[indptr].add(
            deltas, mode="drop"
        )
        row_ci = jnp.cumsum(base)
        col_ci = ci[cols]
        return row_ci, col_ci
    row_ci, col_ci = timeit(
        "labels: row expand + col gather", labels_expand, sub_ci
    )

    def labels_gather(ci):
        return ci[rows], ci[cols]
    timeit("labels: both gathers", labels_gather, sub_ci)

    # stage 5: codes + sort
    ncp = sim.n_frags + 1
    def sortcodes(row_ci, col_ci):
        codes = row_ci * np.int32(ncp) + col_ci
        return jax.lax.sort_key_val(
            codes, jnp.arange(nnz, dtype=jnp.int32)
        )
    sc, perm = timeit("codes + sort_key_val", sortcodes, row_ci, col_ci)

    # stage 6: masked sums x5
    pp_cur = jnp.asarray(np.random.default_rng(0).random(nnz, np.float32))
    g_tr = pp_cur * 0.5
    rc = row_ci.astype(jnp.float32)
    cc = col_ci.astype(jnp.float32)
    def msums(pp_cur, g_tr):
        def one(a, b):
            ri = (rc == a) | (rc == b)
            ci_ = (cc == a) | (cc == b)
            t = (ri | ci_).astype(jnp.float32)
            bm = (ri & ci_).astype(jnp.float32)
            return jnp.sum(pp_cur * t), jnp.sum(g_tr * (t - bm))
        return jax.vmap(one)(
            jnp.arange(5, dtype=jnp.float32),
            jnp.arange(5, dtype=jnp.float32) + 7,
        )
    timeit("masked sums x5", msums, pp_cur, g_tr)

    # stage 7: segment gather + narrow rescore at cap
    def seg_rescore(packed, sc, perm):
        def one(k, pk24):
            bounds = jnp.searchsorted(
                sc, jnp.stack([k * ncp, k * ncp + 1])
            )
            j = jnp.arange(cap)
            pos = jnp.clip(bounds[0] + j, 0, nnz - 1)
            pix = perm[pos]
            w = (j < (bounds[1] - bounds[0])).astype(jnp.float32)
            b_rows, b_cols, b_dn = rows[pix], cols[pix], dn[pix]
            ra = jnp.take(pk24, b_rows, axis=1)
            ca = jnp.take(pk24, b_cols, axis=1)
            pp24 = pp_rows_fast(ra, ca, b_dn[None], p, msf)
            return jnp.sum(pp24 * w[None, :], axis=1)
        return jax.vmap(one)(jnp.asarray(cand), packed)
    timeit(f"seg gather + NARROW rescore cap={cap}", seg_rescore, packed, sc, perm)

    # stage 7b: wide rescore
    def seg_rescore_wide(packed, sc, perm):
        def one(k, pk24):
            wide = jnp.swapaxes(pk24, 0, 1)
            bounds = jnp.searchsorted(
                sc, jnp.stack([k * ncp, k * ncp + 1])
            )
            j = jnp.arange(cap)
            pos = jnp.clip(bounds[0] + j, 0, nnz - 1)
            pix = perm[pos]
            w = (j < (bounds[1] - bounds[0])).astype(jnp.float32)
            b_rows, b_cols, b_dn = rows[pix], cols[pix], dn[pix]
            pp24 = pp_rows_fast(
                wide[b_rows], wide[b_cols], b_dn[:, None, :], p, msf
            )
            return jnp.sum(pp24 * w[:, None], axis=0)
        return jax.vmap(one)(jnp.asarray(cand), packed)
    timeit(f"seg gather + WIDE rescore cap={cap}", seg_rescore_wide, packed, sc, perm)

    # stage 8: update_pp-like at cap_upd = 2*cap
    cap_upd = 2 * cap
    new_packed = packed[0, 0]
    def upd(new_packed, pp_cur):
        j = jnp.arange(cap_upd)
        pos = jnp.clip(j, 0, nnz - 1)
        pix = perm[pos]
        w = (j < 500).astype(jnp.float32)
        ra = new_packed[rows[pix]]
        ca = new_packed[cols[pix]]
        pp_new = pp_rows_fast(ra, ca, dn[pix], p, msf)
        old = pp_cur[pix]
        return pp_cur.at[pix].add((pp_new - old) * w)
    timeit(f"update_pp-like cap_upd={cap_upd}", upd, new_packed, pp_cur)

    # stage 9: nuisance full pp pass (gather-based, current form)
    def nuis(pk):
        ra = pk[rows]
        ca = pk[cols]
        return jnp.sum(pp_rows_fast(ra, ca, dn, p, msf))
    timeit("nuisance full _pp_all (gathers)", nuis, new_packed)

    # stage 9b: nuisance from a geometry cache (no gathers)
    geom = jnp.asarray(
        np.random.default_rng(1).random((nnz, 4), np.float32)
    )
    def nuis_geom(geom):
        s = geom[:, 0] * 1000.0
        s_tot = geom[:, 1]
        from instagraal_tpu.model.rippe import (
            expected_counts_fast,
            expected_counts_with_log10,
        )
        ex, log_ex = expected_counts_with_log10(s, s_tot, p)
        ex_z = expected_counts_fast(geom[:, 2], geom[:, 3], p)
        from instagraal_tpu.model.likelihood import LOG10_E
        return jnp.sum(dn[:, 0] * log_ex - ex - dn[:, 1] + ex_z * LOG10_E)
    timeit("nuisance from geometry cache (no gathers)", nuis_geom, geom)


if __name__ == "__main__":
    main()
