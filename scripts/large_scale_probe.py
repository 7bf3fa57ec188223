#!/usr/bin/env python3
"""Large-genome sharded-seg probe (BASELINE config #5 scale).

Builds a banded synthetic genome far past both the block envelope
(6,144 subs) and the legacy int32 pair-code bound (~46k frags), runs
the sort-free sharded seg engine on the available device(s), and
reports setup/build/step costs plus the per-shard HBM footprint of
the pixel arrays. This is the scale regime the reference cannot
reach at all (single GPU, dense-ish slice buffers): the TPU design's
per-step work stays O(window) and per-chip pixel memory O(nnz/S).

Usage: python scripts/large_scale_probe.py [--n-frags 200000]
       [--band 16] [--steps 64] [--out FILE]
"""

import argparse
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-frags", type=int, default=200_000)
    ap.add_argument("--band", type=int, default=16)
    # a fine-level draft is FRAGMENTED: tens of fragments per input
    # contig, not thousands. Contig size sets the candidate window
    # size (a pair's window is all its contigs' pixels — same
    # property as the reference's slice, kernel_sparse_adapt.cu:485),
    # so per-step cost tracks contig_frags * band, not n_frags.
    # --frags-per-contig 4096 reproduces the degenerate huge-contig
    # regime where every window overflows to the exact full pass.
    ap.add_argument("--frags-per-contig", type=int, default=20)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument(
        "--seg-local", default="auto", choices=("auto", "0", "1"),
        help="local candidate generation: mutate only the pair's "
        "member fragments in a compact mini-state (default auto)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from instagraal_tpu.parallel.mesh import make_mesh
    from instagraal_tpu.sampler.device_sweep import SweepEngine
    from instagraal_tpu.testing import SyntheticSim

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731

    t0 = time.perf_counter()
    sim = SyntheticSim(
        n_frags=args.n_frags,
        n_contigs=max(8, args.n_frags // args.frags_per_contig),
        seed=0, band=args.band,
    )
    t_sim = time.perf_counter() - t0
    nnz = int(sim.coo_rows.shape[0])
    log(f"synthetic genome: {args.n_frags} frags, {nnz} nnz "
        f"({t_sim:.1f}s); device={jax.devices()[0].platform} "
        f"x{len(jax.devices())}")

    mesh = make_mesh(chains=1)
    n_sh = mesh.shape["shards"]
    t0 = time.perf_counter()
    seg_local = (
        "auto" if args.seg_local == "auto" else args.seg_local == "1"
    )
    eng = SweepEngine(
        sim, backend="auto", sample_param=True, mesh=mesh,
        shard_nnz=True, steps_per_call=args.steps,
        seg_local=seg_local,
    )
    t_build = time.perf_counter() - t0
    assert eng.backend == "seg", eng.backend
    # pixel arrays: rows/cols int32 + dn [nnz,2] f32 + wmask f32 +
    # geometry cache [nnz,4] f32 + static run index (rowptr/colptr
    # [n_sub+2] i32 + csc_pix [nnz] i32)
    hbm_per_shard = (nnz / n_sh) * (4 + 4 + 8 + 4 + 16 + 4) / 1e6
    log(f"engine built {t_build:.1f}s: backend={eng.backend}, "
        f"tier1={eng.slice_capacity}, shards={n_sh}, "
        f"~{hbm_per_shard:.0f} MB pixel state per shard")

    p = jax.tree.map(jnp.asarray, sim.params)
    t0 = time.perf_counter()
    pp, nz = jax.block_until_ready(eng._init_cache(sim.state, p))
    t_init = time.perf_counter() - t0
    k_perm, k_steps = jax.random.split(jax.random.PRNGKey(0))
    order = jax.random.permutation(k_perm, eng.n_frags).astype(
        jnp.int32
    )[: args.steps]
    keys = jax.random.split(k_steps, eng.n_frags)[: args.steps]
    flags = np.ones(args.steps, dtype=bool)
    a = (sim.state, p, jnp.float32(0.0), pp, nz, order, keys, flags)
    t0 = time.perf_counter()
    jax.block_until_ready(eng._run_chunk(*a))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(eng._run_chunk(*a))
    t1 = time.perf_counter()
    jax.block_until_ready(eng._run_chunk(*a))
    t2 = time.perf_counter()
    per = min(t1 - t0, t2 - t1) / args.steps
    assert np.isfinite(float(out[2]))

    result = {
        "workload": f"synthetic {args.n_frags} frags (band "
        f"{args.band}), {nnz} nnz",
        "device": jax.devices()[0].platform,
        "n_shards": n_sh,
        "backend": eng.backend,
        "seg_local": eng.seg_local,
        "sim_build_s": round(t_sim, 1),
        "engine_build_s": round(t_build, 1),
        "init_cache_s": round(t_init, 1),
        "chunk_compile_s": round(t_compile, 1),
        "ms_per_step": round(per * 1e3, 3),
        "steps_per_sec": round(1.0 / per, 1),
        "pixel_hbm_mb_per_shard": round(hbm_per_shard, 1),
        "note": "sort-free sharded seg past the int32 pair-code "
        "bound; per-step work O(window), per-shard pixel HBM "
        "O(nnz/S)",
    }
    from scripts._probemeta import probe_meta

    result.update(probe_meta())
    line = json.dumps(result)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
