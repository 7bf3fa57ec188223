"""Algorithm driver: the EM loop, trace outputs and the public API.

Equivalent of reference instagraal.py:76-638 (`instagraal_class` /
`run_instagraal`): wires a Simulation + Sampler, runs full_em cycles,
writes per-cycle genome snapshots, trace files and the scaffolded FASTA.
"""

from __future__ import annotations

import os
import pathlib
import pickle

import numpy as np

from ..core.state import state_to_numpy
from ..log import logger
from ..utils.profiling import PhaseTimer
from .sampler import Sampler
from .setup import Simulation

DEFAULT_CYCLES = 100
DEFAULT_LEVEL = 4
DEFAULT_NEIGHBOURS = 5
DEFAULT_COVERAGE_STDS = 1
ID_START_SAMPLE_PARAM = 4  # burn-in cycles before nuisance sampling


class Scaffolder:
    """Owns the simulation + sampler and the behaviour traces."""

    TRACE_NAMES = [
        "mean_len",
        "n_contigs",
        "dist_init_genome",
        "likelihood",
        "fact",
        "slope",
        "d_max",
        "d_nuc",
        "d",
        "success",
    ]

    def __init__(
        self,
        name: str,
        folder_path,
        fasta,
        level: int = DEFAULT_LEVEL,
        output_folder=None,
        thresh_factor: float = DEFAULT_COVERAGE_STDS,
        n_neighbours: int = DEFAULT_NEIGHBOURS,
        seed: int | None = 0,
        circular: bool = False,
        size_pyramid: int | None = None,
        sample_param: bool = True,
        engine: str = "scan",
        slice_capacity=None,
        chains: int = 1,
        shard_nnz: bool = False,
        steps_per_call: int | str | None = "auto",
        exchange_every: int = 0,
        exchange_thresh: float = 0.0,
    ):
        """slice_capacity: int, "auto", or None (nnz // 8 default) —
        forwarded to SweepEngine; see suggest_slice_capacity.

        shard_nnz: shard the contact matrix's COO pixel arrays across
        the mesh's "shards" axis (scan engine): per-chip HBM scales as
        nnz / n_shards and every pixel reduction merges through psum
        — the layout for genomes whose fine-level contact maps exceed
        one chip (SURVEY.md §5.8). Composes with chains > 1: devices
        form a (chains, shards) mesh where each chains-row holds one
        chain and each shards-column one pixel slice.

        chains: number of independent MCMC chains run data-parallel on
        device (scan engine only). Chains share the initial genome but
        explore with independent PRNG streams and nuisance parameters;
        every cycle logs per-chain likelihoods and the final export
        takes the best chain (SURVEY.md §2.3 north star). When the
        JAX device count is divisible by `chains`, chains are sharded
        across a device mesh; otherwise they run batched on one chip.

        exchange_every: with chains > 1, every N cycles re-seed chains
        whose likelihood trails the best chain by more than
        exchange_thresh log-units from the best chain's genome and
        parameters (elitist exchange; PRNG streams stay per-chain so
        re-seeded chains diverge again immediately). 0 = independent
        chains. Measured: independent chains buy only 1.0-1.9x
        cycles-to-target at C=8 (docs/tts_yeast_l4.json) — exchange
        is the lever beyond that.

        steps_per_call: "auto" (default) splits fine-level cycles into
        device calls of <=1024 sweep steps — bit-identical results,
        bounded per-call wall time (some TPU transports kill single
        executions past ~60 s) — calibrated against a timed probe
        chunk on the first TPU cycle so the sizing tracks the actual
        hardware, not just the built-in cost model ("model" keeps the
        model alone). An int overrides; None forces the whole cycle
        into one call."""
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        kw = {}
        if size_pyramid is not None:
            kw["size_pyramid"] = size_pyramid
        self.simulation = Simulation(
            name,
            folder_path,
            fasta,
            level,
            output_folder=output_folder,
            thresh_factor=thresh_factor,
            circular=circular,
            **kw,
        )
        params = self.simulation.estimate_parameters_rippe()
        self.sampler = Sampler(
            self.simulation, params, n_neighbours=n_neighbours, seed=seed
        )
        self.sampler.eval_likelihood()
        self.engine = engine
        self.slice_capacity = slice_capacity
        self.seed = seed if seed is not None else 0
        self._sweep_engine = None  # built lazily (jit compile cost)
        self.sample_param = sample_param
        self.chains = int(chains)
        self.shard_nnz = bool(shard_nnz)
        self.steps_per_call = steps_per_call
        self.exchange_every = int(exchange_every)
        self.exchange_thresh = float(exchange_thresh)
        if self.chains > 1 and engine != "scan":
            raise ValueError("chains > 1 requires the scan engine")
        if self.shard_nnz and engine != "scan":
            raise ValueError("shard_nnz requires the scan engine")
        self.collect: dict[str, list] = {k: [] for k in self.TRACE_NAMES}
        self.collect_mutations: list[tuple[int, int, int]] = []
        # first-class profiling (SURVEY.md §5.1): every EM loop
        # accumulates per-phase wall time here and logs a report at the
        # end of full_em; bench.py prints the same breakdown.
        self.timer = PhaseTimer()
        self.out = self.simulation.output_folder

    # ------------------------------------------------------------------
    def full_em(
        self,
        n_cycles: int,
        n_neighbours: int | None = None,
        bomb: bool = False,
        id_start_sample_param: int = ID_START_SAMPLE_PARAM,
        save_matrix: bool = False,
        resume: bool = False,
    ) -> None:
        """The live optimization loop (reference instagraal.py:196-289).

        engine="scan" (default) runs each cycle as one on-device lax.scan
        over every fragment; engine="host" mirrors the reference's
        host-driven per-step loop (useful for debugging / step-level
        introspection). resume=True continues from <out>/checkpoint.pkl.
        """
        if self.engine == "scan":
            if self.chains > 1:
                return self._full_em_scan_chains(
                    n_cycles, bomb, id_start_sample_param, save_matrix,
                    resume=resume,
                )
            return self._full_em_scan(
                n_cycles, bomb, id_start_sample_param, save_matrix,
                resume=resume,
            )
        sampler = self.sampler
        if bomb:
            sampler.bomb_the_genome()
        list_frags = np.arange(sampler.n_frags)
        for j in range(n_cycles):
            sampler.rng.shuffle(list_frags)
            logger.info("cycle = %d", j)
            for count, id_frag in enumerate(list_frags):
                if count and count % 100 == 0:
                    logger.info(
                        "cycle %d: %.0f%% processed",
                        j,
                        100.0 * count / len(list_frags),
                    )
                with self.timer.phase("step"):
                    o, dist, op, id_fB, mean_len, n_contigs = (
                        sampler.step_sampler(int(id_frag), n_neighbours)
                    )
                self.collect["likelihood"].append(o)
                self.collect["n_contigs"].append(n_contigs)
                self.collect["mean_len"].append(mean_len)
                self.collect["dist_init_genome"].append(dist)
                self.collect_mutations.append((int(id_frag), id_fB, op))
                if self.sample_param and j > id_start_sample_param:
                    with self.timer.phase("nuisance"):
                        fact, d, d_max, d_nuc, slope, ll, success = (
                            sampler.step_nuisance_parameters()
                        )
                    self.collect["fact"].append(fact)
                    self.collect["d"].append(d)
                    self.collect["d_max"].append(d_max)
                    self.collect["d_nuc"].append(d_nuc)
                    self.collect["slope"].append(slope)
                    self.collect["success"].append(success)
            with self.timer.phase("cycle_outputs"):
                self._write_cycle_outputs(j, save_matrix)
        self.save_behaviour_to_txt()
        self.timer.report()

    def _full_em_scan(
        self,
        n_cycles: int,
        bomb: bool,
        id_start_sample_param: int,
        save_matrix: bool,
        resume: bool = False,
    ) -> None:
        """Scan-engine EM loop: one device call per cycle, checkpointed."""
        import jax

        from . import checkpoint as ckpt
        from .device_sweep import SweepEngine

        sampler = self.sampler
        ckpt_path = self.out / ckpt.CHECKPOINT_NAME
        start_cycle = 0
        if resume and ckpt_path.exists():
            payload = ckpt.load_checkpoint(ckpt_path)
            sampler.state = payload["state"]
            sampler.params = payload["params"]
            sampler.rng = ckpt.restore_rng(payload["rng_state"])
            self.collect = payload["collect"]
            self.collect_mutations = payload["mutations"]
            start_cycle = payload["cycle"]
            key = jax.numpy.asarray(payload["prng_key"])
            ll_restored = payload["likelihood"]
            logger.info("resumed from checkpoint at cycle %d", start_cycle)
            bomb = False
        else:
            key = jax.random.PRNGKey(self.seed)
            ll_restored = None
        if bomb:
            sampler.bomb_the_genome()
        if self._sweep_engine is None:
            kw = {}
            if self.shard_nnz:
                from ..parallel.mesh import make_mesh

                # honored even on one device: the 1-device shard_map
                # graph is the exact per-shard program a pod runs
                # (measured at parity with the replicated engine —
                # docs/seg_shard_probe.json resolution_r5)
                kw = {"mesh": make_mesh(chains=1), "shard_nnz": True}
                logger.info(
                    "contact matrix sharded over %d device(s)",
                    len(jax.devices()),
                )
            with self.timer.phase("engine_build"):
                slice_cap = self.slice_capacity
                if slice_cap == "probe":
                    # measure the seg tier-1 capacity on the running
                    # device and use the winner (VERDICT r3 #7); only
                    # meaningful when the workload resolves to seg
                    trial = SweepEngine(
                        self.simulation,
                        n_neighbours=sampler.n_neighbours,
                        sample_param=self.sample_param,
                        steps_per_call=self.steps_per_call,
                        **kw,
                    )
                    if trial.backend == "seg":
                        table = SweepEngine.probe_seg_capacity(
                            self.simulation, sampler.state,
                            params=sampler.params, log=logger.info,
                        )
                        logger.info(
                            "seg capacity probe picked %d "
                            "(%.3f us/unit)", table["best_cap"],
                            table["us_per_capacity_unit"],
                        )
                        slice_cap = int(table["best_cap"])
                    else:
                        logger.info(
                            "--slice-cap probe: backend resolved to "
                            "%s, probe skipped", trial.backend,
                        )
                        slice_cap = None
                self._sweep_engine = SweepEngine(
                    self.simulation,
                    n_neighbours=sampler.n_neighbours,
                    sample_param=self.sample_param,
                    slice_capacity=slice_cap,
                    steps_per_call=self.steps_per_call,
                    **kw,
                )
        engine = self._sweep_engine
        state = sampler.state
        params = sampler.params
        ll = (
            ll_restored
            if ll_restored is not None
            else engine.initial_ll(state, params)
        )
        for j in range(start_cycle, n_cycles):
            logger.info("cycle = %d (scan engine)", j)
            key, sub = jax.random.split(key)
            do_nuis = self.sample_param and j > id_start_sample_param
            with self.timer.phase("cycle_device"):
                state, params, ll, traces = engine.run_cycle(
                    state, params, ll, sub, sample_param=do_nuis
                )
            self.collect["likelihood"].extend(
                traces["likelihood"].tolist()
            )
            self.collect["n_contigs"].extend(traces["n_contigs"].tolist())
            self.collect["mean_len"].extend(traces["mean_len"].tolist())
            self.collect["fact"].extend(traces["fact"].tolist())
            self.collect["slope"].extend(traces["slope"].tolist())
            self.collect["d_max"].extend(traces["d_max"].tolist())
            self.collect["d_nuc"].extend(traces["d_nuc"].tolist())
            self.collect["d"].extend(traces["d"].tolist())
            self.collect["success"].extend(
                traces["success"].astype(int).tolist()
            )
            for a, b, m in zip(
                traces["id_fA"], traces["id_fB"], traces["op"]
            ):
                self.collect_mutations.append((int(a), int(b), int(m)))
            sampler.state = state
            self.collect["dist_init_genome"].extend(
                traces["dist_init_genome"].tolist()
            )
            n_over = int(traces["slice_overflow"].sum())
            if n_over:
                logger.info(
                    "cycle %d: %d candidate slices exceeded capacity %d "
                    "(max seen %d) — %s",
                    j, n_over,
                    engine.block_capacity
                    if engine.backend == "block"
                    else engine.slice_capacity,
                    int(traces["slice_max"].max()),
                    "re-scored exactly" if engine.exact_overflow
                    else "scores truncated",
                )
            sampler.params = type(params)(
                *[float(v) for v in jax.tree.leaves(params)]
            )
            sampler.likelihood_t = ll
            sampler.n_contigs = int(traces["n_contigs"][-1])
            sampler.mean_length_contigs = float(traces["mean_len"][-1])
            with self.timer.phase("cycle_outputs"):
                self._write_cycle_outputs(j, save_matrix)
            with self.timer.phase("checkpoint"):
                ckpt.save_checkpoint(
                    ckpt_path,
                    state,
                    sampler.params,
                    j + 1,
                    sampler.rng,
                    key,
                    self.collect,
                    self.collect_mutations,
                    ll,
                )
        self.save_behaviour_to_txt()
        self.timer.report()

    def _full_em_scan_chains(
        self,
        n_cycles: int,
        bomb: bool,
        id_start_sample_param: int,
        save_matrix: bool,
        resume: bool = False,
    ) -> None:
        """Multi-chain scan EM loop (BASELINE north star: independent
        MCMC chains run data-parallel on device).

        All C chains advance one full cycle per device call; every
        cycle logs the per-chain likelihoods and writes the current
        best chain's outputs; the final export takes the best chain's
        genome, parameters and traces. With a divisible device count
        the chains are sharded across a ("chains",) mesh axis,
        otherwise they run batched on one chip.
        """
        import jax
        import jax.numpy as jnp

        from . import checkpoint as ckpt
        from .device_sweep import MultiChainSweep, SweepEngine

        sampler = self.sampler
        C = self.chains
        ckpt_path = self.out / ckpt.CHECKPOINT_NAME
        n_dev = len(jax.devices())
        mesh = None
        engine_kw = {}
        if n_dev > 1:
            from ..parallel.mesh import make_mesh

            if self.shard_nnz:
                # chains x pixel shards on one 2-D mesh (BASELINE
                # config #5 layout). When the chain count does not
                # divide the device count, keep the pixels sharded
                # over every device (the reason --shard-nnz exists)
                # and batch the chains locally inside the shard_map.
                c_axis = C if n_dev % C == 0 else 1
                mesh = make_mesh(chains=c_axis)
                engine_kw = {"mesh": mesh, "shard_nnz": True}
                logger.info(
                    "mesh %s, nnz sharded%s", dict(mesh.shape),
                    "" if c_axis == C
                    else f"; {C} chains batched per chains-row",
                )
            elif n_dev % C == 0 and n_dev > C:
                # fill the whole machine by default: a (C, n_dev/C)
                # mesh where each chains-row holds one chain and its
                # shards-columns split that chain's contact matrix —
                # a bare (C, 1) layout would idle n_dev - C chips
                mesh = make_mesh(chains=C)
                engine_kw = {"mesh": mesh, "shard_nnz": True}
                logger.info(
                    "mesh %s: %d chains x %d pixel shards per chain "
                    "— every device holds one chain replica and one "
                    "pixel shard",
                    dict(mesh.shape), C, n_dev // C,
                )
            elif n_dev == C:
                # one chain per device on a (C, 1) mesh
                mesh = make_mesh(n_devices=C, chains=C)
                logger.info(
                    "chains sharded over mesh %s", dict(mesh.shape)
                )
            elif C % n_dev == 0:
                # more chains than devices: C/n_dev chains batched on
                # each device of a (n_dev, 1) mesh — still full
                mesh = make_mesh(chains=n_dev)
                logger.info(
                    "mesh %s: %d chains batched per device",
                    dict(mesh.shape), C // n_dev,
                )
            else:
                raise ValueError(
                    f"--chains {C} neither divides nor is divisible "
                    f"by the {n_dev} visible devices — part of the "
                    f"machine would sit idle or chains would silently "
                    f"serialize; pick a chain count that divides "
                    f"{n_dev} (or a multiple of it), or pass "
                    f"--shard-nnz to keep the contact matrix sharded "
                    f"over all devices with the chains batched locally"
                )
        elif self.shard_nnz:
            # one device: still run the shard_map graph (chains
            # batched locally on the single shard) — it is the exact
            # per-shard program a pod runs, at measured parity with
            # the replicated engine (docs/seg_shard_probe.json)
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(chains=1)
            engine_kw = {"mesh": mesh, "shard_nnz": True}
            logger.info(
                "single device: nnz shard_map with %d chains batched "
                "locally", C,
            )
        if self._sweep_engine is None:
            with self.timer.phase("engine_build"):
                self._sweep_engine = SweepEngine(
                    self.simulation,
                    n_neighbours=sampler.n_neighbours,
                    sample_param=self.sample_param,
                    slice_capacity=self.slice_capacity,
                    steps_per_call=self.steps_per_call,
                    **engine_kw,
                )
        engine = self._sweep_engine
        ms = MultiChainSweep(
            engine,
            mesh=None if engine.shard_nnz else mesh,
            n_chains=C,
        )

        start_cycle = 0
        collect_chains = None
        if resume and ckpt_path.exists():
            payload = ckpt.load_checkpoint(ckpt_path)
            if (
                payload.get("version") == ckpt.MULTI_FORMAT_VERSION
                and len(payload["states"]) == C
            ):
                states = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *payload["states"]
                )
                if ms._sharding is not None:
                    states = ms._put(states)
                params_all = payload["params_all"]
                lls = np.asarray(payload["likelihoods"])
                sampler.rng = ckpt.restore_rng(payload["rng_state"])
                key = jnp.asarray(payload["prng_key"])
                collect_chains = payload["collect_chains"]
                mutations_chains = payload["mutations_chains"]
                start_cycle = payload["cycle"]
                logger.info(
                    "resumed %d chains from checkpoint at cycle %d",
                    C, start_cycle,
                )
                bomb = False
            else:
                logger.warning(
                    "checkpoint incompatible with %d chains; "
                    "starting fresh", C,
                )
        if collect_chains is None:
            key = jax.random.PRNGKey(self.seed)
            if bomb:
                sampler.bomb_the_genome()
            states = ms.broadcast_state(sampler.state)
            params_all = ms.broadcast_params(sampler.params)
            ll0 = engine.initial_ll(sampler.state, sampler.params)
            lls = np.full(C, ll0, dtype=np.float64)
            collect_chains = [
                {k: [] for k in self.TRACE_NAMES} for _ in range(C)
            ]
            mutations_chains = [[] for _ in range(C)]

        for j in range(start_cycle, n_cycles):
            key, sub = jax.random.split(key)
            do_nuis = self.sample_param and j > id_start_sample_param
            with self.timer.phase("cycle_device"):
                states, params_all, lls, traces = ms.run_cycle(
                    states, params_all, lls, sub, sample_param=do_nuis
                )
            best_c = int(np.argmax(lls))
            logger.info(
                "cycle = %d (scan engine, %d chains): ll %s, best %d",
                j, C,
                np.array2string(np.asarray(lls), precision=0),
                best_c,
            )
            for c in range(C):
                col = collect_chains[c]
                for name in (
                    "likelihood", "n_contigs", "mean_len", "fact",
                    "slope", "d_max", "d_nuc", "d", "dist_init_genome",
                ):
                    col[name].extend(traces[name][c].tolist())
                col["success"].extend(
                    traces["success"][c].astype(int).tolist()
                )
                for a, b, m in zip(
                    traces["id_fA"][c], traces["id_fB"][c],
                    traces["op"][c],
                ):
                    mutations_chains[c].append(
                        (int(a), int(b), int(m))
                    )
            # per-cycle outputs follow the current best chain
            sampler.state = jax.tree.map(lambda a: a[best_c], states)
            sampler.likelihood_t = float(lls[best_c])
            sampler.n_contigs = int(traces["n_contigs"][best_c][-1])
            sampler.mean_length_contigs = float(
                traces["mean_len"][best_c][-1]
            )
            if (
                self.exchange_every
                and (j + 1) % self.exchange_every == 0
            ):
                states, params_all, lls, n_re = ms.restart_from_best(
                    states, params_all, lls, self.exchange_thresh
                )
                if n_re:
                    logger.info(
                        "cycle %d: exchange re-seeded %d/%d chains "
                        "from chain %d (thresh %.1f)",
                        j, n_re, C, best_c, self.exchange_thresh,
                    )
            self.collect = collect_chains[best_c]
            self.collect_mutations = mutations_chains[best_c]
            with self.timer.phase("cycle_outputs"):
                self._write_cycle_outputs(j, save_matrix)
            with self.timer.phase("checkpoint"):
                ckpt.save_checkpoint_multi(
                    ckpt_path, states, params_all, j + 1, sampler.rng,
                    key, collect_chains, mutations_chains, lls,
                )

        best_c = int(np.argmax(lls))
        sampler.state = jax.tree.map(lambda a: a[best_c], states)
        sampler.params = type(sampler.params)(
            *[float(np.asarray(v)[best_c]) for v in params_all]
        )
        sampler.likelihood_t = float(lls[best_c])
        self.collect = collect_chains[best_c]
        self.collect_mutations = mutations_chains[best_c]
        self.save_behaviour_to_txt()
        with open(self.out / "list_chain_likelihoods.txt", "w") as fh:
            fh.write("chain\tlikelihood\tbest\n")
            for c, v in enumerate(np.asarray(lls)):
                fh.write(f"{c}\t{v}\t{int(c == best_c)}\n")
        self.timer.report()

    def replay_mutations(self, mutations_file) -> None:
        """Re-apply a recorded list_mutations.txt onto the current state
        (equivalent of the reference's apply_replay_simu helper,
        cuda_lib_gl_single.py:2546-2553)."""
        import numpy as _np

        data = _np.loadtxt(mutations_file, skiprows=1, dtype=_np.int64)
        if data.ndim == 1:
            data = data[None, :]
        sampler = self.sampler
        for id_fA, id_fB, op in data:
            state, n_contigs, _ = sampler._renumber(sampler.state)
            sampler.state = sampler._apply(
                state,
                np.int32(id_fA),
                np.int32(id_fB),
                np.int32(op),
                np.int32(int(n_contigs) - 1),
            )

    def _write_cycle_outputs(self, j: int, save_matrix: bool) -> None:
        s = state_to_numpy(self.sampler.state)
        snap = self.out / f"save_simu_step_{j}.txt"
        try:
            with open(snap, "w") as fh:
                for pos, start_bp, id_c, ori in zip(
                    s["pos"], s["start_bp"], s["id_c"], s["ori"]
                ):
                    fh.write(f"{pos}\t{start_bp}\t{id_c}\t{ori}\n")
            self.simulation.export_new_fasta(self.sampler.state)
            self.save_behaviour_to_txt()
        except OSError as e:
            logger.warning("could not write outputs at cycle %d: %s", j, e)
        if save_matrix:
            try:
                self.display_current_matrix(
                    self.out / f"matrix_cycle_{j}.png"
                )
            except OSError as e:
                logger.warning("could not write matrix at %d: %s", j, e)

    def save_behaviour_to_txt(self) -> None:
        """Write the list_*.txt traces (reference instagraal.py:291-330)."""
        for name in self.TRACE_NAMES:
            with open(self.out / f"list_{name}.txt", "w") as fh:
                for item in self.collect[name]:
                    fh.write(f"{item}\n")
        with open(self.out / "list_mutations.txt", "w") as fh:
            fh.write("id_fA\tid_fB\tid_mutation\n")
            for a, b, m in self.collect_mutations:
                fh.write(f"{a}\t{b}\t{m}\n")

    def display_current_matrix(self, filename) -> None:
        """Render the contact map reordered by the current genome
        (reference cuda_lib_gl_single.py:2555-2606), sparse-safe."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        s = state_to_numpy(self.sampler.state)
        order = []
        frag_of_sub = np.asarray(self.simulation.sub_index.frag_of_sub)
        for cid in np.unique(s["id_c"]):
            members = np.flatnonzero(s["id_c"] == cid)
            if not (s["activ"][members] == 1).all():
                continue
            for f in members[np.argsort(s["pos"][members])]:
                subs = np.flatnonzero(frag_of_sub == s["id_d"][f])
                if s["ori"][f] == -1:
                    subs = subs[::-1]
                order.extend(subs.tolist())
        order = np.array(order)
        sub_csr = self.simulation.sub_level.sparse_mat_csr
        sym = (sub_csr + sub_csr.T).tocsr()
        mat = sym[order, :][:, order].toarray()
        fig, ax = plt.subplots(figsize=(14, 14))
        vmax = np.percentile(mat, 99) if mat.size else 1
        ax.imshow(mat, vmax=max(vmax, 1), interpolation="nearest")
        ax.axis("off")
        fig.savefig(filename, dpi=100, bbox_inches="tight")
        plt.close(fig)

    def plot_behaviour(self) -> None:
        """Write the behaviour_*.pdf trace plots (reference
        simu_single.py:741-778 plot_info_simu + instagraal.py:369-407)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ll = np.asarray(self.collect["likelihood"], dtype=float)
        panels = [
            ("n_contigs", "n_contigs"),
            ("mean_len", "mean length contigs"),
            ("dist_init_genome", "distance from init genome"),
            ("slope", "slope"),
            ("fact", "scale factor"),
            ("d_nuc", "val trans"),
            ("d_max", "max intra distance"),
        ]
        for name, title in panels:
            series = np.asarray(self.collect[name], dtype=float)
            if series.size == 0:
                continue
            fig = plt.figure(figsize=(10, 6), dpi=100)
            ax1 = fig.add_subplot(111)
            n = min(len(ll), len(series))
            lo = 1000 if n > 1000 else 0
            ax1.plot(ll[lo:n], "r-")
            ax1.set_xlabel("iterations")
            ax1.set_ylabel("likelihood", color="r")
            ax2 = ax1.twinx()
            ax2.plot(series[lo:n], "b-")
            ax2.set_ylabel(title, color="b")
            fig.savefig(self.out / f"behaviour_{name}.pdf")
            plt.close(fig)

    def save_pickle(self, path="graal.pkl") -> None:
        data = {
            "state": state_to_numpy(self.sampler.state),
            "params": self.sampler.params.to_numpy(),
            "collect": self.collect,
            "mutations": self.collect_mutations,
        }
        with open(path, "wb") as fh:
            pickle.dump(data, fh)


def run_instagraal(
    hic_folder,
    reference_fa,
    output_folder=None,
    level: int = DEFAULT_LEVEL,
    cycles: int = DEFAULT_CYCLES,
    coverage_std: float = DEFAULT_COVERAGE_STDS,
    neighborhood: int = DEFAULT_NEIGHBOURS,
    device: int = 0,
    circular: bool = False,
    bomb: bool = False,
    pyramid_only: bool = False,
    save_pickle: bool = False,
    save_matrix: bool = False,
    simple: bool = False,
    seed: int | None = 0,
    resume: bool = False,
    slice_capacity=None,
    chains: int = 1,
    shard_nnz: bool = False,
    steps_per_call: int | str | None = "auto",
    exchange_every: int = 0,
    exchange_thresh: float = 0.0,
    profile=None,
) -> None:
    """Run the scaffolding pipeline (reference instagraal.py:502-638).

    `device` and `simple` are accepted for CLI compatibility; device
    selection is handled by JAX and the reference's --simple mode calls
    sampler methods that never existed (dead code, SURVEY.md §7.3).

    profile: directory to dump a jax.profiler (XLA/TPU) trace of the
    EM loop into, viewable in XProf/TensorBoard; per-phase wall-time
    totals are logged at the end of every run regardless.
    """
    name = os.path.basename(os.path.normpath(str(hic_folder)))
    if pyramid_only:
        from ..pyramid import build_and_filter

        out_root = pathlib.Path(output_folder or "results")
        build_and_filter(
            hic_folder,
            thresh_factor=coverage_std,
            output_folder=out_root,
        )
        return

    scaf = Scaffolder(
        name,
        hic_folder,
        reference_fa,
        level=level,
        output_folder=output_folder,
        thresh_factor=coverage_std,
        n_neighbours=neighborhood,
        seed=seed,
        circular=circular,
        slice_capacity=slice_capacity,
        chains=chains,
        shard_nnz=shard_nnz,
        steps_per_call=steps_per_call,
        exchange_every=exchange_every,
        exchange_thresh=exchange_thresh,
    )
    import contextlib

    from ..utils.profiling import trace_to

    with trace_to(str(profile)) if profile else contextlib.nullcontext():
        scaf.full_em(
            n_cycles=cycles,
            n_neighbours=neighborhood,
            bomb=bomb,
            save_matrix=save_matrix,
            resume=resume,
        )

    from ..stats import print_assembly_stats

    print_assembly_stats(scaf.simulation.new_fasta, label="Scaffolded assembly")
    try:
        scaf.plot_behaviour()
    except Exception as e:  # plots are best-effort
        logger.warning("behaviour plots failed: %s", e)
    if save_pickle:
        scaf.save_pickle()
    return scaf
