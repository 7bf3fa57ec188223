"""Shared fixtures.

JAX is forced onto a virtual 8-device CPU mesh so that multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §7 build plan item 7).
Set INSTAGRAAL_TPU_REAL_DEVICE=1 to run the suite on the real backend.
"""

import os

if not os.environ.get("INSTAGRAAL_TPU_REAL_DEVICE"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # this environment pre-sets jax_platforms to "axon,cpu" (TPU wins),
    # so the env var alone is not enough — force via the config API.
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: virtual-mesh compiles dominate the suite's
# wall time (~35 min cold), and XLA:CPU executables cache fine — a warm
# re-run skips them. Mesh-shape differences are captured via the compile
# options in the cache key (device assignment / num_partitions), so the
# 8-device entries don't collide with single-device ones.
import pathlib as _pathlib

import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    str(_pathlib.Path(__file__).resolve().parents[1] / ".jax_test_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

TESTS_DIR = pathlib.Path(__file__).parent
DATA_DIR = TESTS_DIR / "data"
YEAST_CONTIGS = pathlib.Path("/root/reference/tests/data/yeast.contigs.fa.gz")


@pytest.fixture(scope="session")
def toy_assembly(tmp_path_factory):
    """Small random assembly + simulated pairs; fast enough for every run."""
    from instagraal_tpu.testing import make_toy_genome, simulate_pairs

    root = tmp_path_factory.mktemp("toy")
    fasta = root / "toy.contigs.fa.gz"
    pairs = root / "toy.pairs.gz"
    make_toy_genome(fasta)
    simulate_pairs(fasta, pairs, n_pairs=150_000, seed=11)
    return {"fasta": fasta, "pairs": pairs, "root": root}


@pytest.fixture(scope="session")
def toy_pre(toy_assembly, tmp_path_factory):
    """Run instagraal-pre once on the toy assembly."""
    from instagraal_tpu.pre import run_pre

    out = tmp_path_factory.mktemp("toy_pre")
    stats = run_pre(
        toy_assembly["fasta"],
        toy_assembly["pairs"],
        ["DpnII"],
        out,
        plot=False,
    )
    return {"dir": out, "stats": stats, **toy_assembly}
