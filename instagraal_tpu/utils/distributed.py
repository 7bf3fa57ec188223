"""Multi-host initialization.

The reference has no distribution at all (single CUDA context,
SURVEY.md §5.8). On a TPU pod slice, call init_distributed() once per
host before building meshes; jax.distributed wires the hosts together
and `jax.devices()` returns the global device set, so the
(chains, shards) mesh in instagraal_tpu.parallel spans the slice with
ICI inside a host and DCN between slices. Host-side stages (pre, polish,
post, file IO) should run on process 0 only — use is_coordinator().
"""

from __future__ import annotations

import os

import jax

from ..log import logger


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed, with TPU-pod auto-detection.

    On Cloud TPU pods all arguments are discovered from the metadata
    server; elsewhere they can be passed explicitly or via the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
    vars. Safe to call when already initialized (no-op).
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ[
            "JAX_COORDINATOR_ADDRESS"
        ]
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id
            if process_id is not None
            else os.environ["JAX_PROCESS_ID"]
        )
    try:
        jax.distributed.initialize(**kwargs)
        logger.info(
            "jax.distributed initialized: process %d/%d, %d global devices",
            jax.process_index(),
            jax.process_count(),
            len(jax.devices()),
        )
    except Exception as e:  # single-process runs are fine without it
        logger.debug("jax.distributed not initialized: %s", e)


def is_coordinator() -> bool:
    """True on the process that should perform host-side IO."""
    return jax.process_index() == 0
