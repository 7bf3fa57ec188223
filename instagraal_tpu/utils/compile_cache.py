"""Persistent XLA compile cache for the production driver.

Fine-level engines cost minutes of XLA compile before the first step
(measured 173 s chunk compile at 200k fragments,
docs/large_scale_probe.json) — pure waste when the same shapes are
re-run, which is exactly what checkpoint/resume, multi-stage pyramid
descents and repeated production jobs do. JAX ships a persistent
compilation cache keyed on the computation + compile options; wiring
it means the second run of any shape deserializes its executables in
seconds instead of recompiling.

The reference has no equivalent (CUDA kernels are precompiled; its
per-run setup cost lives elsewhere) — this is TPU-framework
infrastructure the XLA compilation model makes necessary.

Enabled automatically by the Scaffolder/CLI entry points; opt out
with INSTAGRAAL_TPU_COMPILE_CACHE=0, relocate with
INSTAGRAAL_TPU_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os
import pathlib

from ..log import logger

_DEFAULT = "~/.cache/instagraal_tpu/xla"
_enabled: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Idempotent; returns the cache dir in effect (None if disabled).
    Explicit JAX_COMPILATION_CACHE_DIR in the environment wins — the
    user already chose a location and jax read it at import.
    """
    global _enabled
    if _enabled is not None:
        return _enabled
    env = os.environ.get("INSTAGRAAL_TPU_COMPILE_CACHE", "")
    if env == "0":
        return None
    import jax

    pre_set = os.environ.get("JAX_COMPILATION_CACHE_DIR") or (
        jax.config.jax_compilation_cache_dir
    )
    if pre_set:
        _enabled = str(pre_set)
        return _enabled
    target = pathlib.Path(
        cache_dir or env or _DEFAULT
    ).expanduser()
    try:
        target.mkdir(parents=True, exist_ok=True)
    except OSError as e:  # pragma: no cover - degraded filesystems
        logger.warning("compile cache disabled (%s)", e)
        return None
    jax.config.update("jax_compilation_cache_dir", str(target))
    # executables worth persisting are the multi-second engine
    # compiles, not trivial host utilities
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    logger.info("persistent XLA compile cache: %s", target)
    _enabled = str(target)
    return _enabled
