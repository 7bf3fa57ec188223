"""Device platform selection for CLI entry points.

Some PJRT plugins override ``JAX_PLATFORMS`` during their registration
hook, so exporting the env var is silently ignored — only the config
API is authoritative. Every console script calls
:func:`apply_platform_env` before its first JAX computation so that

    INSTAGRAAL_TPU_PLATFORM=cpu instagraal-test ...

reliably pins the backend (e.g. to keep working when a tunneled TPU
backend is temporarily unavailable, or to force CPU for debugging).
"""

from __future__ import annotations

import os


def apply_platform_env() -> str | None:
    """Pin jax_platforms from $INSTAGRAAL_TPU_PLATFORM if set.

    Returns the applied platform string, or None if unset. Safe to
    call multiple times; must run before the first JAX computation.
    """
    value = os.environ.get("INSTAGRAAL_TPU_PLATFORM")
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    return value or None
