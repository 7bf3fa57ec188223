"""Utilities: profiling, timers, distributed initialization."""

from .profiling import PhaseTimer, trace_to  # noqa: F401
from .distributed import init_distributed, is_coordinator  # noqa: F401
