"""MCMC scaffolding sampler.

TPU re-design of the reference's GPU sampler (cuda_lib_gl_single.py) and
simulation orchestrator (simu_single.py): genome state lives on device as
a FragState pytree, all <=24 x n_candidates mutation scores of a sweep
step are evaluated in one batched jitted computation, and the EM driver
(driver.py) reproduces the reference's full_em loop and outputs.
"""

from .setup import Simulation  # noqa: F401
from .sampler import Sampler  # noqa: F401
from .device_sweep import (  # noqa: F401
    MultiChainSweep,
    SweepEngine,
    suggest_slice_capacity,
)
from .driver import Scaffolder, run_instagraal  # noqa: F401
