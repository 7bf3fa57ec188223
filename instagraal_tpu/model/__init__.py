"""Probabilistic model: polymer contact curve + Poisson likelihood.

JAX re-design of the reference's likelihood CUDA kernels
(kernel_sparse_adapt.cu:153-270, :3850-4488) and the scipy parameter
fitting (optim_rippe_curve_update.py).
"""

from .rippe import RippeParams, rippe_contacts, rippe_contacts_circ  # noqa: F401
from .likelihood import (  # noqa: F401
    SubVectors,
    log10_poisson,
    nz_log_likelihood,
    zeros_log_likelihood,
    genome_log_likelihood,
)
from .fit import estimate_param_rippe, estimate_max_dist_intra  # noqa: F401
