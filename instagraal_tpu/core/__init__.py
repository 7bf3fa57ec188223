"""Genome-state core: the fragment struct-of-arrays and its mutation
operators, as pure JAX functions.

The reference keeps genome state in a CUDA struct of 17 int32 device
arrays and mutates it with ~3000 lines of per-thread bookkeeping kernels
(reference kernels/kernel_sparse_adapt.cu). Here the state is an immutable
pytree and every mutation is a pure, fully-vectorized function
``state -> state`` built from masked where-updates, so candidate mutations
can be batched with vmap/stacking and the whole sweep can live inside a
single jit.
"""

from .state import FragState, state_from_soa, state_to_numpy  # noqa: F401
from . import ops  # noqa: F401
