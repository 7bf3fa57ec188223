"""Multi-resolution contact-map pyramid (HDF5-backed).

Equivalent of reference pyramid_sparse.py: builds a series of 3x-binned
fragment contact maps with a sparsity/size filter pass, persisted as text
files + one pyramid.hdf5 per pyramid for restartability.
"""

from .build import build_and_filter, build, PYRAMID_SIZE, PYRAMID_FACTOR  # noqa: F401
from .level import Pyramid, Level  # noqa: F401
