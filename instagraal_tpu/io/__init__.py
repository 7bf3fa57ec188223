"""Host-side data layer: FASTA, restriction digest, pairs parsing, text
formats, and .cool output.

Everything here is pure CPU/NumPy code — no JAX. It reproduces the file
formats of the reference implementation (see instagraal_tpu.io.formats)
so that downstream tooling built for instaGRAAL keeps working.
"""

from .fasta import read_fasta, write_fasta, revcomp  # noqa: F401
from .digest import digest_genome, ENZYMES  # noqa: F401
from .pairs import pairs_to_pixels, read_pairs_header  # noqa: F401
from . import formats  # noqa: F401
from .cool import write_cool, read_cool_pixels  # noqa: F401
