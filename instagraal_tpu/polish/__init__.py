"""Scaffold polishing: info_frags correction heuristics + FASTA rebuild.

Equivalent of the reference polish layer (parse_info_frags facade over
_scaffold_io/_scaffold_correct/_scaffold_viz).
"""

from .io import (  # noqa: F401
    parse_info_frags,
    parse_bed,
    format_info_frags,
    write_info_frags,
    write_fasta,
    DEFAULT_JUNCTION_SEQUENCE,
)
from .correct import (  # noqa: F401
    remove_spurious_insertions,
    correct_spurious_inversions,
    rearrange_intra_scaffolds,
    reorient_consecutive_blocks,
    find_lost_dna,
    integrate_lost_dna,
    is_block,
)
from .viz import plot_info_frags, plot_contig_composition  # noqa: F401
