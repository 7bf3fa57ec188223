"""Restriction digest of a genome, no Biopython.

Replaces the reference's Bio.Restriction usage (reference pre.py:48-99).
Recognition sites are matched on the forward strand with IUPAC wildcards;
all the enzymes in the table below have palindromic recognition sequences,
for which forward-strand matching is equivalent to Biopython's behaviour.

Cut positions follow Biopython convention: the 0-based cut offset within
the recognition site is where the 5' strand is cleaved, so the 0-based
genomic cut coordinate is ``match_start + cut_offset``. The reference
converts Biopython's 1-based ``search()`` output by subtracting 1
(reference pre.py:84-87); we produce the same 0-based coordinates directly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# name -> (recognition site in IUPAC, 5' cut offset within site)
ENZYMES: dict[str, tuple[str, int]] = {
    # 4-cutters commonly used in Hi-C
    "DpnII": ("GATC", 0),
    "MboI": ("GATC", 0),
    "Sau3AI": ("GATC", 0),
    "HinfI": ("GANTC", 1),
    "MluCI": ("AATT", 0),
    "NlaIII": ("CATG", 4),
    "HpaII": ("CCGG", 1),
    "MspI": ("CCGG", 1),
    "AluI": ("AGCT", 2),
    "HaeIII": ("GGCC", 2),
    "RsaI": ("GTAC", 2),
    "CviQI": ("GTAC", 1),
    "TaqI": ("TCGA", 1),
    "Csp6I": ("GTAC", 1),
    "DdeI": ("CTNAG", 1),
    "FatI": ("CATG", 0),
    # 6-cutters
    "HindIII": ("AAGCTT", 1),
    "EcoRI": ("GAATTC", 1),
    "BamHI": ("GGATCC", 1),
    "NcoI": ("CCATGG", 1),
    "BglII": ("AGATCT", 1),
    "XbaI": ("TCTAGA", 1),
    "PstI": ("CTGCAG", 5),
    "SacI": ("GAGCTC", 5),
    "KpnI": ("GGTACC", 5),
    "ApoI": ("RAATTY", 1),
    "AseI": ("ATTAAT", 2),
    "NdeI": ("CATATG", 2),
    "DraI": ("TTTAAA", 3),
    "ScaI": ("AGTACT", 3),
    "SspI": ("AATATT", 3),
    "PvuII": ("CAGCTG", 3),
    "StuI": ("AGGCCT", 3),
    "EcoRV": ("GATATC", 3),
    "NheI": ("GCTAGC", 1),
    "SpeI": ("ACTAGT", 1),
    "AvrII": ("CCTAGG", 1),
    "NsiI": ("ATGCAT", 5),
    "SphI": ("GCATGC", 5),
    # Arima kit = DpnII + HinfI handled by passing both names
}

_IUPAC = {
    "A": "A", "C": "C", "G": "G", "T": "T",
    "R": "[AG]", "Y": "[CT]", "S": "[CG]", "W": "[AT]",
    "K": "[GT]", "M": "[AC]",
    "B": "[CGT]", "D": "[AGT]", "H": "[ACT]", "V": "[ACG]",
    "N": "[ACGT]",
}


def _site_regex(site: str) -> re.Pattern[str]:
    # lookahead => overlapping matches, like Biopython's search
    body = "".join(_IUPAC[b] for b in site.upper())
    return re.compile(f"(?=({body}))")


def cut_sites(seq: str, enzymes: list[str]) -> np.ndarray:
    """Return sorted unique 0-based cut coordinates for all enzymes.

    Unknown enzyme names raise ValueError (mirrors reference pre.py:70-74).
    """
    patterns = []
    for name in enzymes:
        if name not in ENZYMES:
            raise ValueError(f"Unknown restriction enzyme: {name!r}")
        site, off = ENZYMES[name]
        patterns.append((_site_regex(site), off))
    seq_u = seq.upper()
    cuts: set[int] = set()
    for pat, off in patterns:
        for m in pat.finditer(seq_u):
            cuts.add(m.start() + off)
    return np.array(sorted(cuts), dtype=np.int64)


def digest_genome(
    fasta_records: dict[str, str], enzymes: list[str]
) -> pd.DataFrame:
    """Digest a genome with one or more enzymes, merging cut sites.

    Returns a DataFrame with columns chrom/start/end (0-based, half-open),
    one row per restriction fragment, in contig order. Interior cut
    coordinates of 0 are dropped and sentinels 0 / len(seq) added, matching
    reference pre.py:86-97.
    """
    frames = []
    for chrom, seq in fasta_records.items():
        cuts = cut_sites(seq, enzymes)
        bounds = np.unique(np.r_[0, cuts, len(seq)].astype(np.int64))
        # a cut exactly at position len(seq) would create an empty fragment
        bounds = bounds[bounds <= len(seq)]
        n = len(bounds) - 1
        frames.append(
            pd.DataFrame(
                {
                    "chrom": np.repeat(chrom, n),
                    "start": bounds[:-1],
                    "end": bounds[1:],
                }
            )
        )
    return pd.concat(frames, axis=0, ignore_index=True)


def gc_content(seq: str) -> float:
    """Fraction of G+C bases; 0.0 for empty input (reference pre.py:102-108)."""
    if not seq:
        return 0.0
    s = seq.upper()
    return (s.count("G") + s.count("C")) / len(s)


def add_gc_content(bins: pd.DataFrame, fasta_records: dict[str, str]) -> pd.DataFrame:
    """Attach per-fragment GC content column (reference pre.py:111-132)."""
    out = bins.copy()
    gc = np.empty(len(bins), dtype=np.float64)
    for i, row in enumerate(bins.itertuples(index=False)):
        gc[i] = gc_content(fasta_records[row.chrom][row.start : row.end])
    out["gc_content"] = gc
    return out
