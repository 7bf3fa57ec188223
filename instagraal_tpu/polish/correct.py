"""Scaffold correction heuristics.

Same algorithmic behaviour as reference _scaffold_correct.py; rewritten
around plain list/dict transforms. Bin layout:
[init_contig, frag_id, start, end, ori].
"""

from __future__ import annotations

import copy
import itertools
import operator

from ..io.fasta import read_fasta
from .io import format_info_frags


def remove_spurious_insertions(scaffolds) -> dict:
    """Drop bins whose two neighbours come from the same *other* contig
    (the -*- pattern), incl. edge variants (reference :90-157)."""
    scaffolds = format_info_frags(scaffolds)
    out = {}
    for name, scaffold in scaffolds.items():
        if len(scaffold) <= 2:
            out[name] = copy.deepcopy(scaffold)
            continue
        kept = []
        n = len(scaffold)
        for i, my_bin in enumerate(scaffold):
            if i == 0:
                spurious = (
                    scaffold[0][0] != scaffold[1][0]
                    and scaffold[1][0] == scaffold[2][0]
                )
            elif i == n - 1:
                spurious = (
                    scaffold[-1][0] != scaffold[-2][0]
                    and scaffold[-2][0] == scaffold[-3][0]
                )
            else:
                spurious = (
                    scaffold[i - 1][0] == scaffold[i + 1][0]
                    and scaffold[i - 1][0] != my_bin[0]
                )
            if not spurious:
                kept.append(copy.deepcopy(my_bin))
        out[name] = kept
    return out


def correct_spurious_inversions(scaffolds, criterion: str = "colinear") -> dict:
    """Set every bin of an orientation neighbourhood to the majority
    orientation (reference :160-317).

    criterion: "cis" (same contig), "colinear" (cis + source order
    preserved) or "contiguous" (colinear + exactly abutting).
    """
    scaffolds = format_info_frags(scaffolds)

    def is_cis(b1, b2):
        return b1[0] == b2[0]

    def is_colinear(b1, b2):
        return is_cis(b1, b2) and b1[3] <= b2[2]

    def is_contiguous(b1, b2):
        return is_cis(b1, b2) and b1[3] == b2[2]

    same_block = {
        "cis": is_cis,
        "colinear": is_colinear,
        "contiguous": is_contiguous,
    }[criterion]

    out = {}
    for name, scaffold in scaffolds.items():
        if len(scaffold) <= 2:
            out[name] = copy.deepcopy(scaffold)
            continue
        new_scaffold = []

        def flush(buffer, total_ori):
            majority = 1 if total_ori >= 0 else -1
            for b in buffer:
                nb = copy.deepcopy(b)
                nb[-1] = majority
                new_scaffold.append(nb)

        buffer = [copy.deepcopy(scaffold[0])]
        total_ori = scaffold[0][-1]
        prev = scaffold[0]
        for my_bin in scaffold[1:]:
            if same_block(prev, my_bin):
                buffer.append(copy.deepcopy(my_bin))
                total_ori += my_bin[-1]
            else:
                flush(buffer, total_ori)
                buffer = [copy.deepcopy(my_bin)]
                total_ori = my_bin[-1]
            prev = my_bin
        flush(buffer, total_ori)
        out[name] = new_scaffold
    return out


def rearrange_intra_scaffolds(scaffolds) -> dict:
    """Group all runs from the same contig within a scaffold, moving the
    smaller runs next to the largest one (reference :320-358)."""
    scaffolds = format_info_frags(scaffolds)
    out = {}
    for name, scaffold in scaffolds.items():
        blocks = [
            list(block)
            for _, block in itertools.groupby(
                scaffold, operator.itemgetter(0)
            )
        ]
        # anchor position of each contig = position of its longest run
        anchor: dict[str, tuple[int, int]] = {}
        for order, block in enumerate(blocks):
            cname, length = block[0][0], len(block)
            if cname not in anchor or length > anchor[cname][1]:
                anchor[cname] = (order, length)
        merged = sorted(blocks, key=lambda b: anchor[b[0][0]][0])
        out[name] = [copy.deepcopy(b) for block in merged for b in block]
    return out


def reorient_consecutive_blocks(scaffolds, mode: str = "blocks") -> dict:
    """Per same-contig run: set every bin to the run's majority
    orientation and sort bins by fragment id in that orientation
    ("blocks" mode), or infer orientation from consecutive fragment ids
    ("sequences" mode) (reference :361-420)."""
    scaffolds = format_info_frags(scaffolds)
    out = {}
    for name, scaffold in scaffolds.items():
        new_scaffold = []
        for _, block in itertools.groupby(scaffold, operator.itemgetter(0)):
            bins = [copy.deepcopy(b) for b in block]
            if mode == "sequences":
                if len(bins) < 2:
                    new_scaffold.append(bins[0])
                    continue
                current_ori = 0
                prev = None
                for my_bin in [*bins, [-2, -2, -2, -2, -2]]:
                    if prev is None:
                        prev = copy.copy(my_bin)
                        continue
                    if my_bin[1] == prev[1] + 1:
                        current_ori = 1
                        prev[-1] = 1
                        new_scaffold.append(prev)
                        prev = copy.copy(my_bin)
                    elif my_bin[1] == prev[1] - 1:
                        current_ori = -1
                        prev[-1] = -1
                        new_scaffold.append(prev)
                        prev = copy.copy(my_bin)
                    else:
                        if current_ori != 0:
                            prev[-1] = current_ori
                            current_ori = 0
                        new_scaffold.append(prev)
                        prev = copy.copy(my_bin)
            else:  # "blocks"
                total_ori = sum(b[-1] for b in bins)
                block_ori = 1 if total_ori >= 0 else -1
                ordered = sorted(
                    bins,
                    key=operator.itemgetter(1),
                    reverse=block_ori < 0,
                )
                for b in ordered:
                    b[-1] = block_ori
                    new_scaffold.append(b)
        out[name] = new_scaffold
    return out


def find_lost_dna(init_fasta, scaffolds, output_file=None) -> dict:
    """Per source contig, the interval complement of all bins placed in
    the scaffolds — DNA the scaffolder dropped (reference :428-480).

    Returns {contig: [[contig, -1, start, end, 1], ...]}.
    """
    scaffolds = format_info_frags(scaffolds)
    genome = read_fasta(init_fasta)

    used: dict[str, list[tuple[int, int]]] = {c: [] for c in genome}
    for scaffold in scaffolds.values():
        for my_bin in scaffold:
            if my_bin[0] in used:
                # reference removes [start, end] inclusive (:448)
                used[my_bin[0]].append((my_bin[2], my_bin[3] + 1))

    lost: dict[str, list] = {}
    fasta_chunks = []
    for contig in sorted(genome, key=lambda c: len(genome[c]), reverse=True):
        length = len(genome[contig])
        intervals = sorted(used[contig])
        gaps = []
        cursor = 0
        for s, e in intervals:
            if s > cursor:
                gaps.append((cursor, min(s, length)))
            cursor = max(cursor, e)
        if cursor < length:
            gaps.append((cursor, length))
        for s, e in gaps:
            if e <= s:
                continue
            lost.setdefault(contig, []).append([contig, -1, s, e, 1])
            fasta_chunks.append((f"{contig}_{s}_{e}", genome[contig][s:e]))

    if output_file:
        with open(output_file, "w") as fh:
            for header, seq in fasta_chunks:
                fh.write(f">{header}\n{seq}\n")
    return lost


def integrate_lost_dna(scaffolds, lost_dna_positions) -> dict:
    """Re-insert lost chunks adjacent to the bins they border; leftovers
    become their own scaffolds (reference :483-537).

    Control flow mirrors the reference exactly, including two quirks
    that shift insertion indices (verified by differential test): a
    chunk inserted before the first bin uses ``insert(i - 1)``
    unclamped (i == 0 -> list.insert(-1, .) places it before the LAST
    element), and once a contig's chunks have been consumed the bare
    ``remaining.pop(init_name)`` raises KeyError, which aborts the
    chunk scan for the current bin and advances ``i`` once via the
    except path (reference :511-523)."""
    scaffolds = format_info_frags(scaffolds)
    remaining = copy.deepcopy(lost_dna_positions)
    out = {}
    for name, scaffold in scaffolds.items():
        modified = copy.deepcopy(scaffold)
        i = 0
        for my_bin in scaffold:
            init_name = my_bin[0]
            try:
                chunks = lost_dna_positions[init_name]
                start, end, ori = my_bin[2], my_bin[3], my_bin[4]
                for lost_bin in chunks:
                    lost_start, lost_end = lost_bin[2], lost_bin[3]
                    if end == lost_start - 1:
                        modified.insert(
                            i + 1 - (ori < 0),
                            [init_name, -1, lost_start - 1,
                             lost_end + 1, ori],
                        )
                        remaining.pop(init_name)
                        i += 1
                    elif start in (lost_end, lost_end - 1, lost_end + 1):
                        modified.insert(
                            i - 1,
                            [init_name, -1, lost_start, lost_end, ori],
                        )
                        remaining.pop(init_name)
                        i += 1
            except (ValueError, KeyError):
                i += 1
                continue
            i += 1
        out[name] = modified
    for rem_name, rem_bins in remaining.items():
        if rem_bins:
            out[rem_name] = [
                [rem_name, -1, b[2], b[3], 1] for b in rem_bins[-1:]
            ]
    return out


def is_block(bin_list) -> bool:
    """True when the bin ids form one consecutive run (reference :545-549)."""
    ids = {b[1] for b in bin_list}
    return ids == set(range(min(ids), max(ids) + 1))
