"""Scaffold composition visualisation (reference _scaffold_viz.py)."""

from __future__ import annotations

import numpy as np

from .io import format_info_frags, parse_info_frags


def plot_info_frags(scaffolds, output_prefix=None):
    """Scatter of bin origin per scaffold, coloured by orientation."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scaffolds = format_info_frags(scaffolds)
    for k, (name, scaffold) in enumerate(scaffolds.items()):
        fig = plt.figure()
        xs = range(len(scaffold))
        colors = ["r" if b[4] > 0 else "g" for b in scaffold]
        names: dict[str, int] = {}
        ys = [names.setdefault(b[0], len(names)) for b in scaffold]
        plt.scatter(xs, ys, c=colors)
        plt.title(name)
        if output_prefix:
            fig.savefig(f"{output_prefix}_{k}.png", dpi=120)
        plt.close(fig)


def plot_contig_composition(new_info_frags_path, output_path=None):
    """Stacked barplot: bp contribution of each source contig to every
    new scaffold, longest scaffolds first."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scaffolds = parse_info_frags(str(new_info_frags_path))
    contribs: dict[str, dict[str, int]] = {}
    all_src: list[str] = []
    for new_name, frags in scaffolds.items():
        contrib: dict[str, int] = {}
        for frag in frags:
            src = frag[0]
            contrib[src] = contrib.get(src, 0) + (frag[3] - frag[2])
            if src not in all_src:
                all_src.append(src)
        contribs[new_name] = contrib
    all_src = sorted(all_src)

    total_len = {n: sum(c.values()) for n, c in contribs.items()}
    ordered = sorted(contribs, key=lambda n: total_len[n], reverse=True)
    n_new = len(ordered)
    heights = np.array(
        [[contribs[n].get(src, 0) for n in ordered] for src in all_src],
        dtype=float,
    )

    cmap = plt.get_cmap("tab20", max(len(all_src), 1))
    fig, ax = plt.subplots(figsize=(max(8, n_new * 0.25), 5))
    x = np.arange(n_new)
    bottoms = np.zeros(n_new)
    for i, src in enumerate(all_src):
        ax.bar(
            x, heights[i], bottom=bottoms, color=cmap(i), label=src, width=0.8
        )
        bottoms += heights[i]
    short = [n.split("|")[-1] if "|" in n else n for n in ordered]
    ax.set_xticks(x)
    ax.set_xticklabels(
        short, rotation=90, fontsize=max(4, min(8, 120 // max(n_new, 1)))
    )
    ax.set_xlabel("New contigs")
    ax.set_ylabel("Contig length (bp)")
    ax.set_title("Source-contig composition of new assembly contigs")
    ax.legend(
        title="Original contigs",
        bbox_to_anchor=(1.01, 1),
        loc="upper left",
        fontsize=6,
        ncol=max(1, len(all_src) // 30),
    )
    fig.tight_layout()
    if output_path is not None:
        fig.savefig(str(output_path), dpi=150, bbox_inches="tight")
    plt.close(fig)
