"""instagraal-polish: scaffold correction CLI (reference cli/polish.py)."""

import pathlib

import click

from ..polish import (
    correct_spurious_inversions,
    find_lost_dna,
    integrate_lost_dna,
    parse_info_frags,
    plot_contig_composition,
    rearrange_intra_scaffolds,
    remove_spurious_insertions,
    reorient_consecutive_blocks,
    write_fasta,
    write_info_frags,
)
from ..stats import print_assembly_stats

VALID_MODES = (
    "polishing",
    "rearrange",
    "inversion",
    "inversion2",
    "reincorporation",
    "fasta",
    "singleton",
)
DEFAULT_MIN_SCAFFOLD_SIZE = 0
DEFAULT_MIN_SCAFFOLD_LENGTH = 0
DEFAULT_NEW_INFO_FRAGS_NAME = "new_info_frags.txt"
POLISHED_GENOME_NAME = "polished_genome.fa"
DEFAULT_CRITERION = "colinear"
DEFAULT_CRITERION_2 = "blocks"


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.option(
    "-m",
    "--mode",
    default=None,
    type=click.Choice(VALID_MODES, case_sensitive=False),
    help=(
        "Processing mode (default: full polishing pipeline). One of: "
        "rearrange, inversion, inversion2, reincorporation, fasta, "
        "singleton, polishing."
    ),
)
@click.option(
    "-i",
    "--input",
    "info_frags",
    required=True,
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
    help="Input info_frags.txt file to process.",
)
@click.option(
    "-f",
    "--fasta",
    "init_fasta",
    default=None,
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
    help=(
        "The initial reference FASTA (required for fasta/"
        "reincorporation/polishing modes)."
    ),
)
@click.option(
    "-o",
    "--output-dir",
    default="out",
    show_default=True,
    type=click.Path(file_okay=False, path_type=pathlib.Path),
    help="Output directory (created if missing).",
)
@click.option(
    "-c",
    "--criterion",
    default=None,
    help="Block criterion stringency for inversion/inversion2 modes.",
)
@click.option(
    "-s",
    "--min-scaffold-size",
    default=DEFAULT_MIN_SCAFFOLD_SIZE,
    show_default=True,
    type=int,
    help="Minimum scaffold size in bins.",
)
@click.option(
    "-l",
    "--min-scaffold-length",
    default=DEFAULT_MIN_SCAFFOLD_LENGTH,
    show_default=True,
    type=int,
    help="Minimum scaffold length in bp.",
)
@click.option(
    "-j",
    "--junction",
    default="",
    help="Junction sequence inserted between stitched bins.",
)
def main(
    mode,
    info_frags,
    init_fasta,
    output_dir,
    criterion,
    min_scaffold_size,
    min_scaffold_length,
    junction,
):
    """Polish and post-process scaffolded assemblies.

    By default runs the full polishing pipeline: rearrange ->
    inversion2 -> reincorporation -> fasta (requires --fasta).
    """
    mode = (mode or "polishing").lower()
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    scaffolds = {
        name: scaf
        for name, scaf in parse_info_frags(str(info_frags)).items()
        if len(scaf) > min_scaffold_size
    }
    click.echo(
        f"{len(scaffolds)} scaffolds retained after filtering by minimum "
        f"number of bins [{min_scaffold_size}]."
    )
    scaffolds = {
        name: scaf
        for name, scaf in scaffolds.items()
        if sum(end - start for _, _, start, end, _ in scaf)
        >= min_scaffold_length
    }
    click.echo(
        f"{len(scaffolds)} scaffolds retained after filtering by minimum "
        f"length [{min_scaffold_length}]."
    )

    def _need_fasta():
        if init_fasta is None:
            raise click.UsageError(
                f"A reference FASTA (--fasta) is required for {mode!r} mode."
            )

    info_out = output_dir / DEFAULT_NEW_INFO_FRAGS_NAME
    genome_out = output_dir / POLISHED_GENOME_NAME

    if mode == "fasta":
        _need_fasta()
        write_fasta(
            init_fasta=str(init_fasta),
            info_frags=str(info_frags),
            junction=junction,
            output=str(genome_out),
        )
        print_assembly_stats(genome_out, label="Assembly (fasta mode)")
        return

    if mode == "singleton":
        new_scaffolds = remove_spurious_insertions(scaffolds)
    elif mode == "inversion":
        new_scaffolds = correct_spurious_inversions(
            scaffolds, criterion=criterion or DEFAULT_CRITERION
        )
    elif mode == "inversion2":
        new_scaffolds = reorient_consecutive_blocks(
            scaffolds, mode=criterion or DEFAULT_CRITERION_2
        )
    elif mode == "rearrange":
        new_scaffolds = rearrange_intra_scaffolds(scaffolds)
    elif mode == "reincorporation":
        _need_fasta()
        removed = find_lost_dna(str(init_fasta), scaffolds)
        new_scaffolds = integrate_lost_dna(scaffolds, removed)
    else:  # polishing: the full pipeline
        _need_fasta()
        arranged = rearrange_intra_scaffolds(scaffolds)
        reoriented = reorient_consecutive_blocks(arranged)
        removed = find_lost_dna(str(init_fasta), reoriented)
        new_scaffolds = integrate_lost_dna(reoriented, removed)

    write_info_frags(new_scaffolds, output=str(info_out))
    plot_contig_composition(
        info_out, output_path=output_dir / "contig_composition.png"
    )
    if mode == "polishing":
        write_fasta(
            init_fasta=str(init_fasta),
            info_frags=str(info_out),
            output=str(genome_out),
            junction=junction,
        )
        print_assembly_stats(genome_out, label="Assembly (polishing mode)")


if __name__ == "__main__":
    main()
