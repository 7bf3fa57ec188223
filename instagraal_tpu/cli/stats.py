"""instagraal-stats: assembly statistics CLI (reference cli/stats.py)."""

import pathlib

import click

from .. import __version__
from ..stats import (
    compute_assembly_stats,
    format_comparison_table,
    format_stats_table,
)


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.version_option(__version__, "-V", "--version")
@click.argument(
    "fasta_files",
    nargs=-1,
    required=True,
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
)
@click.option(
    "-l",
    "--labels",
    default=None,
    help=(
        "Comma-separated labels to use as column headers (one per file). "
        "Defaults to the file basenames."
    ),
)
def main(fasta_files, labels):
    """Compute and display assembly statistics for one or more FASTAs.

    A single file prints a summary table; multiple files are shown
    side-by-side (sequences, total length, largest/shortest, mean/median,
    N50/L50, N90/L90, GC content).
    """
    if labels is not None:
        label_list = [lb.strip() for lb in labels.split(",")]
        if len(label_list) != len(fasta_files):
            raise click.UsageError(
                f"--labels supplied {len(label_list)} label(s) but "
                f"{len(fasta_files)} file(s) were given."
            )
    else:
        label_list = [f.name for f in fasta_files]

    stats = [compute_assembly_stats(str(p)) for p in fasta_files]
    if len(fasta_files) == 1:
        click.echo(format_stats_table(stats[0], label=label_list[0]))
    else:
        click.echo(format_comparison_table(stats, label_list))


if __name__ == "__main__":
    main()
