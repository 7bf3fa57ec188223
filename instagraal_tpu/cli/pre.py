"""instagraal-pre: FASTA + Hi-C pairs -> instaGRAAL input files
(reference cli/pre.py)."""

import pathlib

import click

from ..pre import run_pre
from ..stats import print_assembly_stats


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.argument(
    "fasta",
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
)
@click.argument(
    "pairs",
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
)
@click.option(
    "--enzyme",
    "-e",
    required=True,
    help="Restriction enzyme name(s), comma-separated (e.g. DpnII or DpnII,HinfI).",
)
@click.option(
    "--output-dir",
    "-o",
    default=".",
    show_default=True,
    type=click.Path(file_okay=False, path_type=pathlib.Path),
    help="Directory where output files will be written.",
)
@click.option(
    "--cool-name",
    default=None,
    help="Base name for the output .cool file (default: pairs file stem).",
)
def main(fasta, pairs, enzyme, output_dir, cool_name):
    """Pre-process Hi-C data for scaffolding.

    Digests FASTA with the given restriction enzyme(s), bins the read
    pairs from PAIRS into restriction fragments, and writes
    fragments_list.txt, info_contigs.txt,
    abs_fragments_contacts_weighted.txt and a .cool contact map to
    OUTPUT_DIR (a valid instagraal input folder).
    """
    enzymes = [e.strip() for e in enzyme.split(",") if e.strip()]
    print_assembly_stats(str(fasta), label="Input assembly")
    run_pre(fasta, pairs, enzymes, output_dir, cool_name)


if __name__ == "__main__":
    main()
