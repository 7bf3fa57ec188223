"""instagraal-post: liftover + contact-map outputs (reference cli/post.py)."""

import json
import pathlib

import click

from ..post import run_post


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.argument(
    "pairs",
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
)
@click.argument(
    "new_info_frags",
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
)
@click.option(
    "-o",
    "--output-dir",
    default="out",
    show_default=True,
    type=click.Path(file_okay=False, path_type=pathlib.Path),
    help="Directory where output files will be written.",
)
@click.option(
    "-r",
    "--resolutions",
    default="10000,50000,100000",
    show_default=True,
    help="Comma-separated bin sizes (bp) for the output .mcool.",
)
@click.option(
    "--cool-name",
    default=None,
    help="Base name for output files (default: pairs file stem).",
)
@click.option(
    "-j",
    "--junction-len",
    default=6,
    show_default=True,
    type=int,
    help="Junction length used during polishing (bp).",
)
@click.option(
    "--balance/--no-balance",
    default=True,
    show_default=True,
    help="Apply ICE balancing at each mcool resolution.",
)
@click.option(
    "--balance-args",
    default=None,
    help=(
        "Extra arguments for ICE balancing as a JSON object, e.g. "
        '\'{"max_iters": 500, "mad_max": 10}\'.'
    ),
)
def main(
    pairs,
    new_info_frags,
    output_dir,
    resolutions,
    cool_name,
    junction_len,
    balance,
    balance_args,
):
    """Remap the original Hi-C pairs onto the polished assembly.

    PAIRS is the original 4DN pairs file fed to instagraal-pre;
    NEW_INFO_FRAGS is the new_info_frags.txt from instagraal-polish.
    Produces lifted pairs, contig/scaffold .cool files, a balanced
    .mcool and P(s) curves.
    """
    run_post(
        pairs,
        new_info_frags,
        output_dir,
        resolutions=resolutions,
        cool_name=cool_name,
        junction_len=junction_len,
        balance=balance,
        balance_args=json.loads(balance_args) if balance_args else None,
    )


if __name__ == "__main__":
    main()
