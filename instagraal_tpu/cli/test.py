"""instagraal-test: smoke-test the installation (reference cli/test.py).

The reference downloads a yeast dataset from Zenodo; this environment has
no network access, so the default is a self-contained synthetic dataset
generated from a random toy genome (see instagraal_tpu.testing). A local
dataset can be supplied instead.
"""

import pathlib
import tempfile

import click

from .endtoend import _run_endtoend


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.option(
    "-o",
    "--output-dir",
    default=None,
    type=click.Path(file_okay=False, path_type=pathlib.Path),
    help="Where to run the test (default: a temporary directory).",
)
@click.option(
    "--fasta",
    default=None,
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
    help="Use a local draft assembly instead of the synthetic genome.",
)
@click.option(
    "--pairs",
    default=None,
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
    help="Use a local pairs file (requires --fasta).",
)
@click.option("-l", "--level", default=2, show_default=True, type=int)
@click.option("-n", "--cycles", default=3, show_default=True, type=int)
@click.option(
    "--n-pairs",
    default=200_000,
    show_default=True,
    type=int,
    help="Number of simulated Hi-C pairs for the synthetic dataset.",
)
def main(output_dir, fasta, pairs, level, cycles, n_pairs):
    """Run a quick end-to-end smoke test of the whole pipeline."""
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    if output_dir is None:
        output_dir = pathlib.Path(tempfile.mkdtemp(prefix="instagraal_test_"))
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    if fasta is None:
        from ..testing import make_toy_genome, simulate_pairs

        fasta = output_dir / "test.contigs.fa.gz"
        pairs = output_dir / "test.pairs.gz"
        click.echo(f"Generating synthetic test dataset in {output_dir}")
        make_toy_genome(fasta)
        simulate_pairs(fasta, pairs, n_pairs=n_pairs)
    elif pairs is None:
        raise click.UsageError("--pairs is required when --fasta is given.")

    _run_endtoend(
        fasta,
        pairs,
        output_dir / "run",
        enzyme="DpnII",
        level=level,
        cycles=cycles,
        neighborhood=5,
        coverage_std=1.0,
        circular=False,
        bomb=True,
        resolutions="10000",
        junction="",
        dry_run=False,
        seed=0,
    )
    click.echo(f"Smoke test finished; outputs in {output_dir / 'run'}")


if __name__ == "__main__":
    main()
