"""instagraal-test: smoke-test the installation (reference cli/test.py).

Mirrors the reference's behaviour: attempt to download the published
yeast test dataset from Zenodo record 19813387 (reference
cli/test.py:21-23), and fall back to a self-contained synthetic
dataset (random toy genome + simulated pairs,
instagraal_tpu.testing) when the network is unavailable — always
saying which path ran. A local dataset can be supplied instead, and
``--offline`` skips the download attempt entirely.
"""

import pathlib
import tempfile
import urllib.error
import urllib.request

import click

from ..log import logger
from .endtoend import _run_endtoend

# reference cli/test.py:21-23
ZENODO_RECORD_ID = "19813387"
ZENODO_BASE_URL = f"https://zenodo.org/record/{ZENODO_RECORD_ID}/files"
TEST_FASTA = "yeast.contigs.fa.gz"
TEST_PAIRS = "yeast.pairs.gz"
DOWNLOAD_TIMEOUT_S = 30


def fetch_zenodo_dataset(workdir: pathlib.Path):
    """Try the reference's Zenodo test dataset; return (fasta, pairs)
    or None when the network/record is unreachable."""
    out = []
    for name in (TEST_FASTA, TEST_PAIRS):
        dest = workdir / name
        if not dest.exists():
            url = f"{ZENODO_BASE_URL}/{name}"
            click.echo(f"Fetching {url} ...")
            try:
                with urllib.request.urlopen(
                    url, timeout=DOWNLOAD_TIMEOUT_S
                ) as resp, open(dest, "wb") as fh:
                    while True:
                        block = resp.read(1 << 20)
                        if not block:
                            break
                        fh.write(block)
            except (urllib.error.URLError, OSError, ValueError) as e:
                logger.info("Zenodo download failed: %s", e)
                dest.unlink(missing_ok=True)
                return None
        out.append(dest)
    return tuple(out)


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
    help="Use a local draft assembly instead of downloading/generating.",
)
@click.option(
    "--pairs",
    default=None,
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
    help="Use a local pairs file (requires --fasta).",
)
@click.option(
    "--offline",
    is_flag=True,
    default=False,
    help="Skip the Zenodo download attempt; use the synthetic dataset.",
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
def main(output_dir, fasta, pairs, offline, level, cycles, n_pairs):
    """Run a quick end-to-end smoke test of the whole pipeline."""
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    if output_dir is None:
        output_dir = pathlib.Path(tempfile.mkdtemp(prefix="instagraal_test_"))
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    if fasta is not None:
        if pairs is None:
            raise click.UsageError(
                "--pairs is required when --fasta is given."
            )
        click.echo("Using the supplied local dataset.")
    else:
        fetched = None if offline else fetch_zenodo_dataset(output_dir)
        if fetched is not None:
            fasta, pairs = fetched
            click.echo(
                f"Using the Zenodo test dataset (record "
                f"{ZENODO_RECORD_ID})."
            )
        else:
            if not offline:
                click.echo(
                    "Zenodo unreachable; falling back to the "
                    "synthetic dataset."
                )
            from ..testing import make_toy_genome, simulate_pairs

            fasta = output_dir / "test.contigs.fa.gz"
            pairs = output_dir / "test.pairs.gz"
            click.echo(f"Generating synthetic test dataset in {output_dir}")
            make_toy_genome(fasta)
            simulate_pairs(fasta, pairs, n_pairs=n_pairs)

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
