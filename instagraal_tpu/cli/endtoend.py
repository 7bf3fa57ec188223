"""instagraal-endtoend: run the whole pipeline (reference cli/endtoend.py).

Orchestrates instagraal-pre -> instagraal -> instagraal-polish ->
instagraal-post -> instagraal-stats as subprocesses, with --dry-run
support. The reference's GPU probe (pycuda + nvcc) is replaced by a JAX
device probe.
"""

import pathlib
import shlex
import subprocess
import sys

import click


def check_device() -> str:
    """Report the JAX backend/device that will run the scaffolder.

    Never fatal: an unavailable accelerator backend is reported, not
    raised — the scaffold subprocess does its own platform selection
    (INSTAGRAAL_TPU_PLATFORM) and may pin CPU.
    """
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    try:
        import jax

        dev = jax.devices()[0]
        return f"{dev.platform}:{dev.device_kind}"
    except Exception as e:  # backend init failure (e.g. tunnel down)
        return f"unavailable ({type(e).__name__}; set " \
               f"INSTAGRAAL_TPU_PLATFORM=cpu to pin the CPU backend)"


def _run_endtoend(
    fasta,
    pairs,
    output_dir,
    enzyme,
    level,
    cycles,
    neighborhood,
    coverage_std,
    circular,
    bomb,
    resolutions,
    junction,
    dry_run,
    seed,
    chains=1,
    shard_nnz=False,
):
    output_dir = pathlib.Path(output_dir)
    hic_dir = output_dir / "hic"
    mcmc_dir = output_dir / "mcmc"
    polish_dir = output_dir / "polish"
    post_dir = output_dir / "post"

    scaffold_cmd = [
        "instagraal",
        str(hic_dir),
        str(fasta),
        "-o",
        str(mcmc_dir),
        "-l",
        str(level),
        "-n",
        str(cycles),
        "-N",
        str(neighborhood),
        "-c",
        str(coverage_std),
        "--seed",
        str(seed),
    ]
    if circular:
        scaffold_cmd.append("--circular")
    if bomb:
        scaffold_cmd.append("--bomb")
    if chains > 1:
        scaffold_cmd += ["--chains", str(chains)]
    if shard_nnz:
        scaffold_cmd.append("--shard-nnz")

    info_frags = (
        mcmc_dir / "hic" / f"test_mcmc_{level}" / "info_frags.txt"
    )
    polish_cmd = [
        "instagraal-polish",
        "-i",
        str(info_frags),
        "-f",
        str(fasta),
        "-o",
        str(polish_dir),
    ]
    if junction:
        polish_cmd += ["-j", junction]

    steps = [
        (
            "pre",
            [
                "instagraal-pre",
                str(fasta),
                str(pairs),
                "-e",
                enzyme,
                "-o",
                str(hic_dir),
            ],
        ),
        ("scaffold", scaffold_cmd),
        ("polish", polish_cmd),
        (
            "post",
            [
                "instagraal-post",
                str(pairs),
                str(polish_dir / "new_info_frags.txt"),
                "-o",
                str(post_dir),
                "-r",
                resolutions,
            ],
        ),
        (
            "stats",
            [
                "instagraal-stats",
                str(fasta),
                str(polish_dir / "polished_genome.fa"),
                "-l",
                "draft,scaffolded",
            ],
        ),
    ]

    click.echo(f"Device: {check_device()}")
    for name, cmd in steps:
        pretty = " ".join(shlex.quote(c) for c in cmd)
        click.echo(f"[{name}] {pretty}")
        if dry_run:
            continue
        result = subprocess.run(cmd)
        if result.returncode != 0:
            click.echo(f"step {name!r} failed ({result.returncode})", err=True)
            sys.exit(result.returncode)


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
    "-o",
    "--output-dir",
    default="endtoend_out",
    show_default=True,
    type=click.Path(file_okay=False, path_type=pathlib.Path),
)
@click.option("-e", "--enzyme", default="DpnII", show_default=True)
@click.option("-l", "--level", default=4, show_default=True, type=int)
@click.option("-n", "--cycles", default=100, show_default=True, type=int)
@click.option("-N", "--neighborhood", default=5, show_default=True, type=int)
@click.option(
    "-c", "--coverage-std", default=1.0, show_default=True, type=float
)
@click.option("-C", "--circular", is_flag=True, default=False)
@click.option("-b", "--bomb", is_flag=True, default=False)
@click.option(
    "-r", "--resolutions", default="10000,50000,100000", show_default=True
)
@click.option("-j", "--junction", default="", help="Junction sequence.")
@click.option(
    "--dry-run",
    is_flag=True,
    default=False,
    help="Print the commands without running them.",
)
@click.option("--seed", default=0, show_default=True, type=int)
@click.option(
    "--chains",
    default=1,
    show_default=True,
    type=int,
    help="Data-parallel MCMC chains for the scaffold step.",
)
@click.option(
    "--shard-nnz",
    is_flag=True,
    default=False,
    help="Shard the contact matrix across devices in the scaffold step.",
)
def main(
    fasta,
    pairs,
    output_dir,
    enzyme,
    level,
    cycles,
    neighborhood,
    coverage_std,
    circular,
    bomb,
    resolutions,
    junction,
    dry_run,
    seed,
    chains,
    shard_nnz,
):
    """Run the full Hi-C scaffolding pipeline end to end.

    FASTA is the draft assembly; PAIRS the Hi-C pairs file. Runs pre,
    scaffold, polish, post and stats in sequence, each as its own
    subprocess.
    """
    _run_endtoend(
        fasta,
        pairs,
        output_dir,
        enzyme,
        level,
        cycles,
        neighborhood,
        coverage_std,
        circular,
        bomb,
        resolutions,
        junction,
        dry_run,
        seed,
        chains=chains,
        shard_nnz=shard_nnz,
    )


if __name__ == "__main__":
    main()
