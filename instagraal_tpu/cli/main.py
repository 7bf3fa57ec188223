"""instagraal: the scaffolder CLI (reference cli/main.py)."""

import pathlib

import click

from .. import __version__
from ..log import set_level


@click.command(context_settings={"help_option_names": ["-h", "--help"]})
@click.version_option(__version__, "-V", "--version")
@click.argument(
    "hic_folder",
    type=click.Path(exists=True, file_okay=False, path_type=pathlib.Path),
)
@click.argument(
    "reference_fa",
    type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
    metavar="REFERENCE.FA",
)
@click.option(
    "-o",
    "--output-dir",
    "output_folder",
    default="out",
    show_default=True,
    type=click.Path(file_okay=False, path_type=pathlib.Path),
    help="Directory where output files will be written.",
)
@click.option(
    "-l",
    "--level",
    default=4,
    show_default=True,
    type=int,
    help=(
        "Level (resolution) of the contact map. Increasing level by one "
        "means a threefold smaller resolution but also a threefold faster "
        "computation time."
    ),
)
@click.option(
    "-n",
    "--cycles",
    default=100,
    show_default=True,
    type=int,
    help="Number of iterations to perform for each bin.",
)
@click.option(
    "-c",
    "--coverage-std",
    default=1.0,
    show_default=True,
    type=float,
    help=(
        "Number of standard deviations below the mean coverage below "
        "which fragments are filtered out prior to binning."
    ),
)
@click.option(
    "-N",
    "--neighborhood",
    default=5,
    show_default=True,
    type=int,
    help="Number of neighbors to sample for potential mutations per bin.",
)
@click.option(
    "--device",
    default=0,
    show_default=True,
    type=int,
    help="Device index (accepted for compatibility; JAX manages devices).",
)
@click.option(
    "-C",
    "--circular",
    is_flag=True,
    default=False,
    help="Indicates genome is circular.",
)
@click.option(
    "-b",
    "--bomb",
    is_flag=True,
    default=False,
    help="Explode the genome prior to scaffolding.",
)
@click.option(
    "--pyramid-only",
    is_flag=True,
    default=False,
    help="Only build multi-resolution contact maps (pyramids), no scaffolding.",
)
@click.option(
    "--save-pickle",
    is_flag=True,
    default=False,
    help="Dump run state into a pickle for post hoc introspection.",
)
@click.option(
    "--save-matrix",
    is_flag=True,
    default=False,
    help="Save a preview of the contact map after each cycle.",
)
@click.option(
    "--simple",
    is_flag=True,
    default=False,
    help="Only perform operations at the edge of the contigs.",
)
@click.option(
    "--seed",
    default=0,
    show_default=True,
    type=int,
    help="PRNG seed for reproducible runs (-1 for nondeterministic).",
)
@click.option(
    "--resume",
    is_flag=True,
    default=False,
    help="Continue from the checkpoint in the output folder.",
)
@click.option(
    "--slice-cap",
    default=None,
    type=str,
    help=(
        "Sliced-scoring capacity: an integer pixel count, 'auto' to "
        "derive one from the contact map (default: nnz/8), or "
        "'probe' to measure candidate seg capacities on the running "
        "device and use the fastest (costs one compile per "
        "candidate). Oversized slices fall back to an exact full "
        "re-score either way."
    ),
)
@click.option(
    "--chains",
    default=1,
    show_default=True,
    type=int,
    help=(
        "Independent MCMC chains run data-parallel on device (scan "
        "engine). Chains shard across the device mesh when the device "
        "count divides evenly; per-cycle best-chain logging, final "
        "best-chain export."
    ),
)
@click.option(
    "--steps-per-call",
    default=None,
    type=int,
    help=(
        "Max sweep steps per device call (default: auto — sized by "
        "a cost model, then calibrated on a timed probe chunk). "
        "Bit-identical to a single-call cycle; bounds per-call wall "
        "time on transports with execution watchdogs."
    ),
)
@click.option(
    "--shard-nnz",
    is_flag=True,
    default=False,
    help=(
        "Shard the contact matrix's pixel arrays across the mesh's "
        "shards axis (per-chip HBM scales as nnz / n_shards; pixel "
        "reductions merge through psum). For contact maps too large "
        "for one chip. Composes with --chains C: devices form a "
        "(chains, shards) mesh."
    ),
)
@click.option(
    "--exchange-every",
    default=0,
    show_default=True,
    type=int,
    help=(
        "With --chains C: every N cycles, re-seed chains trailing "
        "the best chain by more than --exchange-thresh log-units "
        "from the best chain's genome+parameters (elitist exchange; "
        "per-chain PRNG streams keep them diverging). 0 = "
        "independent chains."
    ),
)
@click.option(
    "--exchange-thresh",
    default=0.0,
    show_default=True,
    type=float,
    help="Likelihood lag (log-units) beyond which --exchange-every "
    "re-seeds a chain.",
)
@click.option(
    "--profile",
    default=None,
    type=click.Path(),
    help=(
        "Dump a jax.profiler (XLA/TPU) trace of the EM loop into this "
        "directory (view with XProf/TensorBoard). Per-phase wall-time "
        "totals are logged at the end of every run regardless."
    ),
)
@click.option("--quiet", is_flag=True, default=False, help="Warnings/errors only.")
@click.option("--debug", is_flag=True, default=False, help="Debug output.")
def main(
    hic_folder,
    reference_fa,
    output_folder,
    level,
    cycles,
    coverage_std,
    neighborhood,
    device,
    circular,
    bomb,
    pyramid_only,
    save_pickle,
    save_matrix,
    simple,
    seed,
    resume,
    slice_cap,
    chains,
    exchange_every,
    exchange_thresh,
    steps_per_call,
    shard_nnz,
    profile,
    quiet,
    debug,
):
    """Large genome reassembly based on Hi-C data.

    HIC_FOLDER contains the output of instagraal-pre
    (fragments_list.txt, info_contigs.txt,
    abs_fragments_contacts_weighted.txt); REFERENCE.FA is the draft
    assembly the Hi-C data was mapped against.
    """
    set_level(quiet=quiet, debug=debug)
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    from ..sampler import run_instagraal

    run_instagraal(
        hic_folder,
        reference_fa,
        output_folder=output_folder,
        level=level,
        cycles=cycles,
        coverage_std=coverage_std,
        neighborhood=neighborhood,
        device=device,
        circular=circular,
        bomb=bomb,
        pyramid_only=pyramid_only,
        save_pickle=save_pickle,
        save_matrix=save_matrix,
        simple=simple,
        seed=None if seed < 0 else seed,
        resume=resume,
        slice_capacity=(
            slice_cap
            if slice_cap in (None, "auto", "probe")
            else int(slice_cap)
        ),
        chains=chains,
        exchange_every=exchange_every,
        exchange_thresh=exchange_thresh,
        shard_nnz=shard_nnz,
        steps_per_call=(
            "auto" if steps_per_call is None else steps_per_call
        ),
        profile=profile,
    )


if __name__ == "__main__":
    main()
