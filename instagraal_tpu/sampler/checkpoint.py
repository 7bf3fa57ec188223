"""MCMC chain checkpoint / resume.

The reference's restartability is file-level only: cached pyramids,
per-cycle genome snapshots that nothing reads back, and a whole-object
pickle (SURVEY.md §5.4) — RNG and nuisance-parameter state are lost on
interruption. Here the full chain state (genome arrays, model
parameters, numpy RNG bit-generator state, JAX PRNG key, cycle counter
and behaviour traces) round-trips through one portable .npz+pickle file,
and `instagraal --resume` continues a run exactly where it stopped.
"""

from __future__ import annotations

import pathlib
import pickle

import jax.numpy as jnp
import numpy as np

from ..core.state import FragState, state_to_numpy
from ..model.rippe import RippeParams
from ..log import logger

CHECKPOINT_NAME = "checkpoint.pkl"
FORMAT_VERSION = 1


def save_checkpoint(
    path,
    state: FragState,
    params: RippeParams,
    cycle: int,
    rng: np.random.Generator,
    prng_key,
    collect: dict,
    mutations: list,
    likelihood: float,
) -> None:
    payload = {
        "version": FORMAT_VERSION,
        "state": state_to_numpy(state),
        "params": [float(v) for v in params],
        "cycle": cycle,
        "rng_state": rng.bit_generator.state,
        "prng_key": np.asarray(prng_key),
        "collect": collect,
        "mutations": mutations,
        "likelihood": likelihood,
    }
    path = pathlib.Path(path)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh)
    tmp.replace(path)  # atomic on POSIX
    logger.debug("checkpoint written: %s (cycle %d)", path, cycle)


MULTI_FORMAT_VERSION = 2


def save_checkpoint_multi(
    path,
    states,
    params_all,
    cycle: int,
    rng: np.random.Generator,
    prng_key,
    collect_chains: list,
    mutations_chains: list,
    likelihoods,
) -> None:
    """Checkpoint a multi-chain run.

    states: FragState with a leading [C] chain axis; params_all:
    RippeParams with [C] leaves; collect_chains / mutations_chains:
    per-chain behaviour traces.
    """
    import jax

    n_chains = len(likelihoods)
    states_np = [
        state_to_numpy(jax.tree.map(lambda a: a[c], states))
        for c in range(n_chains)
    ]
    params_np = np.asarray(
        jnp.stack(list(params_all)), dtype=np.float64
    )  # [8, C]
    payload = {
        "version": MULTI_FORMAT_VERSION,
        "states": states_np,
        "params_all": params_np,
        "cycle": cycle,
        "rng_state": rng.bit_generator.state,
        "prng_key": np.asarray(prng_key),
        "collect_chains": collect_chains,
        "mutations_chains": mutations_chains,
        "likelihoods": np.asarray(likelihoods, dtype=np.float64),
    }
    path = pathlib.Path(path)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh)
    tmp.replace(path)
    logger.debug(
        "multi-chain checkpoint written: %s (cycle %d)", path, cycle
    )


def load_checkpoint(path) -> dict:
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    version = payload.get("version")
    if version == MULTI_FORMAT_VERSION:
        payload["states"] = [
            FragState(**{k: jnp.asarray(v) for k, v in s.items()})
            for s in payload["states"]
        ]
        payload["params_all"] = RippeParams(
            *[
                jnp.asarray(row, dtype=jnp.float32)
                for row in payload["params_all"]
            ]
        )
        return payload
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {version}")
    payload["state"] = FragState(
        **{k: jnp.asarray(v) for k, v in payload["state"].items()}
    )
    payload["params"] = RippeParams(
        *[np.float32(v) for v in payload["params"]]
    )
    return payload


def restore_rng(rng_state) -> np.random.Generator:
    rng = np.random.default_rng(0)
    rng.bit_generator.state = rng_state
    return rng
