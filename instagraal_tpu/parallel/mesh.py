"""Device mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAINS_AXIS = "chains"
SHARDS_AXIS = "shards"


def make_mesh(
    n_devices: int | None = None, chains: int = 1
) -> Mesh:
    """Build a (chains, shards) mesh over the available devices.

    chains * shards must equal the device count; shards is derived.
    On a multi-host pod, call jax.distributed.initialize() first and the
    mesh spans the global device set (DCN on the chains axis, ICI within
    a host's shards, the standard hierarchical layout).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % chains != 0:
        raise ValueError(f"{n} devices not divisible by {chains} chains")
    shards = n // chains
    dev_array = np.array(devices).reshape(chains, shards)
    return Mesh(dev_array, (CHAINS_AXIS, SHARDS_AXIS))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_coo(
    mesh: Mesh,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    data: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """Shard COO pixel arrays along the nnz axis of the shards dimension.

    nnz is padded up to a multiple of the shard count with (0, 0, 0)
    sentinel pixels; callers must mask them out of the reduction with a
    weights vector (a data==0 pixel would otherwise contribute -expected
    to the sum). Returns (rows, cols, data, original nnz).
    """
    n_shards = mesh.shape[SHARDS_AXIS]
    nnz = rows.shape[0]
    pad = (-nnz) % n_shards
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros(pad, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)])
        data = jnp.concatenate([data, jnp.zeros(pad, data.dtype)])
    sharding = NamedSharding(mesh, P(SHARDS_AXIS))
    return (
        jax.device_put(rows, sharding),
        jax.device_put(cols, sharding),
        jax.device_put(data, sharding),
        nnz,
    )
