"""nnz-sharded genome likelihood with psum-merged partial sums.

The reduction over COO pixels is the hot loop of the whole framework
(SURVEY.md §3.2). Across devices, pixel arrays live sharded along the
"shards" mesh axis; each device gathers the (replicated) sub-fragment
vectors at its local pixel indices and reduces a partial sum; XLA's SPMD
partitioner turns the final jnp.sum into an all-reduce (psum) over ICI —
the TPU-native replacement for the reference's shared-memory trees +
atomicAdd (kernel_sparse_adapt.cu:3824-3848, :4462-4487).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.state import FragState
from ..model.likelihood import (
    SubIndex,
    nz_log_likelihood,
    project_to_sub,
    zeros_log_likelihood,
)
from ..model.rippe import RippeParams
from .mesh import SHARDS_AXIS, shard_coo


def make_sharded_likelihood(
    mesh,
    sub_index: SubIndex,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    data: jnp.ndarray,
    mean_size_frag: float,
    n_pix_total: float,
):
    """Build a jitted ``ll(state, params) -> scalar`` whose nnz reduction
    is sharded over the mesh's "shards" axis.

    Padding pixels (added to round nnz up to the shard count) are masked
    with a weights vector so the sum is exact.
    """
    s_rows, s_cols, s_data, nnz = shard_coo(mesh, rows, cols, data)
    n_padded = s_rows.shape[0]
    weights = (jnp.arange(n_padded) < nnz).astype(jnp.float32)
    weights = jax.device_put(
        weights, NamedSharding(mesh, P(SHARDS_AXIS))
    )
    msf = jnp.float32(mean_size_frag)
    n_pix = jnp.float32(n_pix_total)

    @jax.jit
    def ll(state: FragState, params: RippeParams):
        sub = project_to_sub(state, sub_index)
        nz = nz_log_likelihood(
            sub, s_rows, s_cols, s_data, params, msf, weights=weights
        )
        z = zeros_log_likelihood(sub, params, msf, n_pix)
        return nz + z

    return ll
