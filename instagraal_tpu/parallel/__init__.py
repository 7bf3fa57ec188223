"""Multi-device parallelism: device meshes, sharded likelihood, chains.

The reference is strictly single-GPU (SURVEY.md §2.3). The TPU rebuild
introduces two first-class parallel axes over a `jax.sharding.Mesh`:

- "shards": the contact-matrix nnz axis. COO pixel arrays are sharded
  across devices; each device reduces its partial log-likelihood and XLA
  merges them with psum over ICI (replacing the reference's single-device
  atomicAdd trees).
- "chains": independent MCMC chains (and the candidate-mutation batch),
  data-parallel across devices. The chains engine is
  `sampler.device_sweep.MultiChainSweep`, driven by
  `Scaffolder(chains=C)` / `instagraal --chains`.

Multi-host runs initialize jax.distributed and use the same mesh over
the global device set; all code here is expressed with NamedSharding +
jit so XLA inserts the collectives.
"""

from .mesh import make_mesh, shard_coo, replicate  # noqa: F401
from .likelihood import make_sharded_likelihood  # noqa: F401
