"""instagraal_tpu — a TPU-native Hi-C genome scaffolding framework.

A from-scratch rebuild of the capabilities of instaGRAAL (Baudry et al.,
Genome Biology 2020) designed for TPU hardware: the MCMC scaffolder's inner
loop runs as batched JAX/XLA computations over an HBM-resident sparse Hi-C
contact matrix, candidate structural mutations are scored in parallel on
device, and multi-chip scaling uses `jax.sharding` meshes with psum-merged
likelihood partial sums.

Pipeline stages (mirroring the reference CLI surface,
/root/reference/pyproject.toml:89-96):

  instagraal-pre   : FASTA + Hi-C pairs -> fragment contact matrix files
  instagraal       : multi-resolution pyramid + MCMC scaffolder -> genome.fasta
  instagraal-polish: scaffold correction heuristics
  instagraal-post  : liftover, .cool/.mcool generation, P(s) curves
  instagraal-stats : assembly statistics
"""

__version__ = "0.1.0"
