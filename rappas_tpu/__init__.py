"""rappas-tpu: a TPU-native phylo-kmer phylogenetic placement framework.

A from-scratch re-design of the capabilities of phylo42/RAPPAS
(Linard, Swenson, Pardi - Bioinformatics 35(18), 2019) for TPU hardware:

* the phylo-kmer database is a dense / CSR tensor resident in HBM,
* reads are 2-bit packed and scored by a batched gather + accumulate
  (JAX/XLA + Pallas kernels) instead of a per-read Java hash loop,
* multi-chip scaling uses ``jax.sharding`` meshes (data-parallel reads,
  edge-sharded DB) with XLA collectives.

The two phases mirror the reference CLI contract:

1. DB build (``-p b``): ghost-node injection into the reference tree,
   external ancestral reconstruction (PhyML / RAxML-ng / PAML), and
   branch-and-bound phylo-kmer enumeration (vectorised frontier expansion).
2. Placement (``-p p``): stream query reads, score per-edge, emit jplace.
"""

__version__ = "0.1.0"

from rappas_tpu.alphabet import DNA, AA, Alphabet  # noqa: F401
