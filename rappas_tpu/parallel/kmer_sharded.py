"""K-mer-range DB sharding: model parallelism for the phylo-kmer table.

The complement of edge-sharding (``rappas_tpu.parallel.mesh``) for DBs
whose *row* space dwarfs HBM (k=12 DNA, 4000-taxon trees -- the "large
regime" configs of BASELINE.json): the sorted key array and its compact
posting matrix are split into contiguous key ranges across the ``mp``
mesh axis.  Every chip looks up the full query stream against its own
range (misses hit the zero pad row), accumulates a partial ``[B, E]``
score tile, and a single ``psum`` over ``mp`` merges the partials --
k-mers are globally unique, so exactly one chip contributes each posting
(SURVEY.md section 2.8, item 2).

Built with ``shard_map`` so the collective is explicit; reads remain
data-parallel over ``dp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from rappas_tpu.db import PhyloKmerDB
from rappas_tpu.place.engine import (BatchResult, accumulate, finalize,
                                     host_kmer_indices, searchsorted_rows)


class KmerShardedPlacement:
    """Placement with the compact table sharded by k-mer range over mp.

    The sorted-key search runs once on HOST (numpy int64 -- TPUs have no
    native int64 and keys need >31 bits at amino k >= 8); the device
    receives *global* int32 row ids and each shard folds them into its
    own range with two compares (out-of-range -> the shard's zero pad
    row).  This also deletes the per-shard duplicate searchsorted the
    first design paid.
    """

    def __init__(self, db: PhyloKmerDB, mesh: Mesh,
                 keep_at_most: int = 7):
        self.db = db
        self.mesh = mesh
        self.k = db.k
        self.keep_at_most = keep_at_most
        self.thr = jnp.float32(db.thr_log10)
        mp = mesh.shape["mp"]

        # split the compact matrix into mp equal-count row ranges
        n = db.n_kmers
        per = -(-n // mp)
        compact = db.compact_matrix(pad_rows=0)
        E = compact.shape[1]
        # per-shard compact matrix + 1 pad (miss) row
        D_sh = np.zeros((mp, per + 1, E), np.float32)
        for i in range(mp):
            lo, hi = i * per, min((i + 1) * per, n)
            if hi > lo:
                D_sh[i, :hi - lo] = compact[lo:hi]
        self.n_local_rows = per + 1
        self._per = per

        self.D = jax.device_put(
            D_sh, NamedSharding(mesh, P("mp", None, None)))

        k, K = self.k, keep_at_most
        thr = self.thr

        def shard_step(D_local, rows, lengths):
            # D_local [1, per+1, E], rows [B/dp, Q] GLOBAL row ids
            # (miss -> n), lengths [B/dp]
            i = jax.lax.axis_index("mp")
            local = rows - i * per
            hit = (local >= 0) & (local < per)
            rows_local = jnp.where(hit, local, per)
            acc = accumulate(D_local[0], rows_local)
            acc = jax.lax.psum(acc, "mp")
            return finalize(acc, lengths, thr, k, K)

        self._step = jax.jit(shard_map(
            shard_step, mesh=mesh,
            in_specs=(P("mp", None, None), P("dp", None), P("dp")),
            out_specs=(P("dp", None), P("dp", None), P("dp", None),
                       P("dp"))))

    def score(self, codes: np.ndarray, lengths: np.ndarray) -> BatchResult:
        kidx = host_kmer_indices(codes, lengths, self.k,
                                 self.db.alphabet.n_states)
        rows = searchsorted_rows(self.db.keys, kidx)
        te, ts, lwr, nm = self._step(self.D, jnp.asarray(rows),
                                     jnp.asarray(lengths))
        return BatchResult(np.asarray(te), np.asarray(ts),
                           np.asarray(lwr), np.asarray(nm))
