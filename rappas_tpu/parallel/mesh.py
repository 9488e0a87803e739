"""Multi-chip placement: data-parallel reads x edge-sharded DB.

The reference is single-threaded (``PlacementProcess.java:131,568`` carry
the "TODO PARALLELIZED VERSION" markers); parallelism here is designed
TPU-first (SURVEY.md section 2.8):

* **dp axis**: read batches are sharded across chips -- reads are
  embarrassingly parallel;
* **mp axis**: the dense delta matrix ``D[S^k+1, E]`` is sharded over its
  *edge* column axis when it exceeds per-chip HBM (large trees / large k);
  each chip accumulates scores for its edge shard and the top-k runs on
  the all-gathered ``[B_local, E]`` row -- XLA's GSPMD partitioner inserts
  the all-gather over ICI from the sharding annotations alone.

For small DBs use ``mp=1`` (fully replicated D, pure DP): zero
communication in the hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rappas_tpu.db import PhyloKmerDB
from rappas_tpu.place.engine import BatchResult, accumulate, finalize, \
    kmer_rows


def make_mesh(devices=None, dp: int | None = None,
              mp: int = 1) -> Mesh:
    """Build a (dp, mp) mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp*mp = {dp}*{mp} != {n} devices")
    arr = np.array(devices).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


class ShardedPlacement:
    """Placement step jitted over a (dp, mp) mesh.

    ``D`` lives sharded over edges on the mp axis and replicated over dp;
    read batches are sharded over dp.  Collectives (the mp all-gather
    before top-k) are inserted by XLA from the shardings.
    """

    def __init__(self, db: PhyloKmerDB, mesh: Mesh,
                 keep_at_most: int = 7):
        self.db = db
        self.mesh = mesh
        self.k = db.k
        self.keep_at_most = keep_at_most
        self.thr = jnp.float32(db.thr_log10)
        dense = db.dense_matrix(pad_rows=1)
        # pad E up to a multiple of the mp axis
        mp = mesh.shape["mp"]
        E = dense.shape[1]
        pad = (-E) % mp
        if pad:
            dense = np.pad(dense, ((0, 0), (0, pad)))
        self.n_rows = dense.shape[0]
        self.d_sharding = NamedSharding(mesh, P(None, "mp"))
        self.batch_sharding = NamedSharding(mesh, P("dp", None))
        self.len_sharding = NamedSharding(mesh, P("dp"))
        self.replicated = NamedSharding(mesh, P())
        self.D = jax.device_put(dense, self.d_sharding)

        k, n_states, n_rows, K = (self.k, db.alphabet.n_states,
                                  self.n_rows, keep_at_most)

        def step(D, codes, lengths, thr):
            rows = kmer_rows(codes, k, n_states, n_rows)
            acc = accumulate(D, rows)
            return finalize(acc, lengths, thr, k, K)

        out_shard = NamedSharding(mesh, P("dp", None))
        self._step = jax.jit(
            step,
            in_shardings=(self.d_sharding, self.batch_sharding,
                          self.len_sharding, self.replicated),
            out_shardings=(out_shard, out_shard, out_shard,
                           NamedSharding(mesh, P("dp"))))

    # -------------------------------------------------------------- #
    def score(self, codes: np.ndarray, lengths: np.ndarray) -> BatchResult:
        """codes: int8[B, L] state codes (B divisible by dp)."""
        codes = jax.device_put(jnp.asarray(codes), self.batch_sharding)
        lengths = jax.device_put(jnp.asarray(lengths), self.len_sharding)
        te, ts, lwr, nm = self._step(self.D, codes, lengths, self.thr)
        return BatchResult(np.asarray(te), np.asarray(ts),
                           np.asarray(lwr), np.asarray(nm))
