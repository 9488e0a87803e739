"""Mesh-aware placement engine: the CLI's multi-chip path.

The reference is single-threaded with explicit "TODO PARALLELIZED
VERSION" markers (``PlacementProcess.java:1239-1241``,
``Main_PLACEMENT_v07.java:245``); here multi-chip placement is a
first-class engine (SURVEY.md section 2.8) that plugs into
``place.pipeline.place_queries`` wherever the single-chip engine does,
with the full feature set (all three table layouts, IUPAC ambiguity
expansion, the packed fast path).

* **dense modes (direct / compact)** -- plain GSPMD: read batches are
  sharded over the ``dp`` mesh axis, the delta matrix over its *edge*
  column axis on ``mp``; XLA's partitioner inserts the mp all-gather
  before top-k from the sharding annotations alone.  Ambiguity specs
  are replicated (windows are rare) and their scatter-adds partition
  over the sharded accumulator.
* **postings mode (large trees)** -- the explicit shard_map pipeline of
  :mod:`rappas_tpu.parallel.postings_sharded`: postings edge-range
  sharded so per-edge sums are complete per chip, exact global top-k
  via a tiny candidate all-gather; ambiguity windows are computed per
  shard over its local edge range.

The table auto-selection budget scales with ``mp``: a DB too big for
one chip's HBM is exactly why the mp axis exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rappas_tpu.db import PhyloKmerDB
from rappas_tpu.parallel.postings_sharded import PostingsShardedPlacement
from rappas_tpu.place.engine import PendingBatch, PlacementEngine


class ShardedEngine(PlacementEngine):
    """Drop-in ``PlacementEngine`` over a (dp, mp) device mesh."""

    def __init__(self, db: PhyloKmerDB, mesh: Mesh,
                 keep_at_most: int = 7,
                 treat_ambiguities: bool = True,
                 ambiguities_with_max: bool = False,
                 table: str = "auto", postings_width: int = 8):
        from rappas_tpu.utils import enable_compile_cache
        enable_compile_cache()
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        self.mp = mesh.shape["mp"]
        # sharded mode is f32-only: strict parity with the single-chip
        # default, and the postings sort payload needs exact deltas
        self._init_params(db, keep_at_most, treat_ambiguities,
                          ambiguities_with_max, "f32")
        table = self.resolve_table(db, table, "f32",
                                   self.DIRECT_BYTE_LIMIT * self.mp,
                                   postings_width)
        self.table = table
        self.scale = jnp.float32(1)
        if table == "direct":
            dense = self._pad_cols(db.dense_matrix(pad_rows=1))
            self.n_rows = dense.shape[0]
            self.D = jax.device_put(dense, self._sh(None, "mp"))
            self.keys_dev = None
            self._postings = None
        elif table == "compact":
            dense = self._pad_cols(db.compact_matrix(pad_rows=1))
            self.n_rows = dense.shape[0]
            self.D = jax.device_put(dense, self._sh(None, "mp"))
            if db.alphabet.n_states ** db.k <= 2 ** 31 - 1:
                self.keys_dev = jax.device_put(
                    db.keys.astype(np.int32), self._sh())
            else:
                # >31-bit key space: host lookup, int32 rows to device
                # (see PlacementEngine -- no x64 on device)
                self.keys_dev = None
                self._host_lookup = True
            self._postings = None
        elif table == "postings":
            self._postings = PostingsShardedPlacement(
                db, mesh, keep_at_most=keep_at_most,
                postings_width=postings_width)
            self.D = None
            self.keys_dev = None
        else:
            raise ValueError(f"table must be auto/direct/compact/"
                             f"postings, got {table!r}")
        self._init_host_codec()

    # -------------------------------------------------------------- #
    def _sh(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def _pad_cols(self, dense: np.ndarray) -> np.ndarray:
        """Pad the edge axis to a multiple of mp (device_put needs
        divisible shard dims).  Padded columns stay all-zero, so they
        are never matched (acc == 0) and never reach top-k."""
        pad = (-dense.shape[1]) % self.mp
        return np.pad(dense, ((0, 0), (0, pad))) if pad else dense

    def _put_batch(self, x):
        x = np.asarray(x)
        if x.shape[0] % self.dp:
            raise ValueError(
                f"batch size {x.shape[0]} not divisible by dp={self.dp}"
                " (use a batch size that is a multiple of dp)")
        return jax.device_put(x, self._sh("dp", *([None] * (x.ndim - 1))))

    def _put_repl(self, x):
        return jax.device_put(np.asarray(x), self._sh())

    # -------------------------------------------------------------- #
    def score_async(self, matrix: np.ndarray,
                    lengths: np.ndarray) -> PendingBatch:
        if self.table != "postings":
            # dense modes: the inherited pipeline, GSPMD-partitioned
            # through the _put hooks above
            return super().score_async(matrix, lengths)
        B, L = matrix.shape
        if L < self.k:
            K = min(self.keep_at_most, self.db.n_edge_slots)
            import numpy as _np
            from rappas_tpu.place.engine import BatchResult
            return PendingBatch(BatchResult(
                _np.full((B, K), -1, _np.int32),
                _np.full((B, K), -_np.inf, _np.float32),
                _np.zeros((B, K), _np.float32),
                _np.zeros(B, _np.int32)))
        codes = self.encode_batch(matrix)
        amb = (self._expand_ambiguities_host(codes, matrix, lengths)
               if self.treat_ambiguities else None)
        out = self._postings.score_async(codes, lengths.astype(np.int32),
                                         amb_host=amb)
        for o in out:
            o.copy_to_host_async()
        return PendingBatch(out)
