"""TPU placement engine: batched k-mer scoring as gather + accumulate.

The reference scores one read at a time through a Java hash map
(``PlacementProcess.java:568-764``).  Here the phylo-kmer table is a dense
delta matrix ``D[S^k + 1, E]`` resident in HBM (``E`` = per-node score
slots of the original tree, last row all-zero = miss/padding target), and
a whole batch of reads is scored at once:

    ``S[b, e] = Q_b * thr + sum_q D[kmer(b, q), e]``

which is algebraically the reference's incremental update
(``S[x] += Q*thr`` at first encounter, ``+= pp - thr`` per match,
``PlacementProcess.java:726-734``).  Absent (kmer, edge) entries are 0 in
``D``; present entries are ``delta = pp - thr`` clamped to a tiny positive
value so "edge was matched" is recoverable as ``acc > 0`` without a
second counter tensor (see ``rappas_tpu.db``).

Everything after the gather -- top-k (keep-at-most), likelihood weight
ratios with underflow shift (``PlacementProcess.java:384-451``) -- also
runs on device.  IUPAC-ambiguous k-mer windows take a secondary gather
pass implementing the mean / max combination modes
(``PlacementProcess.java:1129-1236``).

Design notes (TPU):
* the inner loop is a ``lax.scan`` over k-mer slots, each step gathering
  a ``[B, E]`` tile of rows and adding -- HBM-bandwidth bound, never
  materialising ``[B, Q, E]``;
* k-mer indices are computed on device from int8 base codes (k shifted
  adds), so the host ships 1 byte/base;
* batch and length are bucketed so XLA compiles a handful of shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rappas_tpu.db import PhyloKmerDB

PAD_CODE = -2     # beyond read end
AMBIG_CODE = -1   # IUPAC ambiguity position


class BatchResult(NamedTuple):
    """Device outputs for one read batch (host arrays after fetch)."""
    top_edges: np.ndarray   # int32[B, K] original-tree node ids (-1 pad)
    top_scores: np.ndarray  # float32[B, K] descending
    top_lwr: np.ndarray     # float32[B, K]
    n_matched: np.ndarray   # int32[B] = |L| per read


class PendingBatch:
    """Handle for an in-flight scored batch."""

    def __init__(self, out):
        self._out = out

    def result(self) -> BatchResult:
        if isinstance(self._out, BatchResult):
            return self._out
        te, ts, lwr, nm = self._out
        return BatchResult(np.asarray(te), np.asarray(ts),
                           np.asarray(lwr), np.asarray(nm))


# ====================================================================== #
# device kernels (jit)
# ====================================================================== #

@functools.partial(jax.jit, static_argnames=("k", "n_states", "n_rows"))
def kmer_rows(codes: jax.Array, k: int, n_states: int,
              n_rows: int) -> jax.Array:
    """[B, L] int8 codes -> [B, Q] int32 row indices into D.

    Windows containing an ambiguity or padding map to the all-zero miss
    row ``n_rows - 1``.
    """
    B, L = codes.shape
    Q = L - k + 1
    c = codes.astype(jnp.int32)
    idx = jnp.zeros((B, Q), jnp.int32)
    valid = jnp.ones((B, Q), bool)
    for i in range(k):
        w = jax.lax.dynamic_slice_in_dim(c, i, Q, axis=1)
        valid &= w >= 0
        idx = idx * n_states + jnp.maximum(w, 0)
    return jnp.where(valid, idx, n_rows - 1)


@functools.partial(jax.jit, static_argnames=("block_q",))
def accumulate(D: jax.Array, rows: jax.Array,
               block_q: int = 16) -> jax.Array:
    """sum_q D[rows[:, q], :] -> [B, E] without materialising [B, Q, E].

    Scans over k-mer slots in blocks of ``block_q`` (each step gathers a
    [B, block_q, E] tile and reduces it, keeping the working set small
    while amortising scan overhead).  ``block_q=16`` measured fastest
    for the full placement step (A/B vs a single whole-axis gather+sum:
    13.2 ms vs 22.6 ms at B=16k, Q=143, E=304 -- the big gather only
    wins in isolation where XLA fuses the reduce into it).

    When D is uint16 fixed-point (see ``PhyloKmerDB.dense_matrix_u16``)
    the sum of quantised deltas is < 2^24, so f32 accumulation is exact;
    the caller applies the scale once to the result.
    """
    B, Q = rows.shape
    E = D.shape[1]
    pad = (-Q) % block_q
    if pad:
        # extra slots hit the miss row (last row of D, all zeros)
        rows = jnp.concatenate(
            [rows, jnp.full((B, pad), D.shape[0] - 1, rows.dtype)], axis=1)
    nblocks = rows.shape[1] // block_q
    rows_t = rows.reshape(B, nblocks, block_q).transpose(1, 0, 2)

    def step(acc, r):
        return acc + D[r].astype(jnp.float32).sum(axis=1), None

    # seed the carry from the operands rather than a literal zeros: under
    # shard_map the carry must match the body output's varying-axes type
    # (D varies over the table-shard axis, rows over the data axis);
    # numerically this adds zeros (D's miss row is all-zero)
    init = (rows[:, :1] * 0).astype(jnp.float32) + \
        D[-1].astype(jnp.float32)[None, :]
    acc, _ = jax.lax.scan(step, init, rows_t)
    return acc


@functools.partial(jax.jit, static_argnames=("k", "n_states", "n_rows",
                                             "length"))
def kmer_rows_packed(packed: jax.Array, lengths: jax.Array, k: int,
                     n_states: int, n_rows: int, length: int) -> jax.Array:
    """2-bit packed reads -> [B, Q] row indices (pure-ACGT fast path).

    packed: uint8[B, ceil(L/4)], base i at bits (2*(i%4)) of byte i//4.
    Windows past ``lengths[b] - k`` map to the miss row.
    """
    B = packed.shape[0]
    L = length
    Q = L - k + 1
    p32 = packed.astype(jnp.int32)
    shifts = jnp.array([0, 2, 4, 6], jnp.int32)
    codes = ((p32[:, :, None] >> shifts[None, None, :]) & 3)
    codes = codes.reshape(B, -1)[:, :L]
    idx = jnp.zeros((B, Q), jnp.int32)
    for i in range(k):
        idx = idx * n_states + jax.lax.dynamic_slice_in_dim(codes, i, Q,
                                                            axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
    valid = pos <= (lengths[:, None] - k)
    return jnp.where(valid, idx, n_rows - 1)


@functools.partial(jax.jit, static_argnames=("k", "n_states"))
def kmer_indices64(codes: jax.Array, k: int, n_states: int) -> jax.Array:
    """[B, L] int8 codes -> [B, Q] k-mer indices, -1 for windows
    containing ambiguity/padding.  Used by the compact-table mode where
    ``n_states**k`` exceeds the dense-row space (protein mode, large k).
    int32 when the index space fits, else int64 (requires x64 -- the
    engine enables it).
    """
    B, L = codes.shape
    Q = L - k + 1
    dtype = jnp.int32 if n_states ** k <= 2 ** 31 - 1 else jnp.int64
    c = codes.astype(dtype)
    idx = jnp.zeros((B, Q), dtype)
    valid = jnp.ones((B, Q), bool)
    for i in range(k):
        w = jax.lax.dynamic_slice_in_dim(c, i, Q, axis=1)
        valid &= w >= 0
        idx = idx * n_states + jnp.maximum(w, 0)
    return jnp.where(valid, idx, dtype(-1))


@jax.jit
def compact_rows(keys: jax.Array, idx: jax.Array) -> jax.Array:
    """Map k-mer indices to compact table rows via binary search.

    keys: int64[n_keys] sorted unique k-mer indices present in the DB.
    idx: int64[...] query indices (-1 = invalid).
    Returns int32 rows into ``D_compact[n_keys + 1, E]``; misses and
    invalid queries map to the all-zero last row.
    """
    n = keys.shape[0]
    pos = jnp.searchsorted(keys, idx)
    hit = (pos < n) & (keys[jnp.clip(pos, 0, n - 1)] == idx) & (idx >= 0)
    return jnp.where(hit, pos, n).astype(jnp.int32)


def pack_reads(codes: np.ndarray) -> np.ndarray:
    """Host-side 2-bit packing of int8 state codes (no ambiguities);
    negative codes pack as 0 (their windows are masked by length)."""
    B, L = codes.shape
    safe = np.where(codes < 0, 0, codes).astype(np.uint8)
    pad = (-L) % 4
    if pad:
        safe = np.pad(safe, ((0, 0), (0, pad)))
    quads = safe.reshape(B, -1, 4)
    return (quads[:, :, 0] | (quads[:, :, 1] << 2) |
            (quads[:, :, 2] << 4) | (quads[:, :, 3] << 6)).astype(np.uint8)


@functools.partial(jax.jit, static_argnames=("k", "keep_at_most"))
def finalize(acc: jax.Array, lengths: jax.Array, thr: jax.Array,
             k: int, keep_at_most: int):
    """acc [B, E] -> top-k edges, scores, LWR, match count.

    Scores: ``S = Q*thr + acc`` with ``Q = len - k + 1``
    (``PlacementProcess.java:726-734``); unmatched edges (acc == 0) are
    excluded, reproducing the reference's candidate list L
    (``PlacementProcess.java:493-496,719-735``).

    LWR over the top ``min(K, |L|)`` rows with a max-shift -- equivalent
    to the reference's conditional shift (``computeWeightRatioShift``,
    ``PlacementProcess.java:384-394``) but always applied, which is the
    f32-safe formulation.
    """
    B, E = acc.shape
    Q = (lengths - (k - 1)).astype(jnp.float32)
    matched = acc > 0
    n_matched = matched.sum(axis=1).astype(jnp.int32)
    scores = Q[:, None] * thr + acc
    masked = jnp.where(matched, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, min(keep_at_most, E))
    valid = jnp.isfinite(top_scores)
    shift = top_scores[:, :1]
    w = jnp.where(valid, jnp.exp2((top_scores - shift) *
                                  np.float32(np.log2(10.0))), 0.0)
    lwr = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-30)
    top_edges = jnp.where(valid, top_idx, -1).astype(jnp.int32)
    return top_edges, top_scores, lwr, n_matched


@jax.jit
def ambiguous_pass(D: jax.Array, scale: jax.Array, alt_rows: jax.Array,
                   alt_win: jax.Array, win_read: jax.Array,
                   win_inv_w: jax.Array, win_is_mean: jax.Array,
                   acc: jax.Array) -> jax.Array:
    """Add ambiguous-window contributions into ``acc``.

    alt_rows  int32[n_alt]: D row per alternative k-mer (miss row = pad)
    alt_win   int32[n_alt]: window id per alternative
    win_read  int32[n_win]: read index per window
    win_inv_w f32[n_win]:   1 / W_size per window
    win_is_mean bool[n_win]: mean mode (True) or max mode

    Mean (``treatAmbiguitiesWithMean``, ``PlacementProcess.java:
    1129-1174``): ``contrib = log10(sum_alt 10^delta / W)`` -- an absent
    alternative contributes ``10^0 = 1``, exactly the reference's
    ``(W - C_amb) * PP*_thr`` term divided by the threshold.

    Max (``treatAmbiguitiesWithMax``, ``:1185-1236``):
    ``contrib = max_alt delta`` (0 if nothing matched).
    """
    n_win = win_read.shape[0]
    rows = D[alt_rows].astype(jnp.float32) * scale   # [n_alt, E] deltas
    ten = jnp.exp2(rows * np.float32(np.log2(10.0)))
    sums = jax.ops.segment_sum(ten, alt_win, num_segments=n_win)
    maxs = jax.ops.segment_max(rows, alt_win, num_segments=n_win)
    mean_contrib = jnp.log2(jnp.maximum(
        sums * win_inv_w[:, None], 1e-30)) * np.float32(1.0 / np.log2(10.0))
    contrib = jnp.where(win_is_mean[:, None], mean_contrib, maxs)
    contrib = jnp.maximum(contrib, 0.0)
    return acc + jax.ops.segment_sum(contrib, win_read,
                                     num_segments=acc.shape[0])


# ====================================================================== #
# host-side engine
# ====================================================================== #

class PlacementEngine:
    #: byte budget for the direct-indexed dense table; above it the
    #: compact binary-search table takes over (protein mode, large k,
    #: big trees) -- the TPU analog of the reference's choice between
    #: direct capacity 4^k/2 and hashed storage
    #: (CustomHash_v4_FastUtil81.java:49-63).  Half of a v5e's 16 GB HBM
    #: by default, leaving room for batches and XLA scratch.
    DIRECT_BYTE_LIMIT = 8 << 30

    def __init__(self, db: PhyloKmerDB, keep_at_most: int = 7,
                 treat_ambiguities: bool = True,
                 ambiguities_with_max: bool = False,
                 device=None, precision: str = "f32",
                 table: str = "auto"):
        from rappas_tpu.utils import enable_compile_cache
        enable_compile_cache()
        self.db = db
        self.k = db.k
        self.alphabet = db.alphabet
        self.keep_at_most = keep_at_most
        self.treat_ambiguities = treat_ambiguities
        self.ambiguities_with_max = ambiguities_with_max
        self.precision = precision
        self.thr = jnp.float32(db.thr_log10)
        if table == "auto":
            itemsize = 2 if precision == "u16" else 4
            dense_bytes = (self.alphabet.n_states ** self.k *
                           db.n_edge_slots * itemsize)
            compact_bytes = (db.n_kmers + 1) * db.n_edge_slots * itemsize
            table = ("direct" if dense_bytes <= max(
                self.DIRECT_BYTE_LIMIT, 2 * compact_bytes) else "compact")
        self.table = table
        if (table == "compact" and
                self.alphabet.n_states ** self.k > 2 ** 31 - 1 and
                not jax.config.read("jax_enable_x64")):
            # k-mer indices need >31 bits (e.g. amino k=8: 20^8); jax
            # truncates int64 to int32 unless x64 is on.  int64 lookups
            # are emulated on TPU -- acceptable for the protein niche.
            jax.config.update("jax_enable_x64", True)
        if precision not in ("f32", "u16"):
            raise ValueError(f"precision must be f32 or u16, got "
                             f"{precision!r}")
        if table == "direct":
            if precision == "u16":
                dense, scale = db.dense_matrix_u16(pad_rows=1)
            else:
                dense, scale = db.dense_matrix(pad_rows=1), np.float32(1)
            self.keys_dev = None
        elif table == "compact":
            if precision == "u16":
                dense, scale = db.compact_matrix_u16(pad_rows=1)
            else:
                dense, scale = db.compact_matrix(pad_rows=1), np.float32(1)
            keys = db.keys
            if self.alphabet.n_states ** self.k <= 2 ** 31 - 1:
                keys = keys.astype(np.int32)
            self.keys_dev = jax.device_put(keys, device)
        else:
            raise ValueError(f"table must be auto/direct/compact, got "
                             f"{table!r}")
        self.scale = jnp.float32(scale)
        self.n_rows = dense.shape[0]
        self.D = jax.device_put(dense, device)
        # max ambiguities per k-mer: floor(k^(1/S))
        # (AmbigSequenceKnife.java:95)
        self.max_ambig = int(np.floor(
            self.k ** (1.0 / self.alphabet.n_states)))
        # host code table: ASCII -> state code / AMBIG / invalid
        a = self.alphabet
        tab = np.full(256, PAD_CODE, np.int8)
        valid = a.char_to_code != 255
        tab[valid] = a.char_to_code[valid].astype(np.int8)
        tab[a.is_ambiguous_table] = AMBIG_CODE
        self._code_tab = tab
        # per-ambiguity-char alternative lists (state codes)
        self._amb_alts = {ord(c): a.ambiguity_codes(c)
                          for c in a.ambiguities}
        for c in list(a.ambiguities):
            self._amb_alts[ord(c.lower())] = a.ambiguity_codes(c)

    # -------------------------------------------------------------- #
    def encode_batch(self, matrix: np.ndarray) -> np.ndarray:
        """ASCII uint8 [B, L] (0xFF padded) -> int8 codes."""
        return self._code_tab[matrix]

    # -------------------------------------------------------------- #
    def score(self, matrix: np.ndarray, lengths: np.ndarray) -> BatchResult:
        return self.score_async(matrix, lengths).result()

    def score_async(self, matrix: np.ndarray,
                    lengths: np.ndarray) -> "PendingBatch":
        """Dispatch scoring and start device->host copies without
        blocking; call ``.result()`` on the returned handle.  Lets the
        host pipeline several batches against the device (compute and
        transfers overlap)."""
        B, L = matrix.shape
        if L < self.k:
            # no window fits: every read is unplaced
            K = min(self.keep_at_most, self.db.n_edge_slots)
            return PendingBatch(BatchResult(
                np.full((B, K), -1, np.int32),
                np.full((B, K), -np.inf, np.float32),
                np.zeros((B, K), np.float32),
                np.zeros(B, np.int32)))
        codes = self.encode_batch(matrix)
        if self.table == "direct":
            rows = kmer_rows(jnp.asarray(codes), self.k,
                             self.alphabet.n_states, self.n_rows)
        else:
            idx = kmer_indices64(jnp.asarray(codes), self.k,
                                 self.alphabet.n_states)
            rows = compact_rows(self.keys_dev, idx)
        acc = accumulate(self.D, rows) * self.scale
        if self.treat_ambiguities:
            amb = self._expand_ambiguities(codes, matrix, lengths)
            if amb is not None:
                acc = ambiguous_pass(self.D, self.scale, *amb, acc)
        out = finalize(acc, jnp.asarray(lengths), self.thr,
                       self.k, self.keep_at_most)
        for o in out:
            o.copy_to_host_async()
        return PendingBatch(out)

    # -------------------------------------------------------------- #
    def _expand_ambiguities(self, codes: np.ndarray, matrix: np.ndarray,
                            lengths: np.ndarray):
        """Expand IUPAC windows into alternative k-mer rows (host side).

        Alternative generation reproduces the reference's cycling scheme
        (``AmbigSequenceKnife.java:240-258``): for W = prod(|alts_p|)
        alternatives, ambiguous position p takes ``alts_p[j mod |alts_p|]``
        in alternative j.  (For a single ambiguous position -- the only
        case reachable with default k -- this is the exact cartesian
        expansion; with several it reproduces the reference's diagonal
        enumeration including its duplicates.)
        """
        k, S = self.k, self.alphabet.n_states
        amb_mask = codes == AMBIG_CODE
        if not amb_mask.any():
            return None
        weights = S ** np.arange(k - 1, -1, -1, dtype=np.int64)
        alt_rows, alt_win = [], []
        win_read, win_inv_w = [], []
        n_win = 0
        is_mean = not self.ambiguities_with_max
        for b in np.flatnonzero(amb_mask.any(axis=1)):
            L = int(lengths[b])
            Q = L - k + 1
            if Q <= 0:
                continue
            row_amb = amb_mask[b, :L]
            counts = np.convolve(row_amb, np.ones(k, np.int32),
                                 "valid")  # per-window ambiguity count
            bad = np.convolve(codes[b, :L] == PAD_CODE,
                              np.ones(k, np.int32), "valid") > 0
            for q in np.flatnonzero((counts > 0) &
                                    (counts <= self.max_ambig) & ~bad):
                window = codes[b, q:q + k].astype(np.int64)
                amb_pos = np.flatnonzero(window < 0)
                alts = [self._amb_alts[int(matrix[b, q + p])]
                        for p in amb_pos]
                W = int(np.prod([len(x) for x in alts]))
                variants = np.repeat(window[None, :], W, axis=0)
                for p, al in zip(amb_pos, alts):
                    variants[:, p] = np.asarray(al)[
                        np.arange(W) % len(al)]
                kidx = variants @ weights
                if self.table == "compact":
                    nk = self.db.n_kmers
                    pos = np.searchsorted(self.db.keys, kidx)
                    hit = (pos < nk) & (self.db.keys[
                        np.clip(pos, 0, nk - 1)] == kidx)
                    kidx = np.where(hit, pos, nk)
                alt_rows.append(kidx)
                alt_win.append(np.full(W, n_win, np.int32))
                win_read.append(b)
                win_inv_w.append(1.0 / W)
                n_win += 1
        if n_win == 0:
            return None
        return (jnp.asarray(np.concatenate(alt_rows).astype(np.int32)),
                jnp.asarray(np.concatenate(alt_win)),
                jnp.asarray(np.array(win_read, np.int32)),
                jnp.asarray(np.array(win_inv_w, np.float32)),
                jnp.full(n_win, is_mean, bool))
