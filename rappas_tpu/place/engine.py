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

Three device table layouts (auto-selected by byte budget):
* ``direct``  -- ``D[S^k + 1, E]``, row index == k-mer index (DNA,
  small k): no lookup at all;
* ``compact`` -- ``D[n_kmers + 1, E]`` + binary search over the sorted
  key array (protein mode, large k);
* ``postings`` -- large-tree regime (``E`` in the thousands, BASELINE
  configs 3/5) where any dense-over-edges row is too wide: k-mers with
  <= P postings live in fixed-width ``[n_light+1, P]`` edge/delta
  tables scored by sort + segment-sum (:func:`finalize_postings`);
  the heavy tail (conserved k-mers hitting many edges) stays dense.
  Gather traffic drops from ~Q*E*4 to ~Q*P*8 bytes per read.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rappas_tpu.db import LIGHT_PAD_EDGE, PhyloKmerDB

PAD_CODE = -2     # beyond read end
AMBIG_CODE = -1   # IUPAC ambiguity position


class BatchResult(NamedTuple):
    """Device outputs for one read batch (host arrays after fetch)."""
    top_edges: np.ndarray   # int32[B, K] original-tree node ids (-1 pad)
    top_scores: np.ndarray  # float32[B, K] descending
    top_lwr: np.ndarray     # float32[B, K]
    n_matched: np.ndarray   # int32[B] = |L| per read


@jax.jit
def pack_wire(te: jax.Array, ts: jax.Array, lwr: jax.Array,
              nm: jax.Array):
    """Byte-lean single-array D2H wire format (round 5): ONE int32
    [B, K + ceil(K/2) + 1] tensor per batch -- scores bit-cast f32,
    edge ids packed two-u16-per-word (sentinel 65535 = no edge), |L|.
    LWR is dropped and recomputed on host from the exact scores with
    the same FORMULA as :func:`finalize` (host np.exp2 may differ from
    the device exp2 by 1 ulp, so emitted like_weight_ratio text can
    differ in the last digit from a non-wire engine -- inside the
    documented f32 parity tolerance; see PARITY.md).  88 -> 48 B/read
    at K=7, and ONE result fetch per batch instead of four: the
    tunneled dev backend pays a fixed per-fetch cost, which had become
    the largest remaining host<->device term of the CLI loop."""
    B, K = te.shape
    edges = jnp.where(te < 0, 65535, te).astype(jnp.uint16)
    if K % 2:
        edges = jnp.concatenate(
            [edges, jnp.full((B, 1), 65535, jnp.uint16)], axis=1)
    ew = jax.lax.bitcast_convert_type(
        edges.reshape(B, -1, 2), jnp.int32)
    sw = jax.lax.bitcast_convert_type(ts, jnp.int32)
    return jnp.concatenate([sw, ew, nm.astype(jnp.int32)[:, None]],
                           axis=1)


def unpack_wire(words, K: int) -> BatchResult:
    """Host-side decode of :func:`pack_wire`; LWR recomputed with the
    same f32 FORMULA :func:`finalize` uses (exp2 of the max-shifted
    scores, normalized; host exp2 vs device exp2 can differ 1 ulp --
    see :func:`pack_wire`)."""
    words = np.asarray(words)
    K2 = (K + 1) // 2
    ts = words[:, :K].copy().view(np.float32)
    edges = words[:, K:K + K2].copy().view(np.uint16)[:, :K]
    nm = words[:, K + K2]
    te = np.where(edges == 65535, -1, edges.astype(np.int32))
    valid = te >= 0
    # -inf - -inf on fully-unplaced rows is nan inside np.where's
    # eagerly-evaluated branch; the mask discards it
    with np.errstate(invalid="ignore"):
        d = np.where(valid, ts - ts[:, :1], np.float32(-np.inf))
    w = np.exp2(d * np.float32(np.log2(10.0)), dtype=np.float32)
    lwr = w / np.maximum(w.sum(axis=1, keepdims=True),
                         np.float32(1e-30))
    return BatchResult(te, ts, lwr.astype(np.float32), nm)


class PendingBatch:
    """Handle for an in-flight scored batch (raw finalize outputs, or
    the packed single-array lean wire when ``wire`` carries its K)."""

    def __init__(self, out, wire: int = 0):
        self._out = out
        self._wire = wire

    def result(self) -> BatchResult:
        if isinstance(self._out, BatchResult):
            return self._out
        if self._wire:
            return unpack_wire(self._out, self._wire)
        te, ts, lwr, nm = self._out
        return BatchResult(np.asarray(te), np.asarray(ts),
                           np.asarray(lwr), np.asarray(nm))


class SplitPending:
    """Pending result assembled from two half-batches (the two-stage
    unique-budget overflow fallback splits oversized batches; reads are
    independent so results just concatenate)."""

    def __init__(self, p1, p2):
        self._parts = (p1, p2)

    def result(self) -> BatchResult:
        r1, r2 = (p.result() for p in self._parts)
        return BatchResult(
            np.concatenate([r1.top_edges, r2.top_edges]),
            np.concatenate([r1.top_scores, r2.top_scores]),
            np.concatenate([r1.top_lwr, r2.top_lwr]),
            np.concatenate([r1.n_matched, r2.n_matched]))


class PipelinedBatch:
    """Handle for a batch riding the postings software pipeline: its
    device program may not be issued yet (the issue is deferred until
    the NEXT batch arrives so its compact-table gather can overlap this
    batch's scoring -- see :func:`finalize_postings_pipelined`).
    ``result()`` flushes the pipeline tail if needed."""

    def __init__(self, engine, entry):
        self._engine = engine
        self._entry = entry

    def result(self) -> BatchResult:
        e = self._entry
        if e["out"] is None:
            self._engine._pp_flush(e)
        te, ts, lwr, nm = e["out"]
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


@functools.partial(jax.jit, static_argnames=("block_q", "streams"))
def accumulate(D: jax.Array, rows: jax.Array,
               block_q: int = 16, streams: int = 4) -> jax.Array:
    """sum_q D[rows[:, q], :] -> [B, E] without materialising [B, Q, E].

    Scans over k-mer slots in blocks of ``block_q`` (each step gathers a
    [B, block_q, E] tile and reduces it, keeping the working set small
    while amortising scan overhead).  ``block_q=16`` measured fastest
    for the full placement step (A/B vs a single whole-axis gather+sum:
    13.2 ms vs 22.6 ms at B=16k, Q=143, E=304 -- the big gather only
    wins in isolation where XLA fuses the reduce into it).

    ``streams``: the batch is split into this many row-groups and each
    scan body issues one independent gather per group.  The v5e gather
    unit overlaps independent gathers a little (two concurrent streams
    run ~1.4-1.5x the serial rate in isolation); on the full scan path
    this is worth ~7%: 7.07 -> 6.58 ns/row at 4 streams
    (scripts/pallas_dma_probe.py, docs/PERF.md round 3).  Bit-exact for
    every read: a read lives in exactly one group and its slot-block
    summation order is unchanged.  Falls back to one stream when B
    does not split evenly.

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
    S = streams if streams > 1 and B % streams == 0 and \
        B >= streams * 8 else 1
    h = B // S
    rows_t = tuple(
        rows[i * h:(i + 1) * h].reshape(h, nblocks, block_q)
        .transpose(1, 0, 2) for i in range(S))

    def step(acc, r):
        return tuple(a + D[x].astype(jnp.float32).sum(axis=1)
                     for a, x in zip(acc, r)), None

    # seed the carry from the operands rather than a literal zeros: under
    # shard_map the carry must match the body output's varying-axes type
    # (D varies over the table-shard axis, rows over the data axis);
    # numerically this adds zeros (D's miss row is all-zero)
    base = D[-1].astype(jnp.float32)[None, :]
    init = tuple((rows[i * h:(i + 1) * h, :1] * 0).astype(jnp.float32) +
                 base for i in range(S))
    accs, _ = jax.lax.scan(step, init, rows_t)
    if S == 1:
        return accs[0]
    return jnp.concatenate(accs, axis=0)


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
    int32 when the index space fits; the engine routes >31-bit spaces
    through a host-side numpy lookup instead (TPUs have no native
    int64), so the int64 branch only serves explicit x64 callers.
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
    if n == 0:  # static: everything misses the (single pad row) table
        return jnp.zeros(idx.shape, jnp.int32)
    pos = jnp.searchsorted(keys, idx)
    hit = (pos < n) & (keys[jnp.clip(pos, 0, n - 1)] == idx) & (idx >= 0)
    return jnp.where(hit, pos, n).astype(jnp.int32)


def host_kmer_indices(codes: np.ndarray, lengths: np.ndarray, k: int,
                      n_states: int) -> np.ndarray:
    """[B, Q] k-mer indices on host (-1 = window contains ambiguity or
    padding) -- numpy mirror of :func:`kmer_indices64`, shared by the
    engine's heavy-hit extraction and the sharded placements.  int32
    when the index space fits (2.4x faster host pass); >31-bit spaces
    run the Horner recurrence as two int32 halves combined once in
    int64 (round 5: the all-int64 pass was ~40 ms of the per-batch
    protein prep)."""
    B, L = codes.shape
    Q = L - k + 1
    amb = np.zeros((B, Q), bool)
    for i in range(k):
        amb |= codes[:, i:i + Q] < 0
    amb |= np.arange(Q)[None, :] > (lengths[:, None] - k)

    def horner(lo_pos, hi_pos, dtype):
        acc = np.zeros((B, Q), dtype)
        for i in range(lo_pos, hi_pos):
            acc *= n_states
            acc += np.maximum(codes[:, i:i + Q], 0).astype(dtype)
        return acc

    if n_states ** k <= 2 ** 31 - 1:
        return np.where(amb, np.int32(-1), horner(0, k, np.int32))
    k2 = k // 2
    if n_states ** max(k2, k - k2) <= 2 ** 31 - 1:
        hi = horner(0, k - k2, np.int32).astype(np.int64)
        lo = horner(k - k2, k, np.int32).astype(np.int64)
        idx = hi * np.int64(n_states ** k2) + lo
    else:       # neither half fits (amino k >= 16): plain int64 pass
        idx = horner(0, k, np.int64)
    return np.where(amb, np.int64(-1), idx)


def searchsorted_rows(keys: np.ndarray, kidx: np.ndarray) -> np.ndarray:
    """Sorted-key lookup: hit -> position, miss -> len(keys) (the
    trailing all-zero pad row) -- host mirror of :func:`compact_rows`."""
    n = keys.shape[0]
    if n == 0:
        return np.zeros(kidx.shape, np.int32)
    pos = np.searchsorted(keys, kidx)
    hit = (pos < n) & (keys[np.clip(pos, 0, n - 1)] == kidx)
    return np.where(hit, pos, n).astype(np.int32)


class HostKeyIndex:
    """Bucketed sorted-key lookup -- the host-side replacement for plain
    ``np.searchsorted`` on BIG key sets (round-4 fix for the 28k reads/s
    protein host ceiling: a 16384-read batch needs ~1.5M lookups in 2M
    sorted int64 keys; 21-probe binary search costs ~590 ms/batch,
    measured scripts/round4_probe.py C).

    A one-time index maps the top key bits to the covering range of the
    sorted key array (``lo[b] .. lo[b+1]``); per batch each query then
    linear-scans its bucket (avg < 1 key with ``2^22`` buckets) with
    vectorized gathers over the still-unresolved subset.  Queries landing
    in rare oversized buckets (> ``scan_cap`` entries) fall back to one
    classic searchsorted over just that subset, so worst-case cost is
    never worse than the plain form.  Typical cost: 2-3 shrinking
    gather+compare passes, ~25 ms/batch (~20x).

    Semantics identical to :func:`searchsorted_rows` (miss -> ``n``,
    including the ``-1`` padding sentinel of ambiguous windows).
    """

    def __init__(self, keys: np.ndarray, n_buckets_log2: int = 22,
                 scan_cap: int = 16):
        self.keys = keys
        self.n = int(keys.shape[0])
        self.scan_cap = scan_cap
        kmax = int(keys[-1]) if self.n else 0
        self.shift = max(0, kmax.bit_length() - n_buckets_log2)
        nb = (kmax >> self.shift) + 2 if self.n else 2
        edges = (np.arange(nb, dtype=np.int64) << self.shift)
        # int32 bucket table: halves the random-access footprint of the
        # per-query probe, measured 82 -> 64 ms per 1.5M misses at 2^22
        # (round 5; a cache-sized SMALLER bucket count measured WORSE --
        # 2^20: 123 ms -- because avg occupancy and scan rounds grow)
        self.lo = np.searchsorted(keys, edges).astype(np.int32)

    def __call__(self, kidx: np.ndarray) -> np.ndarray:
        n = self.n
        flat = kidx.ravel()
        out = np.full(flat.shape, n, np.int32)
        if n == 0:
            return out.reshape(kidx.shape)
        qi = np.flatnonzero((flat >= 0) & (flat <= int(self.keys[-1])))
        q = flat[qi]
        b = (q.astype(np.int64) >> self.shift)
        lo = self.lo[b]
        hi = self.lo[b + 1]
        for _ in range(self.scan_cap):
            active = lo < hi
            if not active.any():
                break
            qi, q, lo, hi = qi[active], q[active], lo[active], hi[active]
            kv = self.keys[lo]
            is_hit = kv == q
            out[qi[is_hit]] = lo[is_hit]
            keep = ~(is_hit | (kv > q))   # sorted: kv > q => q absent
            qi, q, lo, hi = qi[keep], q[keep], lo[keep] + 1, hi[keep]
        else:
            if qi.size:   # oversized buckets: classic search, subset only
                pos = np.searchsorted(self.keys, q)
                is_hit = (pos < n) & (self.keys[np.clip(pos, 0, n - 1)]
                                      == q)
                out[qi[is_hit]] = pos[is_hit]
        return out.reshape(kidx.shape)


#: keys below this size keep plain searchsorted (index build not worth it)
_KEY_INDEX_MIN = 1 << 16


def make_key_lookup(keys: np.ndarray):
    """Callable ``kidx -> rows`` with :func:`searchsorted_rows` semantics,
    bucket-indexed when the key set is big enough to pay for it."""
    if keys.shape[0] >= _KEY_INDEX_MIN:
        return HostKeyIndex(keys)
    return functools.partial(searchsorted_rows, keys)


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
def gather_rows(H: jax.Array, rows: jax.Array) -> jax.Array:
    """Plain row gather (fast path: wide contiguous rows)."""
    return H[rows]


@functools.partial(jax.jit,
                   static_argnames=("k", "keep_at_most", "lowrank"))
def finalize_postings(light_pairs: jax.Array, lrows: jax.Array,
                      dense_rows: jax.Array, dense_reads: jax.Array,
                      lengths: jax.Array, thr: jax.Array,
                      k: int, keep_at_most: int, lowrank: bool = True):
    return finalize_postings_local(
        light_pairs, lrows, dense_rows, dense_reads, lengths, thr,
        jnp.int32(0), k, keep_at_most, lowrank)


def _pow2(n: int) -> int:
    """Smallest power of two >= n (shape bucketing)."""
    return 1 << max(0, int(np.ceil(np.log2(max(n, 1)))))


def _bucket_size(n: int) -> int:
    """Smallest padded size >= n from a pow2-with-quarter-steps ladder
    (mantissa 4-8 of a pow2 step).

    Used for the two-stage unique row arrays: plain pow2 pads waste up
    to ~50% of the unique-gather work right past a boundary -- measured
    694k vs 461k reads/s at k=12/4000 for two same-shaped batches whose
    U crossed 65536 on one part (docs/PERF.md round 4).  Quarter steps
    bound the waste at ~12.5% mean while keeping the compile-variant
    count small (4 shapes per octave, cached across batches)."""
    n = max(int(n), 1)
    if n <= 16:
        return _pow2(n)
    step = 1 << ((n - 1).bit_length() - 3)
    return -(-n // step) * step


def _fast_unique_inverse(flat: np.ndarray):
    """(unique sorted values, inverse map) -- torch-backed (multi-core
    sort) with a numpy fallback."""
    try:
        import torch
        u, inv = torch.unique(torch.from_numpy(flat),
                              return_inverse=True)
        return u.numpy(), inv.numpy()
    except ImportError:  # pragma: no cover - torch is baked in
        return np.unique(flat, return_inverse=True)


@functools.partial(jax.jit,
                   static_argnames=("k", "keep_at_most", "lowrank",
                                    "sort_keep"))
def finalize_postings_v2(light_parts: tuple, lrows: jax.Array,
                         uniq_rows, dense_rows: jax.Array,
                         dense_reads: jax.Array, dense_slots: jax.Array,
                         slot_read: jax.Array, lengths: jax.Array,
                         thr: jax.Array, k: int, keep_at_most: int,
                         lowrank: bool = True,
                         sort_keep: int | None = None):
    """Single-chip postings scoring with all round-3/4 optimisations:
    height-split light table, optional batch-unique two-stage gather,
    compact dense side, post-sort slice to the batch's real posting
    count (see :func:`finalize_postings_local`)."""
    return finalize_postings_local(
        None, lrows, dense_rows, dense_reads, lengths, thr,
        jnp.int32(0), k, keep_at_most, lowrank,
        light_parts=light_parts, uniq_rows=uniq_rows,
        dense_slots=dense_slots if lowrank else None,
        slot_read=slot_read if lowrank else None, sort_keep=sort_keep)


def _gather_compact(parts: tuple, uniq) -> jax.Array:
    """Batch-unique compact table from the split light parts (tuple =
    part-routed per-part indices; array = single-table indices)."""
    if isinstance(uniq, tuple):
        return jnp.concatenate(
            [p[u] for p, u in zip(parts, uniq)], axis=0)
    return light_gather(parts, uniq)


@jax.jit
def gather_compact(parts: tuple, uniq) -> jax.Array:
    """Standalone compact-table gather (pays the full latency; used only
    to seed the software pipeline's first batch)."""
    return _gather_compact(parts, uniq)


@functools.partial(jax.jit,
                   static_argnames=("k", "keep_at_most", "lowrank",
                                    "sort_keep"))
def finalize_postings_pipelined(light_parts: tuple, compact: jax.Array,
                                lrows: jax.Array, next_uniq,
                                dense_rows: jax.Array,
                                dense_reads: jax.Array,
                                dense_slots: jax.Array,
                                slot_read: jax.Array,
                                lengths: jax.Array, thr: jax.Array,
                                k: int, keep_at_most: int,
                                lowrank: bool = True,
                                sort_keep: int | None = None):
    """One software-pipeline stage: score THIS batch from its
    pre-gathered compact table AND gather the NEXT batch's compact
    table in the same program.

    The batch-unique gather is latency-bound (~5-6 ms exposed on a
    serial dependency chain at k=12/4000 scale, while 10 independent
    gathers average 1.24 ms each -- docs/PERF.md round 4) and a TPU
    runs one program at a time, so the only way to hide it is inside
    the SAME program: XLA schedules the independent next-batch gather
    under this batch's sort/scan/top-k work (measured 4.92 ms fused vs
    7.43 ms serial).  Returns ``(result tuple, next_compact)``;
    ``next_uniq=None`` flushes the tail of the pipeline."""
    out = finalize_postings_local(
        None, lrows, dense_rows, dense_reads, lengths, thr,
        jnp.int32(0), k, keep_at_most, lowrank,
        light_parts=light_parts, compact_table=compact,
        dense_slots=dense_slots if lowrank else None,
        slot_read=slot_read if lowrank else None, sort_keep=sort_keep)
    if next_uniq is None:
        return out, None
    return out, _gather_compact(light_parts, next_uniq)


def routed_light_gather(parts: tuple, routed: tuple) -> jax.Array:
    """[B, sum(W_p), 2P] window gather with per-part routing: the host
    sorted each read's hit windows by owning part (``routed[p]`` holds
    part-LOCAL row indices, pad slots >= H_p), so every part is touched
    by exactly ONE independent gather -- no dependent unique stage, no
    alternating-parts select (round-5 replacement for the two-stage
    gather whose serial gather->re-gather dependency exposed ~5-6 ms of
    latency per batch, docs/PERF.md round 4).  The downstream edge sort
    is order-agnostic, so windows never need re-ordering to read
    positions; pad slots are rewritten to the sentinel edge / zero
    delta and sort to the tail exactly like table pads."""
    gs = []
    for p, r in zip(parts, routed):
        H = p.shape[0]
        g = p[jnp.minimum(r, H - 1)]
        P = g.shape[-1] // 2
        pad = (r >= H)[..., None]
        e = jnp.where(pad, LIGHT_PAD_EDGE, g[..., :P])
        d = jnp.where(pad, 0, g[..., P:])
        gs.append(jnp.concatenate([e, d], axis=-1))
    return jnp.concatenate(gs, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "keep_at_most", "lowrank",
                                    "sort_keep"))
def finalize_postings_routed(light_parts: tuple, routed: tuple,
                             dense_rows: jax.Array,
                             dense_reads: jax.Array,
                             dense_slots: jax.Array,
                             slot_read: jax.Array,
                             lengths: jax.Array, thr: jax.Array,
                             k: int, keep_at_most: int,
                             lowrank: bool = True,
                             sort_keep: int | None = None):
    """Postings scoring from part-routed window gathers (see
    :func:`routed_light_gather`)."""
    return finalize_postings_local(
        None, None, dense_rows, dense_reads, lengths, thr,
        jnp.int32(0), k, keep_at_most, lowrank,
        light_parts=light_parts, routed_lrows=routed,
        dense_slots=dense_slots if lowrank else None,
        slot_read=slot_read if lowrank else None, sort_keep=sort_keep)


def light_gather(parts: tuple, lrows: jax.Array) -> jax.Array:
    """Row gather from a light table stored as N height-split parts.

    Measured v5e gather rates (scripts/postings_probes.py gather): tables under
    ~100 MB gather at ~5-7 ns/row (XLA stages them through VMEM); bigger
    tables fall to ~23 ns/row (HBM random-row path).  Splitting a
    too-big table into sub-100MB parts keeps every part on the fast
    rate.  Row indices are global: part ``i`` covers rows
    ``[off_i, off_i + H_i)`` in storage order (the miss row is the last
    row of the last part).

    Cost scales with the part count (each part is gathered for every
    row, then selected), so this full-select form is only used for
    SMALL row sets (ambiguity alternatives) or as the correctness
    fallback; the hot path routes batch-unique rows to their own parts
    (see ``uniq_rows`` in :func:`finalize_postings_local`).
    """
    if len(parts) == 1:
        return parts[0][lrows]
    out = None
    off = 0
    for p in parts:
        H = p.shape[0]
        g = p[jnp.clip(lrows - off, 0, H - 1)]
        out = g if out is None else \
            jnp.where((lrows >= off)[..., None], g, out)
        off += H
    return out


def finalize_postings_local(light_pairs: jax.Array, lrows: jax.Array,
                            dense_rows: jax.Array, dense_reads: jax.Array,
                            lengths: jax.Array, thr: jax.Array,
                            edge_offset: jax.Array,
                            k: int, keep_at_most: int,
                            lowrank: bool = True, *,
                            light_parts: tuple | None = None,
                            uniq_rows: jax.Array | None = None,
                            compact_table: jax.Array | None = None,
                            routed_lrows: tuple | None = None,
                            dense_slots: jax.Array | None = None,
                            slot_read: jax.Array | None = None,
                            sort_keep: int | None = None):
    """Postings-mode scoring: sort-based segment sums over the gathered
    light postings, combined exactly with the batch's dense row sources
    (heavy k-mer hit rows + ambiguity window contributions), then top-k
    + LWR.

    ``light_pairs[r]`` holds a k-mer's postings as ``[2P]`` int32: P
    edge ids then P bit-cast f32 deltas (one gather fetches both).  Per
    read the postings of its Q k-mers are sorted by edge (``lax.sort``
    with the delta as payload) and summed per edge with the
    cumsum-at-segment-ends trick.

    The dense side arrives as actual (row vector, read) pairs --
    ``dense_rows[i]`` is an ``[E]`` delta vector belonging to read
    ``dense_reads[i]`` (pads: zero vector, any read).  ``dense_acc`` is
    their per-read scatter-sum.  An edge's total score delta is
    ``light_sum(e) + dense_acc[e]``; the exact global top-k is found in
    the union of (a) the top-k light segment ends scored by that total
    and (b) the top-k of ``dense_acc`` alone: any edge outside both
    lists is dominated by k better edges in its own list.  An edge with
    both contributions appears in (a) exactly and in (b) as a strict
    underestimate (stored deltas are > 0), so after sorting candidates
    by score, later duplicates are masked out.

    ``lowrank`` picks how the dense values at the light segment ends
    are produced: per dense *source* (cost ~ n_sources * J scalar
    gathers -- right when hits are rare) vs per read from ``dense_acc``
    (cost B * J; right when most reads have dense content).  Scalar
    gathers measured ~13 ns each on v5e regardless of formulation, so
    this choice is pure count reduction.

    Semantics identical to :func:`finalize` over the implied dense
    accumulator (``PlacementProcess.java:726-764,384-451``): matched
    edges have total delta > 0, scores are ``Q*thr + delta_total``, LWR
    uses the always-applied max shift.

    Precision note: per-read segment sums ride one running cumsum, so a
    segment's sum carries absolute error ~ulp(row running total) --
    about 1e-4 log10 units at default scales, the same order as the
    tolerance used for reference parity.  Candidate *membership* and
    |L| are exact regardless: presence is tested via a separate count
    cumsum whose 0/1 sums never cancel.

    ``edge_offset`` supports edge-range sharding
    (``rappas_tpu.parallel.postings_sharded``): dense columns are then
    local to the shard's edge range ``[offset, offset + W)`` while light
    edge ids stay global; returned edges are always global.  Single-chip
    callers pass 0 via :func:`finalize_postings`.

    Keyword extensions (round 3, all measured on v5e --
    scripts/postings_probe*.py, docs/PERF.md):

    * ``light_parts``: the light table as N height-split parts so each
      stays under the ~100 MB VMEM-staging cliff (:func:`light_gather`);
      overrides ``light_pairs``.
    * ``uniq_rows``: batch-deduplicated table rows.  ``lrows`` is then
      the inverse map into ``uniq_rows``: the big table is gathered once
      per *unique* k-mer and windows re-gather from the small compacted
      table at the fast rate.  Host decides when this wins.  For a
      split table, pass a TUPLE ``(u1, ..., uN)`` of per-part row
      indices (part-local, concatenated in order): each unique row is
      then fetched from its own part only -- gathering every part per
      row defeats the fast path (probe5: 5.21 -> 3.06 ms at N=2).
    * ``dense_slots``/``slot_read``: compact dense side.  Sources
      scatter into ``[n_slots + 1, E]`` (slot per read WITH dense
      content, unique; pads -> the extra zero row) instead of
      ``[B, E]``; top-k runs over slots and scatters back to reads
      (``slot_read`` pads point at row B of a ``[B + 1]`` target).
      Requires ``lowrank=True`` (callers fall back to the dense
      accumulator when sources are not rare).
    """
    B = (routed_lrows[0] if routed_lrows is not None else lrows).shape[0]
    parts = light_parts if light_parts is not None else (light_pairs,)
    P = parts[0].shape[1] // 2
    E = dense_rows.shape[1]          # local width W under sharding
    K = min(keep_at_most, E)

    if dense_slots is None:
        dense_acc = jnp.zeros((B, E), jnp.float32).at[dense_reads].add(
            dense_rows)
    else:
        assert lowrank, "compact dense side requires lowrank=True"
        n_slots = slot_read.shape[0]
        acc_c = jnp.zeros((n_slots + 1, E), jnp.float32).at[
            dense_slots].add(dense_rows)

    if routed_lrows is not None:
        # round-5 part-routed window gathers: one independent gather
        # per part, no dependent stages (routed_light_gather)
        g = routed_light_gather(parts, routed_lrows)
    elif compact_table is not None:
        # software-pipelined path: the batch-unique compact table was
        # gathered by the PREVIOUS device program (overlapped under its
        # scoring work -- the unique gather is latency-bound, see
        # docs/PERF.md round 4); lrows is the inverse map into it
        g = compact_table[lrows]
    elif uniq_rows is not None:
        if isinstance(uniq_rows, tuple):
            # part-routed: each unique row fetched from its own part
            # (probe5 V2 -- gathering both parts per row is ~1.7x
            # slower than one routed gather per part)
            compact = jnp.concatenate(
                [p[u] for p, u in zip(parts, uniq_rows)], axis=0)
        else:
            compact = light_gather(parts, uniq_rows)  # [U, 2P]
        g = compact[lrows]            # lrows = inverse map, fast table
    else:
        g = light_gather(parts, lrows)               # [B, Q, 2P]
    W_all = g.shape[1]        # == Q except on the routed path (sum W_p)
    e = g[:, :, :P].reshape(B, W_all * P)
    d = jax.lax.bitcast_convert_type(
        g[:, :, P:], jnp.float32).reshape(B, W_all * P)
    e_s, d_s = jax.lax.sort((e, d), num_keys=1)
    # Pad slots carry the LIGHT_PAD_EDGE sentinel, so the sort moves
    # every pad to the tail of its row (round 4).  Two consequences:
    # (a) ``sort_keep`` -- the host's bound on real postings per read
    # in this batch -- lets every scan below run on a narrow slice
    # (slicing after the sort is free; the dropped tail is all pads,
    # and a pad's 0.0 delta never changes a cumsum value bitwise);
    # (b) candidate membership is simply ``edge != sentinel``: a
    # segment with a real edge id consists entirely of real postings,
    # so no separate exactness pass is needed.  (Pre-round-4 pads had
    # edge 0 and membership needed a count-cumsum: a tiny delta can
    # vanish from the f32 running cumsum, and 0/1 counts are exact.)
    e_s_full = e_s
    if sort_keep is not None and sort_keep < e_s.shape[1]:
        e_s = e_s[:, :sort_keep]
        d_s = d_s[:, :sort_keep]
    cs = jnp.cumsum(d_s, axis=1)
    nxt = jnp.concatenate(
        [e_s[:, 1:], jnp.full((B, 1), -1, e_s.dtype)], axis=1)
    is_end = e_s != nxt
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), e_s[:, 1:] != e_s[:, :-1]], axis=1)
    prev_cs = jnp.concatenate(
        [jnp.zeros((B, 1), cs.dtype), cs[:, :-1]], axis=1)
    start_cs = jax.lax.cummax(
        jnp.where(is_start, prev_cs, -jnp.inf), axis=1)
    seg = cs - start_cs                      # light per-edge sum at ends
    light_valid = is_end & (e_s != LIGHT_PAD_EDGE)

    # shard-local dense column per (global) light edge; a shard only
    # stores postings of its own edge range, so real light edges always
    # land in range (pads clip harmlessly: their seg == 0 masks them)
    e_loc = jnp.clip(e_s - edge_offset, 0, E - 1)
    if lowrank:
        # dense values at the light edges, per dense source:
        # vals[i, j] = dense_rows[i, e_loc[read_i, j]].  The scatter
        # keeps the UNSLICED width: scatter-adds into a [B, 128]-lane
        # target crash this TPU toolchain's fusion emitter
        # (fusion_emitter.cc:4796 sorted-scatter sublane-gather check;
        # [B, 256] compiles fine), and the op touches only the n_pad
        # dense-source rows, so full width costs nothing measurable.
        e_loc_f = jnp.clip(e_s_full - edge_offset, 0, E - 1)
        e_sel = e_loc_f[dense_reads]                     # [n_pad, J]
        vals = jnp.take_along_axis(dense_rows, e_sel, axis=1)
        dense_at = jnp.zeros(e_s_full.shape, jnp.float32).at[
            dense_reads].add(vals)[:, :e_s.shape[1]]
    else:
        dense_at = jnp.take_along_axis(dense_acc, e_loc, axis=1)
    light_total = seg + dense_at
    l_scores, li = jax.lax.top_k(
        jnp.where(light_valid, light_total, -jnp.inf), K)
    l_edges = jnp.take_along_axis(e_s, li, axis=1)

    if dense_slots is None:
        h_scores, h_edges = jax.lax.top_k(
            jnp.where(dense_acc > 0, dense_acc, -jnp.inf), K)
        h_edges = h_edges + edge_offset          # local col -> global id
    else:
        hs, he = jax.lax.top_k(
            jnp.where(acc_c[:n_slots] > 0, acc_c[:n_slots], -jnp.inf), K)
        he = he + edge_offset
        h_scores = jnp.full((B + 1, K), -jnp.inf, jnp.float32).at[
            slot_read].set(hs)[:B]
        h_edges = jnp.zeros((B + 1, K), he.dtype).at[
            slot_read].set(he)[:B]

    cedge = jnp.concatenate([l_edges, h_edges.astype(l_edges.dtype)], 1)
    cscore = jnp.concatenate([l_scores, h_scores], 1)
    order = jnp.argsort(-cscore, axis=1)
    cedge = jnp.take_along_axis(cedge, order, axis=1)
    cscore = jnp.take_along_axis(cscore, order, axis=1)
    M = cedge.shape[1]
    # isdup[b, j] = some i < j has the same edge (i indexes axis 1)
    earlier = jnp.triu(jnp.ones((M, M), bool), 1)
    isdup = ((cedge[:, :, None] == cedge[:, None, :]) &
             earlier[None, :, :]).any(axis=1)
    cscore = jnp.where(isdup, -jnp.inf, cscore)
    top_acc, ti = jax.lax.top_k(cscore, K)
    top_edge = jnp.take_along_axis(cedge, ti, axis=1)

    if dense_slots is None:
        n_dense = (dense_acc > 0).sum(axis=1)
    else:
        nd = (acc_c[:n_slots] > 0).sum(axis=1)
        n_dense = jnp.zeros(B + 1, nd.dtype).at[slot_read].set(nd)[:B]
    light_only = light_valid & (dense_at <= 0)
    n_matched = (n_dense + light_only.sum(axis=1)).astype(jnp.int32)

    Qf = (lengths - (k - 1)).astype(jnp.float32)
    valid = jnp.isfinite(top_acc)
    top_scores = jnp.where(valid, Qf[:, None] * thr + top_acc, -jnp.inf)
    shift = top_scores[:, :1]
    w = jnp.where(valid, jnp.exp2((top_scores - shift) *
                                  np.float32(np.log2(10.0))), 0.0)
    lwr = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-30)
    top_edges = jnp.where(valid, top_edge, -1).astype(jnp.int32)
    return top_edges, top_scores, lwr, n_matched


@jax.jit
def alt_delta_rows(D: jax.Array, scale: jax.Array,
                   alt_rows: jax.Array) -> jax.Array:
    """[n_alt, E] f32 delta rows for ambiguity alternatives (dense and
    compact table modes): a plain row gather."""
    return D[alt_rows].astype(jnp.float32) * scale


@jax.jit
def routed_accumulate(parts: tuple, routed: tuple) -> jax.Array:
    """[B, E] accumulator from a height-split direct table: one
    independent :func:`accumulate` per part over its host-routed
    windows, partial accumulators summed.  Every part stays in the
    gather unit's fast zone (docs/PERF.md round 5); per-read summation
    order becomes part-major (scores within f32-reordering tolerance
    of the unsplit table, candidate membership exact -- sums of
    positive deltas stay positive in any order)."""
    acc = None
    for p, r in zip(parts, routed):
        a = accumulate(p, r)
        acc = a if acc is None else acc + a
    return acc


@jax.jit
def alt_delta_rows_split(parts: tuple, scale: jax.Array,
                         alt_rows: jax.Array) -> jax.Array:
    """[n_alt, E] f32 delta rows from a height-split direct table
    (ambiguity alternatives are FEW, so the full select chain over
    parts is fine).  ``alt_rows`` are global body-row indices; each
    part carries one trailing all-zero row, and the global miss row
    (== total body height) clips to the last part's zero row."""
    out = None
    off = 0
    for p in parts:
        H = p.shape[0] - 1            # effective (body) height
        g = p[jnp.clip(alt_rows - off, 0, H)]
        out = g if out is None else \
            jnp.where((alt_rows >= off)[:, None], g, out)
        off += H
    return out.astype(jnp.float32) * scale


@jax.jit
def alt_delta_rows_postings(light_parts: tuple,
                            heavy_dense: jax.Array, alt_lrows: jax.Array,
                            alt_hrows: jax.Array) -> jax.Array:
    """[n_alt, E] f32 delta rows for ambiguity alternatives in postings
    mode: the heavy dense row plus the scattered light postings (misses
    hit the heavy table's all-zero trailing row; light pad slots carry
    the LIGHT_PAD_EDGE sentinel and are dropped by the scatter)."""
    dense = heavy_dense[alt_hrows]                    # [n_alt, E]
    g = light_gather(light_parts, alt_lrows)          # [n_alt, 2P]
    P = g.shape[1] // 2
    e = g[:, :P]
    d = jax.lax.bitcast_convert_type(g[:, P:], jnp.float32)
    n_alt = e.shape[0]
    return dense.at[jnp.arange(n_alt)[:, None], e].add(d, mode="drop")


@jax.jit
def ambiguous_contrib(rows: jax.Array, alt_win: jax.Array,
                      win_inv_w: jax.Array,
                      win_is_mean: jax.Array) -> jax.Array:
    """[n_win, E] per-window score contributions.

    rows      f32[n_alt, E]: delta row per alternative k-mer (zeros = miss)
    alt_win   int32[n_alt]: window id per alternative
    win_inv_w f32[n_win]:   1 / W_size per window
    win_is_mean bool[n_win]: mean mode (True) or max mode

    Mean (``treatAmbiguitiesWithMean``, ``PlacementProcess.java:
    1129-1174``): ``contrib = log10(sum_alt 10^delta / W)`` -- an absent
    alternative contributes ``10^0 = 1``, exactly the reference's
    ``(W - C_amb) * PP*_thr`` term divided by the threshold.

    Max (``treatAmbiguitiesWithMax``, ``:1185-1236``):
    ``contrib = max_alt delta`` (0 if nothing matched).

    Membership: an edge hit by any alternative joins the candidate list
    even when its mean contribution rounds to 0 (all hits exactly at
    threshold) -- the reference increments C[x] on first hit regardless
    of the contribution value (``PlacementProcess.java:1149-1160``).  So
    hit entries are floored at DELTA_TINY (a normal f32, FTZ-safe) and
    only no-hit entries are exactly 0.
    """
    from rappas_tpu.db import DELTA_TINY
    n_win = win_is_mean.shape[0]
    ten = jnp.exp2(rows * np.float32(np.log2(10.0)))
    sums = jax.ops.segment_sum(ten, alt_win, num_segments=n_win)
    maxs = jax.ops.segment_max(rows, alt_win, num_segments=n_win)
    mean_contrib = jnp.log2(jnp.maximum(
        sums * win_inv_w[:, None], 1e-30)) * np.float32(1.0 / np.log2(10.0))
    contrib = jnp.where(win_is_mean[:, None], mean_contrib, maxs)
    hit = maxs > 0                     # stored deltas are >= DELTA_TINY
    return jnp.where(hit, jnp.maximum(contrib, DELTA_TINY), 0.0)


@jax.jit
def ambiguous_pass(rows: jax.Array,
                   alt_win: jax.Array, win_read: jax.Array,
                   win_inv_w: jax.Array, win_is_mean: jax.Array,
                   acc: jax.Array) -> jax.Array:
    """Add ambiguous-window contributions into ``acc`` (dense modes)."""
    contrib = ambiguous_contrib(rows, alt_win, win_inv_w, win_is_mean)
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
    #: byte budget for the postings mode's direct k-mer -> row index
    #: table (int32[S^k + 1]); above it, binary search over sorted keys
    DIRECT_INDEX_LIMIT = 1 << 30
    #: single light-table part size above which the v5e gather falls off
    #: the ~5-7 ns/row VMEM-staged rate to ~23 ns/row (measured,
    #: scripts/postings_probes.py); bigger tables are height-split into
    #: up to MAX_LIGHT_PARTS equal parts
    LIGHT_SPLIT_BYTES = 96 << 20
    #: split-part cap (~MAX * LIGHT_SPLIT_BYTES of light table, ~3 GB:
    #: beyond that the table no longer fits HBM comfortably anyway and
    #: multi-chip sharding is the answer); past it the single slow
    #: table is the fallback
    MAX_LIGHT_PARTS = 32
    #: batch-unique row-count cap for the two-stage gather.  The real
    #: constraint is the compacted table's byte size (must stay under
    #: LIGHT_SPLIT_BYTES for the re-gather to run at the fast rate,
    #: checked separately); this cap just bounds compile-shape variety
    #: and serves as a test hook.  Round-3 measurement: U=131k costs
    #: 5.4 ms vs 13+ ms direct at 585k windows.
    TWO_STAGE_MAX_UNIQUE = 1 << 21
    #: unique-budget overflow splits batches down to this size before
    #: accepting the slow both-parts+select fallback
    MIN_SPLIT_B = 1024
    #: dense direct tables above this size would be height-split into
    #: LIGHT_SPLIT_BYTES parts with host-routed windows.  DEFAULT OFF
    #: (1<<62): measured a clear LOSS on v5e (round-5 probe B, real
    #: k=10 1.26 GB table, B=8192: 252k reads/s at 19x64MB parts vs
    #: 383k unsplit -- per-read-per-part padding costs a binomial-max
    #: factor of ~3.2x more gathers than the 2.5x rate gap between the
    #: slow zone's flat ~15-18 ns/row and the sub-88MB fast rate, plus
    #: ~340 ms/batch of host routing).  The machinery ships tested
    #: (tests/test_engine.py::test_direct_split_matches_unsplit) for
    #: hardware with a steeper fast/slow gap; see docs/PERF.md round 5.
    DIRECT_SPLIT_MIN = 1 << 62
    #: direct-split part cap (beyond ~64 parts the routing pad overhead
    #: dominates; such tables exceed single-chip HBM anyway)
    MAX_DIRECT_PARTS = 64

    def __init__(self, db: PhyloKmerDB, keep_at_most: int = 7,
                 treat_ambiguities: bool = True,
                 ambiguities_with_max: bool = False,
                 device=None, precision: str = "f32",
                 table: str = "auto", postings_width: int = 8):
        from rappas_tpu.utils import enable_compile_cache
        enable_compile_cache()
        self._init_params(db, keep_at_most, treat_ambiguities,
                          ambiguities_with_max, precision)
        table = self.resolve_table(db, table, precision,
                                   self.DIRECT_BYTE_LIMIT,
                                   postings_width)
        self.table = table
        if table == "direct":
            if precision == "u16":
                dense, scale = db.dense_matrix_u16(pad_rows=1)
            else:
                dense, scale = db.dense_matrix(pad_rows=1), np.float32(1)
            self.keys_dev = None
            self._init_direct_split(dense, device)
        elif table == "compact":
            if precision == "u16":
                dense, scale = db.compact_matrix_u16(pad_rows=1)
            else:
                dense, scale = db.compact_matrix(pad_rows=1), np.float32(1)
            if self.alphabet.n_states ** self.k <= 2 ** 31 - 1:
                # k-mer indices fit int32: lookup on device (one
                # searchsorted), codes ship as 1 B/base
                self.keys_dev = jax.device_put(
                    db.keys.astype(np.int32), device)
                self._host_lookup = False
            else:
                # >31-bit index space (amino k >= 8: 20^8).  TPUs have
                # no native int64 -- jax emulates it as 2x int32 under
                # x64 mode.  The sorted-key search runs on HOST instead
                # (numpy int64) and int32 table rows ship to the
                # device: no x64 anywhere.
                self.keys_dev = None
                self._host_lookup = True
        elif table == "postings":
            if precision == "u16":
                raise ValueError(
                    "postings table mode is f32-only (the sort payload "
                    "carries exact deltas); use precision='f32'")
            pt = db.postings_tables(postings_width)
            self._light_keys_np = pt.light_keys
            self._heavy_keys_np = pt.heavy_keys
            nl, nh = pt.light_keys.shape[0], pt.heavy_keys.shape[0]
            self._nl = nl
            # one fused table: P edge ids then P bit-cast f32 deltas,
            # fetched with a single row gather.  Gather cost is set by
            # table footprint (measured v5e: ~5-7 ns/row under ~100 MB
            # where XLA stages through VMEM, ~23 ns/row above), so
            # too-big tables are height-split in two (light_gather).
            pairs = np.concatenate(
                [pt.light_edges, pt.light_deltas.view(np.int32)], axis=1)
            #: real postings per light row (pads excluded) -- bounds the
            #: post-sort slice width per batch (sort_keep, round 4)
            self._light_counts = (pt.light_deltas > 0).sum(1).astype(
                np.int32)
            self._light_slow = pairs.nbytes > self.LIGHT_SPLIT_BYTES
            n_parts = -(-pairs.nbytes // max(self.LIGHT_SPLIT_BYTES, 1))
            if self._light_slow and n_parts <= self.MAX_LIGHT_PARTS and \
                    pairs.shape[0] > n_parts:
                # N equal-height parts, each under the VMEM-staging
                # cliff; multi-GB light tables (config 3: k=12 full DB
                # on one chip) stay on the ~5-7 ns/row fast path via
                # part-routed two-stage gathers
                cuts = np.linspace(0, pairs.shape[0], n_parts + 1,
                                   dtype=np.int64)
                self.light_parts = tuple(
                    jax.device_put(np.ascontiguousarray(pairs[lo:hi]),
                                   device)
                    for lo, hi in zip(cuts[:-1], cuts[1:]))
                self._light_slow = False   # every part VMEM-stageable
            else:
                self.light_parts = (jax.device_put(pairs, device),)
            # round-5 default: split light tables route windows to
            # their parts (one independent fast-zone gather per part)
            # instead of the two-stage unique gather -- measured equal
            # at 2 parts (672k vs 669k, k=12/4000) and +8% at 10 parts
            # (82k vs 76k, multi-GB), while deleting the per-batch host
            # torch-unique + inverse mapping (docs/PERF.md round 5).
            # enable_routed_windows(False) restores two-stage (whose
            # scores are bitwise-equal to the unsplit table).
            self._routed_windows = (type(self) is PlacementEngine and
                                    len(self.light_parts) > 1)
            space = self.alphabet.n_states ** self.k
            if space * 4 <= self.DIRECT_INDEX_LIMIT:
                # direct k-mer -> encoded-row table (host side): one
                # fancy-index replaces per-window binary search.
                # Encoding: r < nl light row, nl miss, nl+1+h heavy
                # row h; slot `space` = miss target for invalid windows.
                rof = np.full(space + 1, nl, np.int32)
                rof[pt.light_keys] = np.arange(nl, dtype=np.int32)
                rof[pt.heavy_keys] = nl + 1 + np.arange(nh,
                                                        dtype=np.int32)
                self._rof_np = rof
            else:
                self._rof_np = None       # host searchsorted fallback
            dense, scale = pt.heavy_dense, np.float32(1)
            self.keys_dev = None
            # software pipelining of the two-stage gather is OFF by
            # default: measured a net loss on v5e (14.4 vs 12.4
            # ms/batch at k=12/4000 -- the dense side's scatters
            # contend with the gather unit, so only the ~2 ms of pure
            # VPU sort/scan work overlaps; docs/PERF.md round 4).  The
            # machinery stays (bit-exact, tested) for hardware where
            # the balance differs: flip with `engine.enable_pipeline()`.
            self._pp_enabled = False
        else:
            raise ValueError(f"table must be auto/direct/compact/"
                             f"postings, got {table!r}")
        self.scale = jnp.float32(scale)
        self.n_rows = dense.shape[0]
        # split direct tables live only as parts (keeping the full table
        # too would double HBM)
        self.D = (jax.device_put(dense, device)
                  if self.direct_parts is None else None)
        self._init_host_codec()

    # -------------------------------------------------------------- #
    def _init_params(self, db: PhyloKmerDB, keep_at_most: int,
                     treat_ambiguities: bool, ambiguities_with_max: bool,
                     precision: str) -> None:
        if precision not in ("f32", "u16"):
            raise ValueError(f"precision must be f32 or u16, got "
                             f"{precision!r}")
        self.db = db
        self.k = db.k
        self.alphabet = db.alphabet
        self.keep_at_most = keep_at_most
        self.treat_ambiguities = treat_ambiguities
        self.ambiguities_with_max = ambiguities_with_max
        self.precision = precision
        self.thr = jnp.float32(db.thr_log10)
        #: compact mode with >31-bit k-mer index space: key lookup runs
        #: on host (numpy int64) so the device never needs x64
        self._host_lookup = False
        #: postings software pipeline (set by the postings init branch;
        #: ShardedEngine's postings path has its own machinery).  The
        #: lock serializes tail hand-off between the pipeline's issue
        #: path (which may run on a submission thread) and result-side
        #: flushes (round-5 review fix)
        self._pp_enabled = False
        self._pp_tail = None
        import threading as _threading
        self._pp_lock = _threading.Lock()
        #: part-routed window gathers for split light tables (round 5);
        #: flipped by measurement via enable_routed_windows / auto rule
        self._routed_windows = False
        #: height-split direct table (round 5, slow-zone dense tables;
        #: set by _init_direct_split, None = unsplit)
        self.direct_parts = None
        self._direct_cuts = None
        #: byte-lean D2H wire format (round 5): on when edge ids fit
        #: u16; single-chip engine only (mesh engines manage their own
        #: output sharding)
        self._wire_ok = (type(self) is PlacementEngine and
                         db.n_edge_slots < 65535)

    @classmethod
    def resolve_table(cls, db: PhyloKmerDB, table: str, precision: str,
                      direct_byte_limit: int,
                      postings_width: int = 8) -> str:
        """'auto' -> the concrete device layout for this DB size (the
        TPU analog of the reference's direct-vs-hashed capacity choice,
        ``CustomHash_v4_FastUtil81.java:49-63``).

        Round-4 rules, from measurement (scripts/round4_probe.py, real
        v5e):

        * the dense row-gather runs at its ~5-7 ns/row fast rate only
          while the table is VMEM-stageable; within that zone direct is
          fastest (config 1: 1.08M reads/s at 80 MB);
        * past it, the POSTINGS layout wins every LIGHT-dominated
          regime -- sparse k=10 DNA 586k vs 443k (direct, 1.26 GB) vs
          44k (compact); protein k=8 1.78M vs 384k (compact); the
          multi-GB k=12 DB only fits as postings at all;
        * but a HEAVY-dominated DB (most postings in k-mers with more
          than ``width`` entries, e.g. the real 150-taxon k=10 build:
          94M postings, ~90 per k-mer) turns every hit into a dense
          [E]-row source and postings collapses (131k vs ~443k direct,
          BENCH r4) -- such DBs take the direct/compact capacity rule
          (the reference's own choice, CustomHash_v4:49-63).

        The compact layout stays reachable explicitly and for u16
        precision (postings is f32-only: the sort payload carries exact
        deltas).
        """
        if table != "auto":
            return table
        itemsize = 2 if precision == "u16" else 4
        dense_bytes = (db.alphabet.n_states ** db.k *
                       db.n_edge_slots * itemsize)
        compact_bytes = (db.n_kmers + 1) * db.n_edge_slots * itemsize
        fast_bytes = 2 * cls.LIGHT_SPLIT_BYTES     # VMEM-stageable zone
        if dense_bytes <= min(fast_bytes, direct_byte_limit):
            return "direct"
        lens = np.diff(db.offsets)
        heavy_nnz = int(lens[lens > postings_width].sum()) \
            if lens.size else 0
        light_dominated = heavy_nnz * 2 <= max(int(db.nnz), 1)
        if precision != "u16" and light_dominated:
            return "postings"
        if dense_bytes <= max(direct_byte_limit, 2 * compact_bytes):
            return "direct"
        if compact_bytes <= direct_byte_limit:
            return "compact"
        if precision == "u16":
            raise ValueError(
                "DB too large for u16 dense/compact tables; use "
                "precision='f32' (postings layout)")
        return "postings"

    def _init_host_codec(self) -> None:
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
        # flat tables for the vectorized single-ambiguity expansion:
        # alt_tab[ascii, j] = j-th alternative state, alt_len[ascii] = W
        max_alt = max(len(v) for v in self._amb_alts.values())
        self._alt_tab = np.zeros((256, max_alt), np.int64)
        self._alt_len = np.zeros(256, np.int64)
        for o, alts in self._amb_alts.items():
            self._alt_len[o] = len(alts)
            self._alt_tab[o, :len(alts)] = np.asarray(alts)

    # -------------------------------------------------------------- #
    # device-placement hooks; the mesh-aware subclass
    # (rappas_tpu.parallel.engine.ShardedEngine) overrides these to
    # shard batch inputs over the dp axis and replicate the rest
    def _put_batch(self, x):
        """Per-read arrays (leading axis == batch)."""
        return jnp.asarray(x)

    def _put_repl(self, x):
        """Batch-independent device inputs (ambiguity specs etc.)."""
        return jnp.asarray(x)

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
        if self.table == "postings":
            return self._score_postings(codes, matrix, lengths)
        amb = (self._expand_ambiguities(codes, matrix, lengths)
               if self.treat_ambiguities else None)
        if self.direct_parts is not None:
            return self._score_direct_split(codes, lengths, amb)
        # pure-ACGT fast path (direct table): ship 2-bit packed reads --
        # 4x less H2D traffic and the exact pipeline bench.py times.
        # Valid only when no in-length position is ambiguous or invalid
        # (negative codes pack as 0 == 'A' and would fabricate k-mers).
        if (self.table == "direct" and amb is None and
                self.alphabet.n_states == 4 and
                not ((codes < 0) &
                     (np.arange(L)[None, :] < lengths[:, None])).any()):
            packed = pack_reads(codes)
            lens_dev = self._put_batch(lengths)
            rows = kmer_rows_packed(self._put_batch(packed),
                                    lens_dev, self.k, 4,
                                    self.n_rows, L)
            acc = accumulate(self.D, rows) * self.scale
            out = finalize(acc, lens_dev, self.thr,
                           self.k, self.keep_at_most)
            return self._emit_out(out)
        if self.table == "direct":
            rows = kmer_rows(self._put_batch(codes), self.k,
                             self.alphabet.n_states, self.n_rows)
        elif self._host_lookup:
            # int64 index space: host numpy lookup, int32 rows to device
            kidx = self._host_kmer_indices(codes, lengths)
            rows = self._put_batch(self._db_lookup(kidx))
        else:
            idx = kmer_indices64(self._put_batch(codes), self.k,
                                 self.alphabet.n_states)
            rows = compact_rows(self.keys_dev, idx)
        acc = accumulate(self.D, rows) * self.scale
        if amb is not None:
            acc = self._apply_ambiguities(amb, acc)
        out = finalize(acc, self._put_batch(lengths), self.thr,
                       self.k, self.keep_at_most)
        return self._emit_out(out)

    # -------------------------------------------------------------- #
    # postings mode (large trees) -- all lookup work happens on host:
    # the host computes per-window encoded rows once (the same pass the
    # heavy-hit extraction always needed), compacts hit windows, and
    # ships int32 rows; the device never repeats the k-mer -> row
    # lookup (measured 8.8 ms/batch of pure duplication on v5e).
    def _score_postings(self, codes: np.ndarray, matrix: np.ndarray,
                        lengths: np.ndarray) -> "PendingBatch":
        B = codes.shape[0]
        E = self.D.shape[1]
        nl = self._nl
        rof = self._rows_from_codes(codes, lengths)

        # ---- dense sources: heavy hits + ambiguity windows ---------- #
        hb, hq = np.nonzero(rof > nl)
        n_h = hb.shape[0]
        amb_h = (self._expand_ambiguities_host(codes, matrix, lengths)
                 if self.treat_ambiguities else None)
        win_read = amb_h[2] if amb_h is not None else \
            np.zeros(0, np.int32)
        src_reads = np.concatenate([hb.astype(np.int32), win_read]) \
            if (n_h or win_read.size) else np.zeros(0, np.int32)
        lowrank = src_reads.size <= B // 2

        # slot per read WITH dense content (compact dense accumulator)
        uniq_reads = np.unique(src_reads)
        n_slots = max(1, _pow2(uniq_reads.size))
        slot_read = np.full(n_slots, B, np.int32)   # pad -> row B
        slot_read[:uniq_reads.size] = uniq_reads

        def slots_of(reads):
            return np.searchsorted(uniq_reads, reads).astype(np.int32)

        # heavy sources padded to a bucket
        n_hpad = max(64, _pow2(max(n_h, 1)))
        hrows = np.full(n_hpad, self._heavy_keys_np.shape[0], np.int32)
        hreads = np.full(n_hpad, B - 1, np.int32)
        hslots = np.full(n_hpad, n_slots, np.int32)  # pad -> zero row
        if n_h:
            hrows[:n_h] = (rof[hb, hq] - (nl + 1)).astype(np.int32)
            hreads[:n_h] = hb
            hslots[:n_h] = slots_of(hb)

        sources = [(gather_rows(self.D, self._put_repl(hrows)),
                    hreads, hslots)]
        if amb_h is not None:
            kidx_a, alt_win, wr, win_inv_w, is_mean = amb_h
            rows_spec = self._map_alt_rows(kidx_a)
            rows_f = alt_delta_rows_postings(
                self.light_parts, self.D, *rows_spec)
            contrib = ambiguous_contrib(rows_f, self._put_repl(alt_win),
                                        self._put_repl(win_inv_w),
                                        self._put_repl(is_mean))
            sources.append((contrib, wr, slots_of(wr)))
        if len(sources) == 1:
            dense_rows = sources[0][0]
            dense_reads = self._put_repl(sources[0][1])
            dense_slots = self._put_repl(sources[0][2])
        else:
            dense_rows = jnp.concatenate([s[0] for s in sources], 0)
            dense_reads = self._put_repl(
                np.concatenate([s[1] for s in sources]))
            dense_slots = self._put_repl(
                np.concatenate([s[2] for s in sources]))

        lens_dev = self._put_batch(lengths)
        if self.light_parts[0].shape[1] == 0:
            # degenerate width-0 split: everything is heavy-dense
            dense_acc = jnp.zeros((B, E), jnp.float32).at[
                dense_reads].add(dense_rows)
            out = finalize(dense_acc, lens_dev, self.thr, self.k,
                           self.keep_at_most)
            return self._emit_out(out)

        # ---- light rows: hit compaction + optional two-stage -------- #
        lrows = np.minimum(rof, nl).astype(np.int32)
        hit = rof < nl
        counts = hit.sum(axis=1)
        w_max = int(counts.max()) if counts.size else 0
        Q = lrows.shape[1]
        W = Q
        for cand in (8, 16, 32, 48, 64, 96, 128, 192, 256):
            if cand >= w_max and cand < Q - 8:
                W = cand
                break
        if W < Q:
            # stable left-pack of hit windows; dropped slots are misses
            # (sentinel-edge / delta-0 pads) whose sorted position adds
            # exact zeros, so scores are bit-identical to the
            # uncompacted form
            pos = np.cumsum(hit, axis=1) - 1
            bb, qq = np.nonzero(hit)
            packed = np.full((B, W), nl, np.int32)
            packed[bb, pos[bb, qq]] = lrows[bb, qq]
            lrows = packed

        # post-sort slice width: the max REAL postings any read in this
        # batch carries (pads sort to the tail past this bound); halves
        # the cumsum/cummax/top-k widths at typical ~50% light-row fill
        p_read = np.where(hit, self._light_counts[
            np.minimum(rof, nl)], 0).sum(axis=1)
        p_max = int(p_read.max()) if p_read.size else 0
        P_half = self.light_parts[0].shape[1] // 2

        def pick_sort_keep(full_w):
            for cand in (8, 16, 32, 64, 96, 128, 192, 256, 384, 512,
                         768, 1024):
                if cand >= p_max and cand <= full_w - 64:
                    return cand
            return None

        if self._routed_windows and len(self.light_parts) > 1:
            # round-5 part-routed window gathers: each hit window is
            # packed (host-side) into its owning part's [B, W_p] matrix,
            # so the device runs one INDEPENDENT fast-zone gather per
            # part -- the dependent unique-gather -> re-gather chain of
            # the two-stage path (and its ~5-6 ms exposed latency,
            # docs/PERF.md round 4) disappears; the edge sort downstream
            # is order-agnostic so windows never return to read order.
            routed_np = self._route_windows(lrows)
            sort_keep = pick_sort_keep(
                sum(r.shape[1] for r in routed_np) * P_half)
            routed = tuple(self._put_batch(r) for r in routed_np)
            out = finalize_postings_routed(
                self.light_parts, routed, dense_rows, dense_reads,
                dense_slots, self._put_repl(slot_read), lens_dev,
                self.thr, self.k, self.keep_at_most, lowrank,
                sort_keep=sort_keep)
            return self._emit_out(out)

        sort_keep = pick_sort_keep(W * P_half)
        uniq_dev = None
        if self._light_slow or len(self.light_parts) > 1:
            uniq, inv = _fast_unique_inverse(lrows.ravel())
            nparts = len(self.light_parts)
            U = uniq.shape[0]
            # the compacted [U, 2P] table must itself stay under the
            # VMEM-staging cliff for the windows' re-gather to run at
            # the fast rate
            compact_ok = (U <= self.TWO_STAGE_MAX_UNIQUE and
                          U * self.light_parts[0].shape[1] * 4 <=
                          self.LIGHT_SPLIT_BYTES)
            if not compact_ok and nparts > 1 and B >= 2 * self.MIN_SPLIT_B:
                # too many batch-unique rows for one compact table: the
                # both-parts+select fallback is a measured perf cliff
                # (ADVICE r3; probe5: 5.2 ms vs 3.1 part-routed).  Reads
                # are independent, so halve the batch instead -- each
                # half's unique set shrinks toward the two-stage budget
                # (recursion bottoms out at MIN_SPLIT_B and takes the
                # slow fallback only then).  NOTE: the dense sources
                # assembled above are discarded and recomputed per half
                # -- acceptable because since round 5 this path is only
                # reachable with routed windows explicitly disabled
                # (multi-part tables default to the routed gather,
                # which has no unique budget at all)
                half = B // 2
                p1 = self._score_postings(codes[:half], matrix[:half],
                                          lengths[:half])
                p2 = self._score_postings(codes[half:], matrix[half:],
                                          lengths[half:])
                return SplitPending(p1, p2)
            # Payoff conditions differ (probe5, docs/PERF.md round 3):
            # a SPLIT table pays the alternating-parts penalty (~17
            # ns/row vs ~3 lone) on every window, so part-routed
            # two-stage wins whenever the compact table is small
            # enough (5.21 -> 3.06 ms at U = windows/2); a single slow
            # table only wins when the unique stage cuts the gather
            # count enough.
            if compact_ok and (nparts > 1 or U * 3 <= lrows.size):
                if nparts > 1:
                    # torch.unique returns sorted rows, so each part's
                    # uniques form a contiguous run: route each unique
                    # row to its OWN part (one gather per part per
                    # program -- never every part for one row).  Pad
                    # slots hold row 0 of each part; the inverse map
                    # never points at them.
                    heights = [p.shape[0] for p in self.light_parts]
                    offs = np.concatenate(
                        [[0], np.cumsum(heights)]).astype(np.int64)
                    cuts = np.searchsorted(uniq, offs[1:])
                    starts = np.concatenate([[0], cuts[:-1]])
                    pads = np.array(
                        [_bucket_size(max(int(c - s), 1))
                         for s, c in zip(starts, cuts)], np.int64)
                    us = []
                    for i in range(nparts):
                        n_i = int(cuts[i] - starts[i])
                        u = np.zeros(pads[i], np.int32)
                        u[:n_i] = uniq[starts[i]:cuts[i]] - offs[i]
                        us.append(self._put_repl(u))
                    uniq_dev = tuple(us)
                    pad_off = np.concatenate([[0], np.cumsum(pads)])
                    part_of = np.searchsorted(cuts, inv, side="right")
                    inv = pad_off[part_of] + (inv - starts[part_of])
                else:
                    Up = _bucket_size(U)
                    uniq_pad = np.full(Up, nl, np.int32)
                    uniq_pad[:U] = uniq
                    uniq_dev = self._put_repl(uniq_pad)
                lrows = inv.reshape(lrows.shape).astype(np.int32)

        if uniq_dev is not None and self._pp_enabled:
            # software pipeline: defer this batch's program until the
            # next batch arrives, so its compact-table gather overlaps
            # this batch's scoring (finalize_postings_pipelined)
            entry = {
                "lrows": self._put_batch(lrows), "uniq": uniq_dev,
                "dense": (dense_rows, dense_reads, dense_slots,
                          self._put_repl(slot_read)),
                "lens": lens_dev,
                "static": dict(k=self.k,
                               keep_at_most=self.keep_at_most,
                               lowrank=lowrank, sort_keep=sort_keep),
                "compact": None, "out": None,
            }
            with self._pp_lock:
                prev, self._pp_tail = self._pp_tail, entry
                if prev is not None:
                    self._pp_issue(prev, entry)
            return PipelinedBatch(self, entry)

        out = finalize_postings_v2(
            self.light_parts, self._put_batch(lrows), uniq_dev,
            dense_rows, dense_reads, dense_slots,
            self._put_repl(slot_read), lens_dev, self.thr,
            self.k, self.keep_at_most, lowrank, sort_keep=sort_keep)
        return self._emit_out(out)

    # ---- postings software pipeline (single-chip two-stage path) ---- #

    def enable_pipeline(self, on: bool = True) -> None:
        """Opt into cross-batch software pipelining of the two-stage
        gather (net loss on v5e, see __init__ note; exposed for other
        hardware balances)."""
        if on and not (self.table == "postings" and
                       type(self) is PlacementEngine):
            raise ValueError("pipelining applies to the single-chip "
                             "postings engine only")
        self._pp_enabled = on
        if on:
            # pipelining rides the two-stage path; routed windows
            # would bypass it
            self._routed_windows = False
        else:
            # restore the round-5 auto rule (routed on split tables)
            self._routed_windows = (type(self) is PlacementEngine and
                                    len(self.light_parts) > 1)

    def _pp_issue(self, prev: dict, nxt: dict | None) -> None:
        """Issue ``prev``'s device program; when ``nxt`` is given its
        compact table is gathered inside the same program (overlapped
        under prev's scoring)."""
        if prev["compact"] is None:
            # pipeline seed (first batch): standalone gather
            prev["compact"] = gather_compact(self.light_parts,
                                             prev["uniq"])
        dense_rows, dense_reads, dense_slots, slot_read = prev["dense"]
        out, nxt_compact = finalize_postings_pipelined(
            self.light_parts, prev["compact"], prev["lrows"],
            nxt["uniq"] if nxt is not None else None,
            dense_rows, dense_reads, dense_slots, slot_read,
            prev["lens"], self.thr, **prev["static"])
        for o in out:
            o.copy_to_host_async()
        prev["out"] = out
        prev["compact"] = prev["uniq"] = prev["dense"] = None
        if nxt is not None:
            nxt["compact"] = nxt_compact

    def _pp_flush(self, entry: dict) -> None:
        with self._pp_lock:
            if entry is not self._pp_tail:
                return              # already issued by the next batch
            self._pp_tail = None
            self._pp_issue(entry, None)

    def _emit_out(self, out) -> "PendingBatch":
        """Start D2H for one scored batch; single-array lean wire when
        edge ids fit u16 (round 5: one fetch of 48 B/read instead of
        four totalling 88 B/read -- the result fetch was the largest
        remaining host<->device term on the tunneled dev backend)."""
        if self._wire_ok:
            K = out[0].shape[1]
            packed = pack_wire(*out)
            packed.copy_to_host_async()
            return PendingBatch(packed, wire=K)
        for o in out:
            o.copy_to_host_async()
        return PendingBatch(out)

    def _init_direct_split(self, dense: np.ndarray, device) -> None:
        """Height-split a slow-zone dense direct table into fast-zone
        parts (round 5, BASELINE config 2).

        Dense tables past ~192 MB fall off the gather unit's ~5-7
        ns/row fast rate to ~23 ns/row (docs/PERF.md rounds 2/4: the
        1.26 GB k=10 table measured 23.4 ns/row).  Splitting into
        LIGHT_SPLIT_BYTES parts and routing each read's windows to
        their owning part (host-side stable left-pack, one independent
        :func:`accumulate` per part) keeps every gather in the fast
        zone -- the same machinery that carried the postings light
        table, applied to the dense matrix the round-4 auto rule
        selects for heavy-dominated DBs.  Each part carries one
        trailing all-zero row as its pad/miss target.
        """
        if type(self) is not PlacementEngine:
            return        # mesh engines shard the table instead
        n_parts = int(-(-dense.nbytes // self.LIGHT_SPLIT_BYTES))
        if (dense.nbytes <= self.DIRECT_SPLIT_MIN or n_parts < 2 or
                n_parts > self.MAX_DIRECT_PARTS or
                dense.shape[0] - 1 < n_parts):
            return
        body = dense[:-1]              # global miss row dropped; each
        zero = np.zeros((1, dense.shape[1]), dense.dtype)  # part pads
        cuts = np.linspace(0, body.shape[0], n_parts + 1, dtype=np.int64)
        self.direct_parts = tuple(
            jax.device_put(np.concatenate([body[lo:hi], zero]), device)
            for lo, hi in zip(cuts[:-1], cuts[1:]))
        self._direct_cuts = cuts

    @staticmethod
    def _route_rows(rows: np.ndarray, cuts: np.ndarray,
                    drop=None) -> list[np.ndarray]:
        """Shared per-part router (round-5 review consolidation): rows
        stable-left-packed into their owning part's [B, W] part-LOCAL
        matrix.  One SHARED bucketed width per batch keeps the compile
        variant count on a single ladder; pad slots hold the part
        height (the device rewrites them); rows equal to ``drop`` are
        excluded entirely."""
        B = rows.shape[0]
        n = len(cuts) - 1
        masks = []
        for p in range(n):
            m = (rows >= cuts[p]) & (rows < cuts[p + 1])
            if drop is not None:
                m &= rows != drop
            masks.append(m)
        w_max = max((int(m.sum(axis=1).max()) if m.size else 0)
                    for m in masks)
        W = _bucket_size(max(w_max, 1))
        outs = []
        for p, m in enumerate(masks):
            H = int(cuts[p + 1] - cuts[p])
            out = np.full((B, W), H, np.int32)
            bb, qq = np.nonzero(m)
            if bb.size:
                pos = (np.cumsum(m, axis=1) - 1)[bb, qq]
                out[bb, pos] = rows[bb, qq] - cuts[p]
            outs.append(out)
        return outs

    def _route_direct(self, rows: np.ndarray) -> list[np.ndarray]:
        """Split direct table: pads -> each part's trailing zero row;
        the global miss row lies past the last cut and drops out."""
        return self._route_rows(rows, self._direct_cuts)

    def _score_direct_split(self, codes: np.ndarray, lengths: np.ndarray,
                            amb) -> "PendingBatch":
        """Direct-mode scoring over the height-split table: host k-mer
        indexing + window routing, one independent fast-zone gather per
        part on device."""
        kidx = self._host_kmer_indices(codes, lengths)
        rows = np.where(kidx >= 0, kidx,
                        kidx.dtype.type(self.n_rows - 1))
        routed = tuple(self._put_batch(r)
                       for r in self._route_direct(rows))
        lens_dev = self._put_batch(lengths)
        acc = routed_accumulate(self.direct_parts, routed) * self.scale
        if amb is not None:
            acc = self._apply_ambiguities(amb, acc)
        out = finalize(acc, lens_dev, self.thr, self.k,
                       self.keep_at_most)
        return self._emit_out(out)

    def enable_routed_windows(self, on: bool = True) -> None:
        """Toggle part-routed window gathers on split light tables
        (default ON for multi-part single-chip engines; ``False``
        restores the two-stage unique gather, whose scores are bitwise
        equal to the unsplit table; see :func:`routed_light_gather`)."""
        if on and self.table != "postings":
            raise ValueError("routed windows apply to postings mode")
        self._routed_windows = on

    def _route_windows(self, lrows: np.ndarray) -> list[np.ndarray]:
        """Split light table: pads -> H_p (rewritten to the sentinel on
        device); global miss rows (== nl) are dropped entirely."""
        heights = [p.shape[0] for p in self.light_parts]
        cuts = np.concatenate([[0], np.cumsum(heights)])
        return self._route_rows(lrows, cuts, drop=self._nl)

    def _host_rows(self, kidx: np.ndarray) -> np.ndarray:
        """Encoded row per window: ``r < nl`` light row, ``nl`` miss,
        ``nl + 1 + h`` heavy row ``h`` (invalid windows -> miss)."""
        if self._rof_np is not None:
            space = self.alphabet.n_states ** self.k
            return self._rof_np[np.where(kidx >= 0, kidx, space)]
        # big-key-space fallback (protein k>=8): ONE combined bucketed
        # search over all keys with encoded-row values (round 5 -- the
        # separate light+heavy passes were ~half the protein host prep)
        keys, vals = self._comb_lookup_arrays
        pos = self._comb_lookup(kidx)                       # miss -> n
        n = keys.shape[0]
        return np.where(pos < n, vals[np.minimum(pos, n - 1)],
                        np.int32(self._nl))

    @functools.cached_property
    def _comb_lookup_arrays(self):
        """(sorted all-keys array, encoded-row values) for the combined
        fallback lookup (keys are disjoint by construction)."""
        nl = self._nl
        nh = self._heavy_keys_np.shape[0]
        comb = np.concatenate([self._light_keys_np,
                               self._heavy_keys_np])
        enc = np.concatenate([np.arange(nl, dtype=np.int32),
                              nl + 1 + np.arange(nh, dtype=np.int32)])
        srt = np.argsort(comb, kind="stable")
        return comb[srt], enc[srt]

    @functools.cached_property
    def _comb_lookup(self):
        return make_key_lookup(self._comb_lookup_arrays[0])

    @functools.cached_property
    def _native_probe(self):
        """Fused native rolling-hash + key-probe callable
        ``(codes, lengths) -> rof`` for the big-key-space fallback, or
        None (tiny key sets / toolchain missing) -- round 5, replaces
        the numpy Horner + HostKeyIndex passes on the protein path."""
        try:
            from rappas_tpu.native import probe_rows
        except Exception:
            return None
        hki = self._comb_lookup
        if not isinstance(hki, HostKeyIndex):
            return None     # small key set: numpy path is already fast
        keys, vals = self._comb_lookup_arrays
        k, S, nl = self.k, self.alphabet.n_states, self._nl
        lo, shift = hki.lo, hki.shift

        def run(codes, lengths):
            return probe_rows(codes, lengths, k, S, keys, vals, lo,
                              shift, nl)
        try:        # force the g++ build now; fall back on failure
            run(np.zeros((1, k), np.int8), np.full(1, k, np.int32))
        except Exception:
            return None
        return run

    def _rows_from_codes(self, codes: np.ndarray,
                         lengths: np.ndarray) -> np.ndarray:
        """Encoded row per window straight from state codes (the
        postings scoring path): direct table, fused native probe, or
        the numpy two-pass fallback."""
        if self._rof_np is not None:
            kidx = self._host_kmer_indices(codes, lengths)
            space = self.alphabet.n_states ** self.k
            return self._rof_np[np.where(kidx >= 0, kidx, space)]
        probe = self._native_probe
        if probe is not None:
            return probe(codes, lengths)
        return self._host_rows(self._host_kmer_indices(codes, lengths))

    # -------------------------------------------------------------- #
    def _expand_ambiguities(self, codes: np.ndarray, matrix: np.ndarray,
                            lengths: np.ndarray):
        """Host expansion + device placement (see the _host variant)."""
        h = self._expand_ambiguities_host(codes, matrix, lengths)
        if h is None:
            return None
        kidx, alt_win, win_read, win_inv_w, is_mean = h
        return (self._map_alt_rows(kidx),
                self._put_repl(alt_win),
                self._put_repl(win_read),
                self._put_repl(win_inv_w),
                self._put_repl(is_mean))

    def _expand_ambiguities_host(self, codes: np.ndarray,
                                 matrix: np.ndarray, lengths: np.ndarray):
        """Expand IUPAC windows into alternative k-mer rows (host side).

        Alternative generation reproduces the reference's cycling scheme
        (``AmbigSequenceKnife.java:240-258``): for W = prod(|alts_p|)
        alternatives, ambiguous position p takes ``alts_p[j mod |alts_p|]``
        in alternative j.

        Fully vectorized for single-ambiguity windows -- the ONLY kind
        reachable at practical k, since ``max_ambig = floor(k^(1/S))``
        (``AmbigSequenceKnife.java:95``) is 1 for every DNA k <= 15 and
        every amino k: sliding-window counts via cumsum, one fancy-index
        gather of the window codes, and a repeat/cumsum flattening of
        the variable per-window alternative counts.  Multi-ambiguity
        windows (DNA k >= 16 only) take a small per-window loop
        reproducing the reference's diagonal enumeration including its
        duplicates.
        """
        k, S = self.k, self.alphabet.n_states
        amb_mask = codes == AMBIG_CODE
        if not amb_mask.any() or self.max_ambig < 1:
            return None
        B, L = codes.shape
        Q = L - k + 1
        if Q <= 0:
            return None
        weights = S ** np.arange(k - 1, -1, -1, dtype=np.int64)

        def touched_windows(mask):
            """(rows, window-ids) of every window containing a set
            position of ``mask`` -- sparse sliding-window expansion
            (ambiguities are rare; a dense [B, L] cumsum costs ~20 ms
            per 16k-read batch, this is sub-ms at realistic N rates)."""
            mb, mp = np.nonzero(mask)
            lo = np.maximum(mp - (k - 1), 0)
            hi = np.minimum(mp, Q - 1)
            n = hi - lo + 1
            tot = int(n.sum())
            rb = np.repeat(mb, n)
            rq = np.repeat(lo, n) + (np.arange(tot) -
                                     np.repeat(np.cumsum(n) - n, n))
            return rb, rq

        # per-window ambiguity counts, sparsely: sort/collapse the
        # touched (read, window) keys -- never materialises a [B, Q]
        # counts array (the nonzero/add.at over it cost ~10 ms/batch)
        rb, rq = touched_windows(amb_mask)
        key = rb.astype(np.int64) * Q + rq
        uniq_key, counts = np.unique(key, return_counts=True)
        wb = (uniq_key // Q).astype(np.int64)
        wq = (uniq_key % Q).astype(np.int64)
        valid = (counts <= self.max_ambig) & \
            (wq <= lengths[wb].astype(np.int64) - k)
        in_read = np.arange(L)[None, :] < lengths[:, None]
        pad_mask = (codes == PAD_CODE) & in_read   # mid-read junk only
        if pad_mask.any():
            pb, pq = touched_windows(pad_mask)
            valid &= ~np.isin(uniq_key, pb.astype(np.int64) * Q + pq)

        is_mean = not self.ambiguities_with_max
        kidx_parts, alt_win_parts = [], []
        win_read_parts, win_inv_w_parts = [], []
        n_win = 0

        single = valid & (counts == 1)
        sb, sq = wb[single], wq[single]
        if sb.size:
            win = codes[sb[:, None],
                        sq[:, None] + np.arange(k)[None, :]]
            win = win.astype(np.int64)            # [nw, k]
            p = np.argmax(win < 0, axis=1)        # the ambiguous slot
            chars = matrix[sb, sq + p]
            # base index with 0 at the ambiguous slot (Horner; an int64
            # matmul over materialised variants has no BLAS path and
            # costs ~10x this), variant j adds alt_j * S^(k-1-p)
            base = np.zeros(sb.size, np.int64)
            for i in range(k):
                base = base * S + np.maximum(win[:, i], 0)
            Wn = self._alt_len[chars]             # [nw]
            tot = int(Wn.sum())
            awin = np.repeat(np.arange(sb.size), Wn)
            j = np.arange(tot) - np.repeat(np.cumsum(Wn) - Wn, Wn)
            alt_codes = self._alt_tab[chars[awin], j]
            kidx_parts.append(base[awin] + alt_codes * weights[p[awin]])
            alt_win_parts.append(awin.astype(np.int32))
            win_read_parts.append(sb.astype(np.int32))
            win_inv_w_parts.append((1.0 / Wn).astype(np.float32))
            n_win = sb.size

        multi = valid & (counts > 1)
        if multi.any():                           # DNA k >= 16 only
            for b, q in zip(wb[multi], wq[multi]):
                window = codes[b, q:q + k].astype(np.int64)
                amb_pos = np.flatnonzero(window < 0)
                alts = [self._amb_alts[int(matrix[b, q + p])]
                        for p in amb_pos]
                W = int(np.prod([len(x) for x in alts]))
                variants = np.repeat(window[None, :], W, axis=0)
                for p, al in zip(amb_pos, alts):
                    variants[:, p] = np.asarray(al)[
                        np.arange(W) % len(al)]
                kidx_parts.append(variants @ weights)
                alt_win_parts.append(np.full(W, n_win, np.int32))
                win_read_parts.append(np.int32(b)[None])
                win_inv_w_parts.append(np.float32(1.0 / W)[None])
                n_win += 1
        if n_win == 0:
            return None
        return (np.concatenate(kidx_parts),       # raw k-mer indices
                np.concatenate(alt_win_parts),
                np.concatenate(win_read_parts),
                np.concatenate(win_inv_w_parts),
                np.full(n_win, is_mean, bool))

    def _host_kmer_indices(self, codes: np.ndarray,
                           lengths: np.ndarray) -> np.ndarray:
        return host_kmer_indices(codes, lengths, self.k,
                                 self.alphabet.n_states)

    def _heavy_hits(self, codes: np.ndarray, lengths: np.ndarray):
        """Compact the batch's heavy-k-mer hits on host.

        Heavy keys are few, so the searchsorted over [B, Q] indices is
        cheap, and hits are rare -- shipping only the actual (row, read)
        pairs (padded to a power-of-two bucket, sorted by read) keeps
        the device heavy pass proportional to real hits instead of to
        B*Q pad-row gathers.  Pads point at the zero row / last read.
        Returns (rows int32[n_pad], reads int32[n_pad]) or None.
        """
        hk = self._heavy_keys_np
        nh = hk.shape[0]
        if nh == 0:
            return None
        kidx = self._host_kmer_indices(codes, lengths)
        if self._rof_np is not None:
            space = self.alphabet.n_states ** self.k
            rof = self._rof_np[np.where(kidx >= 0, kidx, space)]
            hit = rof > self._nl
            hrows_all = rof - (self._nl + 1)
        else:
            pos = self._heavy_lookup(kidx)       # miss -> nh
            hrows_all = np.minimum(pos, nh - 1)
            hit = pos < nh
        b_ids, q_ids = np.nonzero(hit)
        n = b_ids.shape[0]
        if n == 0:
            return None
        n_pad = max(256, 1 << int(np.ceil(np.log2(n))))
        rows = np.full(n_pad, nh, np.int32)        # pad -> zero row
        reads = np.full(n_pad, codes.shape[0] - 1, np.int32)
        rows[:n] = hrows_all[hit]
        reads[:n] = b_ids                          # ascending (row-major)
        return self._put_repl(rows), self._put_repl(reads)

    _searchsorted_rows = staticmethod(
        lambda keys, kidx: searchsorted_rows(keys, kidx))

    # bucket-indexed host lookups, built on first use (round 4: plain
    # searchsorted was a 28k reads/s host ceiling at protein scale)
    @functools.cached_property
    def _db_lookup(self):
        return make_key_lookup(self.db.keys)

    @functools.cached_property
    def _heavy_lookup(self):
        # still used by _heavy_hits (sharded placements); the light
        # pass was folded into _comb_lookup in round 5
        return make_key_lookup(self._heavy_keys_np)

    def _map_alt_rows(self, kidx: np.ndarray):
        """Raw alternative k-mer indices -> per-table row spec."""
        if self.table == "direct":
            return (self._put_repl(kidx.astype(np.int32)),)
        if self.table == "compact":
            return (self._put_repl(self._db_lookup(kidx)),)
        if self._rof_np is not None:
            # decode light/heavy rows straight from the direct table
            space = self.alphabet.n_states ** self.k
            rof = self._rof_np[np.where(kidx >= 0, kidx, space)]
            nl, nh = self._nl, self._heavy_keys_np.shape[0]
            return (self._put_repl(np.minimum(rof, nl)),
                    self._put_repl(np.where(rof > nl, rof - (nl + 1),
                                            nh).astype(np.int32)))
        rof = self._host_rows(kidx)
        nl, nh = self._nl, self._heavy_keys_np.shape[0]
        return (self._put_repl(np.minimum(rof, nl).astype(np.int32)),
                self._put_repl(np.where(rof > nl, rof - (nl + 1),
                                        nh).astype(np.int32)))

    def _apply_ambiguities(self, amb, acc):
        """Dense modes: add window contributions into the accumulator."""
        rows_spec, alt_win, win_read, win_inv_w, is_mean = amb
        if self.direct_parts is not None:
            rows_f = alt_delta_rows_split(self.direct_parts, self.scale,
                                          rows_spec[0])
        else:
            rows_f = alt_delta_rows(self.D, self.scale, rows_spec[0])
        return ambiguous_pass(rows_f, alt_win, win_read, win_inv_w,
                              is_mean, acc)
