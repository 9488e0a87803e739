"""Placement pipeline: stream query reads -> jplace output.

Host orchestration around :class:`rappas_tpu.place.engine.PlacementEngine`,
mirroring ``/root/reference/src/main_v2/Main_PLACEMENT_v07.java`` /
``PlacementProcess.processQueries``:

* md5 dedup of identical read sequences BEFORE scoring; duplicates join
  the first occurrence's ``nm`` list (``PlacementProcess.java:591-629``).
  Because scoring is batched here (the reference is strictly serial),
  duplicates that arrive while their first occurrence is still in-flight
  are queued and attached when its batch completes;
* unplaced reads (no k-mer matched the DB) are listed in
  ``logs/notplaced_<query>.tsv`` -- every occurrence, like the reference,
  which re-processes duplicates of unplaced reads (``:797-806``);
* per-query TSV report ``logs/placements_<query>.tsv`` (``:937-962``);
* output file ``<workdir>/placements_<query>.jplace``
  (``Main_PLACEMENT_v07.java:313``); placement objects appear in
  first-occurrence read order even though batches complete out of order.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import numpy as np

from rappas_tpu.db import PhyloKmerDB
from rappas_tpu.place.engine import PlacementEngine
from rappas_tpu.place.jplace import JplaceWriter
from rappas_tpu.seqio import IndexBatcher, ingest_blocks
from rappas_tpu.utils import log

#: per-order dedup state codes (see _OrderState)
_IN_FLIGHT, _PLACED, _UNPLACED, _FILTERED = 0, 1, 2, 3


class _PyDedup:
    """Python fallback for :class:`rappas_tpu.native.NativeDedup`
    (identical contract: first occurrence -> -1 and registers the
    order; duplicate -> the registered first order)."""

    def __init__(self):
        self._m: dict[bytes, int] = {}

    def __call__(self, md5s: np.ndarray, orders: np.ndarray) -> np.ndarray:
        blob = np.ascontiguousarray(md5s, np.uint8).tobytes()
        ol = orders.tolist()
        out = np.empty(len(ol), np.int64)
        m = self._m
        for i, o in enumerate(ol):
            v = m.setdefault(blob[16 * i:16 * i + 16], o)
            out[i] = -1 if v == o else v
        return out


def _make_dedup():
    try:
        from rappas_tpu.native import NativeDedup
        return NativeDedup()
    except Exception:
        return _PyDedup()


class _OrderState:
    """Per-arrival-order placement state, array-backed so batch
    completion registers a whole batch with three vectorized stores.

    ``status[o]``: _IN_FLIGHT | _PLACED | _UNPLACED | _FILTERED;
    placed orders also carry ``(bidx, slot)`` -> the
    :class:`BatchPlacements` and in-batch read index a duplicate
    attaches to.  ``pending[o]`` queues full headers of duplicates that
    arrived while order ``o``'s batch was still in flight."""

    def __init__(self):
        n = 1 << 14
        self.status = np.zeros(n, np.int8)
        self.bidx = np.full(n, -1, np.int32)
        self.slot = np.zeros(n, np.int32)
        self.batches: list = []
        self.pending: dict[int, list] = {}

    def ensure(self, n):
        cur = self.status.shape[0]
        if n <= cur:
            return
        new = max(n, cur * 2)
        self.status = np.concatenate(
            [self.status, np.zeros(new - cur, np.int8)])
        self.bidx = np.concatenate(
            [self.bidx, np.full(new - cur, -1, np.int32)])
        self.slot = np.concatenate(
            [self.slot, np.zeros(new - cur, np.int32)])

    def register(self, batch, orders, placed, filtered):
        """Vectorized per-batch state store (orders: int64[n], placed /
        filtered: bool[n]; slots are in-batch read indices 0..n)."""
        bid = len(self.batches)
        self.batches.append(batch)
        self.ensure(int(orders.max()) + 1 if orders.size else 0)
        self.status[orders] = np.select(
            [placed, filtered], [_PLACED, _FILTERED], _UNPLACED)
        self.bidx[orders] = bid
        self.slot[orders] = np.arange(orders.shape[0], dtype=np.int32)

    def batch_of(self, order):
        return self.batches[int(self.bidx[order])], int(self.slot[order])


@dataclasses.dataclass
class PlacementConfig:
    keep_at_most: int = 7          # ArgumentsParser_v2.java:88
    keep_factor: float = 0.01      # :89
    guppy_compatible: bool = False
    treat_ambiguities: bool = True  # :90 (--noamb disables)
    ambiguities_with_max: bool = False  # --ambwithmax
    ns_bound: float = float("-inf")
    batch_size: int = 1024
    write_tsv: bool = True
    invocation: str = "rappas-tpu"
    precision: str = "f32"
    table: str = "auto"
    #: (host_id, num_hosts) -- this process places only its round-robin
    #: shard of the reads and writes ``placements_<q>.jplace.part<id>``
    #: (multi-host mode; rank 0 merges, see rappas_tpu.cli)
    read_shard: tuple | None = None


def place_queries(db: PhyloKmerDB, query_path, workdir,
                  config: PlacementConfig | None = None,
                  engine: PlacementEngine | None = None) -> Path:
    config = config or PlacementConfig()
    workdir = Path(workdir)
    logs = workdir / "logs"
    logs.mkdir(parents=True, exist_ok=True)
    qname = Path(query_path).name

    engine = engine or PlacementEngine(
        db, keep_at_most=config.keep_at_most,
        treat_ambiguities=config.treat_ambiguities,
        ambiguities_with_max=config.ambiguities_with_max,
        precision=config.precision, table=config.table)
    writer = JplaceWriter(db.tree, config.invocation,
                          guppy_compatible=config.guppy_compatible,
                          keep_factor=config.keep_factor)
    arr = db.arrays

    dedup = _make_dedup()
    reg = _OrderState()
    batcher = IndexBatcher(batch_size=config.batch_size)
    t0 = time.time()
    counts = {"total": 0, "unique": 0, "unplaced": 0}

    suffix = ("" if config.read_shard is None
              else f".part{config.read_shard[0]}")
    tsv = open(logs / f"placements_{qname}.tsv{suffix}", "w") \
        if config.write_tsv else None
    if tsv:
        tsv.write("Query\tARTree_NodeId\tARTree_NodeName\t"
                  "ExtendedTree_NodeId\tExtendedTree_NodeName\t"
                  "Original_NodeId\tOriginal_NodeName\tPP*\n")
    # --original-nodes DBs: the best edge resolves to an adjacent ghost
    # whose AR/extended mapping fills the TSV columns
    # (PlacementProcess.java:856-962; precomputed at build, see
    # rappas_tpu.build.pipeline.orinodes_resolution_table); default DBs
    # leave the four mapping columns empty exactly like the reference's
    # onlyFakes branch (PlacementProcess.java:951-959)
    resolution = db.meta.get("orinodes_resolution")
    notplaced = open(logs / f"notplaced_{qname}.tsv{suffix}", "w")

    # ZERO python loops over reads on the hot path: parse / md5 /
    # dedup-map / matrix fill run in native block calls
    # (rappas_tpu.native via seqio.ingest_blocks), state registration is
    # three vectorized stores, and python only touches actual
    # duplicates and unplaced reads.  The reference's strictly serial
    # equivalent is PlacementProcess.java:568-645.

    def handle_batch(meta, in_flight_batch):
        """Fold one completed batch into the writer -- array work per
        BATCH.  ``meta`` rows are ``(block, record_idx,
        arrival_order)``."""
        res = in_flight_batch.result()
        n = len(meta)
        counts["unique"] += n
        pre = writer.precompute_batch(res)
        placed = pre["n_keep"][:n] > 0
        filtered = np.zeros(n, bool)
        if config.ns_bound > float("-inf"):
            filtered = placed & (res.top_scores[:n, 0] < config.ns_bound)
            placed &= ~filtered
        headers = [m[0].header(m[1]) for m in meta]
        orders = np.fromiter((m[2] for m in meta), np.int64, n)
        reads = np.flatnonzero(placed)
        batch = writer.add_batch(headers, pre, reads, orders[reads])
        reg.register(batch, orders, placed, filtered)
        unplaced_lines = []
        # duplicates queued while this batch was in flight (rare):
        # resolve BEFORE listing unplaced so a first occurrence and its
        # early duplicates land together, like the serial reference
        pending_here = {}
        if reg.pending:
            oset = set(orders.tolist())
            for o in [o for o in reg.pending if o in oset]:
                pending_here[o] = reg.pending.pop(o)
        if not placed.all() or pending_here:
            placed_l = placed.tolist()
            filtered_l = filtered.tolist()
            for i, o in enumerate(orders.tolist()):
                dups = pending_here.get(o)
                if placed_l[i]:
                    for dup_header in dups or ():
                        JplaceWriter.add_duplicate(batch, i, dup_header)
                elif not filtered_l[i]:
                    unplaced_lines.append(headers[i])
                    unplaced_lines.extend(dups or ())
        if unplaced_lines:
            counts["unplaced"] += len(unplaced_lines)
            notplaced.write("\n".join(unplaced_lines) + "\n")
        if tsv and reads.size:
            best_l = res.top_edges[reads, 0].tolist()
            score_l = res.top_scores[reads, 0].tolist()
            lines = []
            for i, best, score in zip(reads.tolist(), best_l, score_l):
                q = headers[i].split(" ")[0]
                r = resolution.get(str(best)) if resolution else None
                if r is not None:
                    ar_id, ar_lbl, ext_id, ext_lbl, orig = r
                    lines.append(f"{q}\t{ar_id}\t{ar_lbl}\t{ext_id}\t"
                                 f"{ext_lbl}\t{orig}\t"
                                 f"{arr.labels[orig]}\t{score}")
                else:
                    lines.append(f"{q}\t\t\t\t\t{best}\t"
                                 f"{arr.labels[best]}\t{score}")
            tsv.write("\n".join(lines) + "\n")

    # keep a few batches in flight: device compute and both transfer
    # directions overlap with the host-side jplace assembly
    in_flight: list = []

    def submit(batch):
        meta, lens, mat = batch
        in_flight.append((meta, engine.score_async(mat, lens)))
        if len(in_flight) > 3:
            handle_batch(*in_flight.pop(0))

    shard = config.read_shard
    gidx = 0       # index over the whole file (round-robin host shard,
    #                rappas_tpu.parallel.distributed.shard_reads)
    order = 0      # arrival rank within this shard (output ordering)
    for pb in ingest_blocks(query_path):
        # md5 keys come pre-computed per block (gap-stripped sequence,
        # PlacementProcess.java:591-596 / Fasta.java:34-39); the
        # digest -> first-order map lives in native code (_make_dedup)
        if shard is None:
            sel = np.arange(pb.n, dtype=np.int64)
        else:
            g = gidx + np.arange(pb.n, dtype=np.int64)
            sel = np.flatnonzero(g % shard[1] == shard[0])
            gidx += pb.n
        counts["total"] += sel.shape[0]
        orders_blk = order + np.arange(sel.shape[0], dtype=np.int64)
        order += sel.shape[0]
        first = dedup(pb.md5s[sel], orders_blk)
        dup = np.flatnonzero(first >= 0)
        for j, fo in zip(sel[dup].tolist(), first[dup].tolist()):
            # duplicate occurrences (python only for actual dups):
            # attach to the placed first, re-list unplaced per
            # occurrence (the reference only dedups *placed* reads,
            # PlacementProcess.java:591-629), queue while the first's
            # batch is still in flight
            st = int(reg.status[fo]) if fo < reg.status.shape[0] \
                else _IN_FLIGHT
            if st == _PLACED:
                b, i = reg.batch_of(fo)
                JplaceWriter.add_duplicate(b, i, pb.header(j))
            elif st == _UNPLACED:
                notplaced.write(pb.header(j) + "\n")
                counts["unplaced"] += 1
            elif st == _IN_FLIGHT:
                reg.pending.setdefault(fo, []).append(pb.header(j))
            # _FILTERED: nsbound-filtered reads re-filter silently
        fresh = np.flatnonzero(first < 0)
        fresh_sel = sel[fresh]
        metas = [(pb, i, o) for i, o in
                 zip(fresh_sel.tolist(), orders_blk[fresh].tolist())]
        for b in batcher.add_block(pb, fresh_sel, metas):
            submit(b)
    for b in batcher.flush():
        submit(b)
    for item in in_flight:
        handle_batch(*item)

    if tsv:
        tsv.close()
    notplaced.close()

    out = workdir / f"placements_{qname}.jplace{suffix}"
    writer.write(out)
    dt = time.time() - t0
    log(f"{counts['total']} queries ({counts['unique']} unique, "
        f"{counts['unplaced']} unplaced) in {dt:.2f}s "
        f"({counts['total'] / max(dt, 1e-9):.0f} reads/s)")
    log(f"{writer.n_placements} placements written to {out}")
    return out
