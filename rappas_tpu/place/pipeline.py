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

_UNPLACED = "unplaced"
_FILTERED = "filtered"


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
                          keep_factor=config.keep_factor,
                          ns_bound=config.ns_bound)
    arr = db.arrays

    # seen[md5] is: list (pending duplicate headers, first occurrence
    # still in flight) | (BatchPlacements, read index) | _UNPLACED |
    # _FILTERED
    seen: dict[bytes, object] = {}
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

    # one python loop per read total: md5 dedup bookkeeping only -- the
    # parse / md5 / matrix work runs in native block calls
    # (rappas_tpu.native.parse_fasta_block via seqio.ingest_blocks);
    # the reference's strictly serial equivalent is
    # PlacementProcess.java:568-645

    def handle_batch(meta, in_flight_batch):
        """Fold one completed batch into the writer -- array work per
        BATCH, python work only for the per-read dedup dict and the
        rare unplaced/filtered reads.  ``meta`` rows are
        ``(block, record_idx, md5_key, arrival_order)``."""
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
        orders = np.fromiter((m[3] for m in meta), np.int64, n)
        reads = np.flatnonzero(placed)
        batch = writer.add_batch(headers, pre, reads, orders[reads])
        placed_l = placed.tolist()
        filtered_l = filtered.tolist()
        unplaced_lines = []
        for i, (_, _, key, order) in enumerate(meta):
            dups = seen[key]
            if placed_l[i]:
                if dups:
                    for dup_header in dups:
                        JplaceWriter.add_duplicate(batch, i, dup_header)
                seen[key] = (batch, i)
            elif filtered_l[i]:
                seen[key] = _FILTERED
            else:
                unplaced_lines.append(headers[i])
                unplaced_lines.extend(dups)
                seen[key] = _UNPLACED
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
        # PlacementProcess.java:591-596 / Fasta.java:34-39)
        keys_blob = pb.md5s.tobytes()
        fresh_i: list[int] = []
        fresh_meta: list[tuple] = []
        for i in range(pb.n):
            if shard is not None:
                mine = gidx % shard[1] == shard[0]
                gidx += 1
                if not mine:
                    continue
            counts["total"] += 1
            key = keys_blob[16 * i:16 * i + 16]
            prev = seen.get(key)
            if prev is None:
                seen[key] = []
                fresh_i.append(i)
                fresh_meta.append((pb, i, key, order))
            elif isinstance(prev, list):
                prev.append(pb.header(i))
            elif prev is _UNPLACED:
                # the reference re-processes duplicates of unplaced
                # reads and lists each occurrence
                # (PlacementProcess.java:591-629 only dedups *placed*
                # reads)
                notplaced.write(pb.header(i) + "\n")
                counts["unplaced"] += 1
            elif prev is _FILTERED:
                pass  # nsbound-filtered reads re-filter silently
            else:
                JplaceWriter.add_duplicate(prev[0], prev[1],
                                           pb.header(i))
            order += 1
        for b in batcher.add_block(pb, fresh_i, fresh_meta):
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
