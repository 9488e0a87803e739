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
from rappas_tpu.seqio import ReadBatcher, md5_checksum, read_sequences
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
    # still in flight) | placement dict | _UNPLACED | _FILTERED
    seen: dict[bytes, object] = {}
    batcher = ReadBatcher(batch_size=config.batch_size)
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

    def sharded_reads():
        reads = read_sequences(query_path)
        if config.read_shard is None:
            return reads
        from rappas_tpu.parallel.distributed import shard_reads
        return shard_reads(reads, *config.read_shard)

    def unique_reads():
        for order, (header, seq) in enumerate(sharded_reads()):
            counts["total"] += 1
            key = md5_checksum(seq)
            prev = seen.get(key)
            if prev is None:
                seen[key] = []
                yield (header, key, order), seq
            elif isinstance(prev, list):
                prev.append(header)
            elif prev is _UNPLACED:
                # the reference re-processes duplicates of unplaced reads
                # and lists each occurrence (PlacementProcess.java:591-629
                # only dedups *placed* reads)
                notplaced.write(header + "\n")
                counts["unplaced"] += 1
            elif prev is _FILTERED:
                pass  # nsbound-filtered reads are re-filtered silently
            else:
                JplaceWriter.add_duplicate(prev, header)

    def handle_batch(meta, in_flight_batch):
        res = in_flight_batch.result()
        pre = writer.precompute_batch(res)
        for i, (header, key, order) in enumerate(meta):
            counts["unique"] += 1
            dups = seen[key]
            if res.n_matched[i] == 0:
                notplaced.write(header + "\n")
                counts["unplaced"] += 1
                for dup_header in dups:
                    notplaced.write(dup_header + "\n")
                    counts["unplaced"] += 1
                seen[key] = _UNPLACED
                continue
            placement = writer.add_placement_packed(header, pre, i, order)
            if placement is None:
                seen[key] = _FILTERED
                continue
            for dup_header in dups:
                JplaceWriter.add_duplicate(placement, dup_header)
            seen[key] = placement
            if tsv:
                best = int(res.top_edges[i][0])
                score = float(np.float32(res.top_scores[i][0]))
                q = header.split(" ")[0]
                r = resolution.get(str(best)) if resolution else None
                if r is not None:
                    ar_id, ar_lbl, ext_id, ext_lbl, orig = r
                    tsv.write(f"{q}\t{ar_id}\t{ar_lbl}\t{ext_id}\t"
                              f"{ext_lbl}\t{orig}\t"
                              f"{arr.labels[orig]}\t{score}\n")
                else:
                    tsv.write(f"{q}\t\t\t\t\t{best}\t"
                              f"{arr.labels[best]}\t{score}\n")

    # keep a few batches in flight: device compute and both transfer
    # directions overlap with the host-side jplace assembly
    in_flight: list = []
    for meta, lens, mat in batcher.batches(unique_reads()):
        in_flight.append((meta, engine.score_async(mat, lens)))
        if len(in_flight) > 3:
            handle_batch(*in_flight.pop(0))
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
    log(f"{len(writer.placements)} placements written to {out}")
    return out
