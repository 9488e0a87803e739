"""Multi-host placement: process setup, input sharding, output merge.

Reads are embarrassingly parallel (SURVEY.md section 5, "long-context"
note), so the multi-host story is: every host initialises
``jax.distributed``, reads its round-robin shard of the query stream,
places it against its (replicated or sharded) DB copy over the global
mesh, and writes a per-host jplace; rank 0 merges.  Collectives between
hosts ride DCN via the same psum/all-gather used intra-slice -- nothing
NCCL/MPI-like to manage (SURVEY.md section 2.8 item 3).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, Iterator


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialise jax.distributed (no-op for single-process runs).

    Returns (process_id, num_processes).
    """
    import jax

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def shard_reads(reads: Iterable[tuple[str, str]], process_id: int,
                num_processes: int) -> Iterator[tuple[str, str]]:
    """Round-robin shard of a read stream for this host.

    Note: duplicate-read detection (the jplace ``nm`` grouping) then
    applies per shard; duplicates split across hosts appear as separate
    placements with identical ``p`` rows -- semantically equivalent
    jplace, documented deviation from the strictly-serial reference.
    """
    for i, item in enumerate(reads):
        if i % num_processes == process_id:
            yield item


def merge_jplace(parts: list[str | Path], out: str | Path) -> None:
    """Merge per-host jplace files (same tree/fields) into one."""
    parts = [Path(p) for p in parts]
    merged = None
    for p in parts:
        j = json.loads(p.read_text())
        if merged is None:
            merged = j
            continue
        if j["tree"] != merged["tree"] or j["fields"] != merged["fields"]:
            raise ValueError(f"jplace {p} is not mergeable (tree/fields "
                             "differ)")
        merged["placements"].extend(j["placements"])
    if merged is None:
        raise ValueError("no jplace parts to merge")
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
