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


def _iter_placements(text: str):
    """Yield placement objects from a jplace document incrementally.

    Locates the ``"placements"`` array and ``raw_decode``s one element
    at a time, so only the source *text* (not a parsed object tree) is
    resident -- the single-host writer was hand-rolled because
    ``json.dump`` was ~10x too slow at scale
    (``rappas_tpu/place/jplace.py``); the multi-host merge gets the
    same treatment here.
    """
    dec = json.JSONDecoder()
    i = text.index('"placements"')
    i = text.index("[", i) + 1
    n = len(text)
    while True:
        while i < n and text[i] in " \t\r\n,":
            i += 1
        if i >= n or text[i] == "]":
            return
        obj, i = dec.raw_decode(text, i)
        yield obj


def _decode_key(text: str, key: str):
    """Decode one top-level value from a jplace document without parsing
    the (potentially huge) placements array."""
    dec = json.JSONDecoder()
    i = text.index(f'"{key}"')
    i = text.index(":", i) + 1
    while text[i] in " \t\r\n":
        i += 1
    obj, _ = dec.raw_decode(text, i)
    return obj


def merge_jplace(parts: list[str | Path], out: str | Path) -> None:
    """Merge per-host jplace files (same tree/fields) into one.

    Streams: holds one part's text at a time and writes placements as
    they decode (one per line, like the single-host writer), never
    materialising the merged placement list.
    """
    parts = [Path(p) for p in parts]
    if not parts:
        raise ValueError("no jplace parts to merge")
    head_text = parts[0].read_text()
    head = {k: _decode_key(head_text, k) for k in ("tree", "fields")}
    try:
        head["metadata"] = _decode_key(head_text, "metadata")
    except ValueError:
        head["metadata"] = {}
    del head_text
    with open(out, "w") as f:
        f.write('{"tree":')
        f.write(json.dumps(head["tree"]))
        f.write(',\n"placements":[')
        first = True
        for p in parts:
            text = p.read_text()
            if _decode_key(text, "tree") != head["tree"] or \
                    _decode_key(text, "fields") != head["fields"]:
                raise ValueError(f"jplace {p} is not mergeable "
                                 "(tree/fields differ)")
            for obj in _iter_placements(text):
                f.write("\n" if first else ",\n")
                first = False
                f.write(json.dumps(obj, separators=(",", ":")))
        f.write('\n],\n"version":3,\n"metadata":')
        f.write(json.dumps(head.get("metadata", {})))
        f.write(',\n"fields":')
        f.write(json.dumps(head["fields"]))
        f.write("}\n")
