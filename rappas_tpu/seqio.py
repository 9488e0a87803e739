"""Streaming FASTA / FASTQ readers and batching for the placement engine.

Replaces ``/root/reference/src/inputs/FASTAPointer.java`` /
``FASTQPointer.java``.  Reads are yielded as (header, sequence) pairs;
``#``-prefixed and empty lines are skipped like the reference
(``FASTAPointer.java:83-86``).  Multi-line sequences are concatenated.

The batcher groups reads into fixed-capacity numpy batches (padded to a
static length bucket) so the JAX placement kernel sees static shapes.
"""

from __future__ import annotations

import gzip
import hashlib
from typing import Iterator, Iterable

import numpy as np


def _open(path):
    p = str(path)
    if p.endswith(".gz"):
        return gzip.open(p, "rt")
    return open(p, "r")


def read_fasta(path) -> Iterator[tuple[str, str]]:
    header = None
    chunks: list[str] = []
    with _open(path) as f:
        for line in f:
            line = line.rstrip("\n").rstrip("\r")
            if not line or line.startswith("#"):
                continue
            if line.startswith(">"):
                if header is not None:
                    yield header, "".join(chunks)
                header = line[1:]
                chunks = []
            else:
                chunks.append(line)
        if header is not None:
            yield header, "".join(chunks)


def read_fastq(path) -> Iterator[tuple[str, str]]:
    with _open(path) as f:
        while True:
            h = f.readline()
            if not h:
                return
            h = h.rstrip("\n")
            if not h:
                continue
            if not h.startswith("@"):
                raise ValueError(f"malformed FASTQ header: {h!r}")
            seq = f.readline().rstrip("\n")
            plus = f.readline()
            f.readline()  # qualities
            if not plus.startswith("+"):
                raise ValueError("malformed FASTQ record")
            yield h[1:], seq


def read_sequences(path) -> Iterator[tuple[str, str]]:
    """Dispatch on extension: .fq/.fastq(.gz) -> FASTQ, else FASTA."""
    p = str(path)
    base = p[:-3] if p.endswith(".gz") else p
    if base.endswith((".fq", ".fastq")):
        return read_fastq(path)
    return read_fasta(path)


def md5_checksum(seq: str) -> bytes:
    """Duplicate-read key.

    The reference md5-hashes the sequence with gaps removed
    (``fasta.getSequence(true)`` strips '-', ``Fasta.java:34-39``;
    ``PlacementProcess.java:591-596``).
    """
    return hashlib.md5(seq.replace("-", "").encode("ascii")).digest()


class ReadBatcher:
    """Group reads into padded (batch, L) uint8 matrices by length bucket.

    Padding value is ``0xFF``.  Buckets are successive powers-of-two-ish
    length classes so XLA compiles a handful of kernel shapes, not one per
    read length.
    """

    def __init__(self, batch_size: int = 1024,
                 buckets: tuple[int, ...] = (64, 128, 256, 512, 1024, 4096,
                                             16384),
                 pad_batch: bool = True):
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets))
        #: pad the final partial batch up to ``batch_size`` rows (padding
        #: rows have length 0) so XLA compiles one shape per bucket
        self.pad_batch = pad_batch

    def bucket_for(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        return int(np.ceil(length / self.buckets[-1])) * self.buckets[-1]

    def batches(self, reads: Iterable[tuple[str, str]]):
        """Yield (headers, lengths int32[B], matrix uint8[B, L]) batches."""
        pend: dict[int, list[tuple[str, str]]] = {}
        for header, seq in reads:
            b = self.bucket_for(len(seq))
            lst = pend.setdefault(b, [])
            lst.append((header, seq))
            if len(lst) >= self.batch_size:
                yield self._emit(b, lst)
                pend[b] = []
        for b, lst in sorted(pend.items()):
            if lst:
                yield self._emit(b, lst)

    def _emit(self, bucket: int, items: list[tuple[str, str]]):
        n = self.batch_size if self.pad_batch else len(items)
        mat = np.full((n, bucket), 0xFF, np.uint8)
        lens = np.zeros(n, np.int32)
        headers = []
        for i, (h, s) in enumerate(items):
            raw = np.frombuffer(s.encode("ascii"), np.uint8)
            mat[i, :len(raw)] = raw
            lens[i] = len(raw)
            headers.append(h)
        return headers, lens, mat
