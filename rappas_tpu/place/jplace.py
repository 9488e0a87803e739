"""jplace (JSON placement) output.

Reproduces the reference's jplace assembly
(``/root/reference/src/main_v2/Main_PLACEMENT_v07.java:216-315`` and
``PlacementProcess.java:974-1047``):

* ``tree``: original tree newick with branch lengths (12 decimals),
  internal labels and ``{edge_id}`` labels;
* ``fields`` default order ``[edge_num, likelihood, like_weight_ratio,
  distal_length, pendant_length]``; ``--guppy-compat`` order
  ``[distal_length, edge_num, like_weight_ratio, likelihood,
  pendant_length]`` (``Main_PLACEMENT_v07.java:281-297``);
* one placement object per *distinct* read sequence; duplicate reads are
  appended to the ``nm`` list (full header for the first occurrence,
  header truncated at the first space for duplicates --
  ``PlacementProcess.java:605-612,1052-1060``);
* keep-factor cutoff: after the best row, stop at the first row with
  ``lwr < best_lwr * keep_factor`` (``PlacementProcess.java:996-1000``);
* ``version: 3`` and ``metadata.invocation``.

Performance: the reference assembles one json_simple object tree per
value at ~500 reads/s; here placements are stored as per-batch ARRAY
records (zero per-read python objects on the hot path) and the ``"p"``
rows of a whole batch are formatted by one native call
(``rappas_tpu/native/jplacefmt.cpp``, shortest-round-trip doubles via
``std::to_chars``) with a pure-python fallback.
"""

from __future__ import annotations

import json

import numpy as np

from rappas_tpu.tree import Tree, write_newick


def jplace_tree_string(tree: Tree) -> str:
    return write_newick(tree, branch_lengths=True, internal_labels=True,
                        jplace_labels=True, id_prefix=False)


def _json_str(h: str) -> str:
    """JSON string literal; fast path for the typical clean header."""
    if h.isascii() and h.isprintable() and '"' not in h and "\\" not in h:
        return '"%s"' % h
    return json.dumps(h)


class BatchPlacements:
    """All placements of one scored batch, as arrays.

    ``reads[j]`` is the in-batch read index of placement ``j``;
    ``orders[j]`` its global first-occurrence rank (used to restore the
    reference's serial output order, batches complete out of order).
    ``extra[i]`` holds duplicate-read sub-headers attached to read ``i``.
    Headers live as one utf-8 byte blob + offsets (round 5: no per-read
    python strings on the hot path; only reads that hit an output edge
    case ever decode)."""
    __slots__ = ("pre", "hdr_blob", "hdr_off", "reads", "orders",
                 "extra", "lines")

    def __init__(self, pre: dict, hdr_blob: np.ndarray,
                 hdr_off: np.ndarray, reads: np.ndarray,
                 orders: np.ndarray):
        self.pre = pre
        self.hdr_blob = hdr_blob
        self.hdr_off = hdr_off
        self.reads = reads
        self.orders = orders
        self.extra: dict[int, list[str]] = {}
        #: eagerly-formatted native line blob (set by the writer's
        #: background formatter; None = format at write time)
        self.lines = None

    def header(self, i: int) -> str:
        return self.hdr_blob[self.hdr_off[i]:self.hdr_off[i + 1]] \
            .tobytes().decode("utf-8", "replace")


class JplaceWriter:
    def __init__(self, tree: Tree, invocation: str,
                 guppy_compatible: bool = False,
                 keep_factor: float = 0.01):
        # NOTE: the --nsbound score filter is applied by the pipeline
        # BEFORE reads reach this writer (place_queries.handle_batch);
        # the writer only ever sees reads that passed it
        self.tree = tree
        self.invocation = invocation
        self.guppy = guppy_compatible
        self.keep_factor = keep_factor
        self._batches: list[BatchPlacements] = []
        arr = tree.to_arrays()
        self._jplace_ids = arr.jplace_edge_id
        self._branch_len = arr.branch_len
        # per-node cached decimal fragments: edge_num and distal_length
        # depend only on the node id, so the per-row work left is two
        # float prints (likelihood, lwr)
        self._edge_str = [str(int(j)) for j in self._jplace_ids]
        self._distal_str = [repr(float(np.float32(b / np.float32(2.0))))
                            for b in self._branch_len]
        # flat buffers for the native formatter
        self._estr_buf = "".join(self._edge_str).encode("ascii")
        self._estr_off = np.zeros(len(self._edge_str) + 1, np.int32)
        np.cumsum([len(s) for s in self._edge_str],
                  out=self._estr_off[1:])
        self._dstr_buf = "".join(self._distal_str).encode("ascii")
        self._dstr_off = np.zeros(len(self._distal_str) + 1, np.int32)
        np.cumsum([len(s) for s in self._distal_str],
                  out=self._dstr_off[1:])
        self._native_fmt = True

    # -------------------------------------------------------------- #
    @property
    def n_placements(self) -> int:
        return sum(b.reads.shape[0] for b in self._batches)

    def precompute_batch(self, res) -> dict:
        """Vectorised per-batch derivation of everything ``p`` rows need:
        jplace edge ids, distal lengths, the keep-factor cut
        (``PlacementProcess.java:996-1022``).  Returns arrays indexed per
        read."""
        edges = res.top_edges
        valid = edges >= 0
        safe = np.maximum(edges, 0)
        lwr = res.top_lwr
        keep = valid.copy()
        if keep.shape[1] > 1:
            keep[:, 1:] &= lwr[:, 1:] >= (lwr[:, :1] * self.keep_factor)
        keep = np.logical_and.accumulate(keep, axis=1)
        n_keep = keep.sum(axis=1).astype(np.int64)
        return {"node": safe, "scores": res.top_scores, "lwr": lwr,
                "n_keep": n_keep}

    def add_batch(self, hdr_blob: np.ndarray, hdr_off: np.ndarray,
                  pre: dict, reads: np.ndarray,
                  orders: np.ndarray) -> BatchPlacements:
        """Register one scored batch's placed reads.

        ``reads``: in-batch indices of reads that placed (and passed
        --nsbound); ``orders``: their global first-occurrence ranks;
        ``hdr_blob``/``hdr_off``: the batch's full headers as one utf-8
        byte blob + int64 offsets (read ``i``'s header is
        ``hdr_blob[hdr_off[i]:hdr_off[i+1]]``).
        """
        b = BatchPlacements(pre, hdr_blob, hdr_off,
                            np.asarray(reads, np.int64),
                            np.asarray(orders, np.int64))
        self._batches.append(b)
        return b

    @staticmethod
    def add_duplicate(batch: BatchPlacements, i: int, header: str) -> None:
        """Register an identical read on an existing placement
        (sub-header = up to first space, ``PlacementProcess.java:
        598-612``)."""
        batch.extra.setdefault(i, []).append(header.split(" ")[0])

    # -------------------------------------------------------------- #
    def _batch_rows(self, b: BatchPlacements):
        """Masked row arrays + offsets for one batch's placements."""
        pre = b.pre
        reads = b.reads
        n_keep = pre["n_keep"][reads]
        K = pre["node"].shape[1]
        mask = np.arange(K)[None, :] < n_keep[:, None]
        nodes = pre["node"][reads][mask]
        scores = pre["scores"][reads][mask]
        lwrs = pre["lwr"][reads][mask]
        row_off = np.zeros(reads.shape[0] + 1, np.int64)
        np.cumsum(n_keep, out=row_off[1:])
        return nodes, scores, lwrs, row_off

    def _batch_rows_native(self, b: BatchPlacements):
        """``(rows_blob bytes, rows_off)`` via the native formatter, or
        None when the toolchain is missing."""
        if not self._native_fmt:
            return None
        nodes, scores, lwrs, row_off = self._batch_rows(b)
        try:
            from rappas_tpu.native import format_placement_rows
            return format_placement_rows(
                nodes, scores, lwrs, row_off,
                self._estr_buf, self._estr_off,
                self._dstr_buf, self._dstr_off, self.guppy)
        except Exception:          # toolchain missing: python fallback
            self._native_fmt = False
            return None

    def _batch_row_texts(self, b: BatchPlacements) -> list[str]:
        """jplace ``"p"`` row-list text per placement of one batch."""
        nat = self._batch_rows_native(b)
        if nat is not None:
            s = nat[0].decode("ascii")
            off = nat[1].tolist()
            return [s[off[i]:off[i + 1]]
                    for i in range(b.reads.shape[0])]
        nodes, scores, lwrs, row_off = self._batch_rows(b)
        es, ds = self._edge_str, self._distal_str
        nl = nodes.tolist()
        sl = scores.tolist()
        wl = lwrs.tolist()
        out = []
        for i in range(b.reads.shape[0]):
            lo, hi = int(row_off[i]), int(row_off[i + 1])
            if self.guppy:
                out.append(",".join(
                    "[%s,%s,%r,%r,0.0]" % (ds[nl[r]], es[nl[r]],
                                           wl[r], sl[r])
                    for r in range(lo, hi)))
            else:
                out.append(",".join(
                    "[%s,%r,%r,%s,0.0]" % (es[nl[r]], sl[r],
                                           wl[r], ds[nl[r]])
                    for r in range(lo, hi)))
        return out

    def _batch_lines(self, b: BatchPlacements):
        """Fully-assembled ``{"p":..,"nm":..},\\n`` lines of one batch
        (native): ``(blob, line_off, rows_blob, rows_off)``.  None when
        the toolchain is missing."""
        nat = self._batch_rows_native(b)
        if nat is None:
            return None
        rows_blob, rows_off = nat
        from rappas_tpu.native import (format_placement_lines,
                                       gather_ranges)
        hb, hdr_off = gather_ranges(b.hdr_blob, b.hdr_off[b.reads],
                                    b.hdr_off[b.reads + 1])
        blob, off = format_placement_lines(rows_blob, rows_off,
                                           hb.tobytes(), hdr_off)
        return blob, off, rows_blob, rows_off

    def _ordered_chunks(self):
        """Yield placement text as BYTES chunks in first-occurrence read
        order (the reference's serial order).  A chunk holds >= 1
        complete ``{"p":...,"nm":...}`` objects joined by b",\\n"; runs
        of consecutive placements from one batch are sliced from the
        batch's native line blob in one go, so per-placement python work
        only remains for duplicate-read ``nm`` lists and the no-toolchain
        fallback."""
        if not self._batches:
            return
        bl = self._batches
        sizes = [b.reads.shape[0] for b in bl]
        all_orders = np.concatenate([b.orders for b in bl])
        bidx = np.repeat(np.arange(len(sizes)), sizes)
        pos = np.concatenate([np.arange(s) for s in sizes]) \
            if sizes else np.zeros(0, np.int64)
        srt = np.argsort(all_orders, kind="stable")
        bid_s = bidx[srt]
        pos_s = pos[srt]
        n = srt.shape[0]
        run_starts = np.flatnonzero(np.concatenate(
            [[True], (bid_s[1:] != bid_s[:-1]) |
             (pos_s[1:] != pos_s[:-1] + 1)])) if n else np.zeros(0,
                                                                 np.int64)
        run_ends = np.append(run_starts[1:], n)
        lines = [None] * len(bl)
        texts = [None] * len(bl)
        extra_pos = [None] * len(bl)

        def py_line(b, j, ent, p):
            i = int(b.reads[p])
            extra = b.extra.get(i)
            header = b.header(i)
            nm = ",".join("[%s,1]" % _json_str(h)
                          for h in [header] + (extra or []))
            if ent is not False:
                rows = ent[2][ent[3][p]:ent[3][p + 1]].decode("ascii")
            else:
                if texts[j] is None:
                    texts[j] = self._batch_row_texts(b)
                rows = texts[j][p]
            return ('{"p":[%s],"nm":[%s]}' % (rows, nm)).encode("utf-8")

        for s, e in zip(run_starts.tolist(), run_ends.tolist()):
            j = int(bid_s[s])
            b = bl[j]
            if lines[j] is None:
                # prefer the eagerly-formatted blob (background
                # formatter thread, pipeline round 5); extras added
                # after formatting stay correct -- their placements are
                # re-rendered from the rows blob via py_line, the blob
                # is only sliced around them
                lines[j] = (b.lines if b.lines is not None
                            else self._batch_lines(b)) or False
                if b.extra:
                    # positions (placement ranks) whose reads carry
                    # duplicate nm entries -- sliced around below
                    er = np.flatnonzero(np.isin(
                        b.reads, np.fromiter(b.extra, np.int64,
                                             len(b.extra))))
                    extra_pos[j] = set(er.tolist())
            ent = lines[j]
            p0, p1 = int(pos_s[s]), int(pos_s[e - 1])
            if ent is False:
                for p in range(p0, p1 + 1):
                    yield py_line(b, j, ent, p)
                continue
            ep = extra_pos[j]
            if not ep:
                blob, off = ent[0], ent[1]
                yield blob[off[p0]:off[p1 + 1] - 2]   # strip last ",\n"
                continue
            # slice clean sub-runs, render nm-extra placements in python
            blob, off = ent[0], ent[1]
            q0 = p0
            for p in range(p0, p1 + 2):
                if p <= p1 and p not in ep:
                    continue
                if q0 < p:
                    yield blob[off[q0]:off[p] - 2]
                if p <= p1:
                    yield py_line(b, j, ent, p)
                q0 = p + 1

    # -------------------------------------------------------------- #
    def _fields(self) -> list[str]:
        if self.guppy:
            return ["distal_length", "edge_num", "like_weight_ratio",
                    "likelihood", "pendant_length"]
        return ["edge_num", "likelihood", "like_weight_ratio",
                "distal_length", "pendant_length"]

    def to_dict(self) -> dict:
        return {
            "tree": jplace_tree_string(self.tree),
            "placements": [json.loads(t) for c in self._ordered_chunks()
                           for t in c.split(b",\n")],
            "version": 3,
            "metadata": {"invocation": self.invocation},
            "fields": self._fields(),
        }

    def write(self, path) -> None:
        """Stream the jplace JSON, one placement per line (diffs well).

        Hand-rolled serialisation: ``json.dump`` dominates the host-side
        placement budget at high read counts (measured 12s per 100k
        reads); since round 4 whole batch runs are native-formatted byte
        chunks (``jplacefmt.cpp``)."""
        with open(path, "wb") as f:
            f.write(b'{"tree":')
            f.write(json.dumps(jplace_tree_string(self.tree)).encode())
            f.write(b',\n"placements":[')
            first = True
            for c in self._ordered_chunks():
                f.write(b"\n" if first else b",\n")
                first = False
                f.write(c)
            f.write(b'\n],\n"version":3,\n"metadata":')
            f.write(json.dumps({"invocation": self.invocation}).encode())
            f.write(b',\n"fields":')
            f.write(json.dumps(self._fields()).encode())
            f.write(b"}\n")
