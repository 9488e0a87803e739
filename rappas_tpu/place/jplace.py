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
    """
    __slots__ = ("pre", "headers", "reads", "orders", "extra")

    def __init__(self, pre: dict, headers: list, reads: np.ndarray,
                 orders: np.ndarray):
        self.pre = pre
        self.headers = headers
        self.reads = reads
        self.orders = orders
        self.extra: dict[int, list[str]] = {}


class JplaceWriter:
    def __init__(self, tree: Tree, invocation: str,
                 guppy_compatible: bool = False,
                 keep_factor: float = 0.01,
                 ns_bound: float = float("-inf")):
        self.tree = tree
        self.invocation = invocation
        self.guppy = guppy_compatible
        self.keep_factor = keep_factor
        self.ns_bound = ns_bound
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

    def add_batch(self, headers: list, pre: dict, reads: np.ndarray,
                  orders: np.ndarray) -> BatchPlacements:
        """Register one scored batch's placed reads.

        ``reads``: in-batch indices of reads that placed (and passed
        --nsbound); ``orders``: their global first-occurrence ranks;
        ``headers[i]`` the full header of in-batch read ``i``.
        """
        b = BatchPlacements(pre, headers,
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
    def _batch_row_texts(self, b: BatchPlacements) -> list[str]:
        """jplace ``"p"`` row-list text per placement of one batch."""
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
        if self._native_fmt:
            try:
                from rappas_tpu.native import format_placement_rows
                text, off = format_placement_rows(
                    nodes, scores, lwrs, row_off,
                    self._estr_buf, self._estr_off,
                    self._dstr_buf, self._dstr_off, self.guppy)
                s = text.decode("ascii")
                off = off.tolist()
                return [s[off[i]:off[i + 1]]
                        for i in range(reads.shape[0])]
            except Exception:      # toolchain missing: python fallback
                self._native_fmt = False
        es, ds = self._edge_str, self._distal_str
        nl = nodes.tolist()
        sl = scores.tolist()
        wl = lwrs.tolist()
        out = []
        for i in range(reads.shape[0]):
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

    def _ordered_texts(self):
        """Yield '{"p":...,"nm":...}' text per placement in
        first-occurrence read order (the reference's serial order)."""
        if not self._batches:
            return
        sizes = [b.reads.shape[0] for b in self._batches]
        all_orders = np.concatenate([b.orders for b in self._batches])
        bidx = np.repeat(np.arange(len(sizes)), sizes)
        pos = np.concatenate([np.arange(s) for s in sizes]) \
            if sizes else np.zeros(0, np.int64)
        srt = np.argsort(all_orders, kind="stable")
        texts = [None] * len(self._batches)
        for t in srt.tolist():
            j = int(bidx[t])
            b = self._batches[j]
            if texts[j] is None:
                texts[j] = self._batch_row_texts(b)
            p = int(pos[t])
            i = int(b.reads[p])
            header = b.headers[i]
            extra = b.extra.get(i)
            if extra:
                nm = ",".join(
                    "[%s,1]" % _json_str(h) for h in [header] + extra)
            else:
                nm = "[%s,1]" % _json_str(header)
            yield '{"p":[%s],"nm":[%s]}' % (texts[j][p], nm)

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
            "placements": [json.loads(t) for t in self._ordered_texts()],
            "version": 3,
            "metadata": {"invocation": self.invocation},
            "fields": self._fields(),
        }

    def write(self, path) -> None:
        """Stream the jplace JSON, one placement per line (diffs well).

        Hand-rolled serialisation: ``json.dump`` dominates the host-side
        placement budget at high read counts (measured 12s per 100k
        reads)."""
        with open(path, "w") as f:
            f.write('{"tree":')
            f.write(json.dumps(jplace_tree_string(self.tree)))
            f.write(',\n"placements":[')
            out = []
            first = True
            for t in self._ordered_texts():
                out.append(t)
                if len(out) >= 4096:
                    f.write("\n" if first else ",\n")
                    first = False
                    f.write(",\n".join(out))
                    out = []
            if out:
                f.write("\n" if first else ",\n")
                f.write(",\n".join(out))
            f.write('\n],\n"version":3,\n"metadata":')
            f.write(json.dumps({"invocation": self.invocation}))
            f.write(',\n"fields":')
            f.write(json.dumps(self._fields()))
            f.write("}\n")
