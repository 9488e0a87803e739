"""Serial reference-semantics placement oracle (host, slow, exact).

A direct re-expression of ``PlacementProcess.processQueries``
(``/root/reference/src/core/algos/PlacementProcess.java:471-1118``) and its
ambiguity handlers (``:1129-1236``), using float32 arithmetic in the same
order as the Java code.  Used by the test suite to validate the batched
TPU engine and by ``--parity`` debugging; never on the hot path.
"""

from __future__ import annotations

import math

import numpy as np

from rappas_tpu.db import PhyloKmerDB

f32 = np.float32


def place_read(db: PhyloKmerDB, seq: str, keep_at_most: int = 7,
               treat_ambiguities: bool = True,
               ambiguities_with_max: bool = False):
    """Score one read.

    Returns (rows, n_matched) where rows is a list of
    (edge_node_id, score f32, lwr float) sorted best-first over the top
    ``min(|L|, keep_at_most)`` candidates, or ([], 0) when no k-mer
    matched (read unplaced).
    """
    a = db.alphabet
    k = db.k
    S_states = a.n_states
    thr = f32(db.thr_log10)
    thr_lin = f32(db.thr_linear)
    codes = a.encode(seq)
    L_len = codes.shape[0]
    Q = L_len - k + 1
    if Q <= 0:
        return [], 0
    max_ambig = int(math.floor(k ** (1.0 / S_states)))

    S: dict[int, np.float32] = {}
    C: dict[int, int] = {}
    L: list[int] = []
    weights = S_states ** np.arange(k - 1, -1, -1, dtype=np.int64)

    def hit(x: int, delta_from_thr: np.float32):
        if C.get(x, 0) == 0:
            L.append(x)
            S[x] = f32(f32(Q) * thr)
        C[x] = C.get(x, 0) + 1
        S[x] = f32(S[x] + delta_from_thr)

    for q in range(Q):
        window = codes[q:q + k]
        amb = window < 0
        n_amb = int(amb.sum())
        if n_amb == 0:
            idx = int(window.astype(np.int64) @ weights)
            pairs = db.lookup(idx)
            if pairs is None:
                continue
            for x, pp in zip(*pairs):
                hit(int(x), f32(f32(pp) - thr))
        elif treat_ambiguities and n_amb <= max_ambig:
            # expansion: reference cycling scheme
            # (AmbigSequenceKnife.java:240-258)
            amb_pos = np.flatnonzero(amb)
            alts = [a.ambiguity_codes(seq[q + p]) for p in amb_pos]
            W = int(np.prod([len(x) for x in alts]))
            S_amb: dict[int, np.float32] = {}
            C_amb: dict[int, int] = {}
            L_amb: list[int] = []
            for j in range(W):
                w2 = window.copy()
                for p, al in zip(amb_pos, alts):
                    w2[p] = al[j % len(al)]
                idx = int(w2.astype(np.int64) @ weights)
                pairs = db.lookup(idx)
                if pairs is None:
                    continue
                for x, pp in zip(*pairs):
                    x = int(x)
                    pp = f32(pp)
                    if ambiguities_with_max:
                        if C_amb.get(x, 0) == 0:
                            L_amb.append(x)
                            S_amb[x] = pp
                        elif pp > S_amb[x]:
                            S_amb[x] = pp
                        C_amb[x] = C_amb.get(x, 0) + 1
                    else:
                        if C_amb.get(x, 0) == 0:
                            L_amb.append(x)
                        C_amb[x] = C_amb.get(x, 0) + 1
                        # linear-space accumulation, f32
                        # (PlacementProcess.java:1154)
                        S_amb[x] = f32(S_amb.get(x, f32(0.0)) +
                                       f32(10.0 ** float(pp)))
            for x in L_amb:
                if ambiguities_with_max:
                    hit(x, f32(S_amb[x] - thr))
                else:
                    avg = f32((S_amb[x] + f32(
                        f32(W - C_amb[x]) * thr_lin)) / f32(W))
                    hit(x, f32(f32(math.log10(float(avg))) - thr))
        # too many ambiguities: skipped, Q unchanged
        # (AmbigSequenceKnife.java:230-232)

    if not L:
        return [], 0

    num_best = min(len(L), keep_at_most)
    # top-k selection + ascending sort (fillBestScoreList,
    # PlacementProcess.java:396-451)
    ranked = sorted(L, key=lambda x: float(S[x]), reverse=True)[:num_best]
    scores = [float(S[x]) for x in ranked]
    best, lowest = scores[0], scores[-1]
    shift = best if lowest <= -308.0 else 0.0
    all_sums = sum(10.0 ** (s - shift) for s in scores)
    rows = [(x, f32(S[x]), (10.0 ** (float(S[x]) - shift)) / all_sums)
            for x in ranked]
    return rows, len(L)
