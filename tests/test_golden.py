"""Golden differential tests with HAND-DERIVED expected values.

Round-1 validation compared the engine only against this repo's own
Python oracle -- if the builder misread the Java, oracle and engine
would be wrong together.  The constants below were derived by hand,
directly from the reference source, for a 3-taxon tree / k=2 DB small
enough to enumerate on paper:

* threshold ``PP*_thr = (omega/S)^k`` -> ``(1.5/4)^2 = 0.140625``
  (``Main_DBBUILD_3.java:165-166``);
* word registration: a k-mer is stored for a ghost node iff the product
  of its per-site posteriors is >= the threshold
  (``WordExplorer_v3.java:98-143``: sum of log10 >= log10 threshold);
* per (kmer, edge) the max product over ghost nodes / start positions
  is kept (``CustomHash_v4_FastUtil81.java:73-102``);
* read score ``S[e] = Q*thr + sum_matched (pp - thr)`` which collapses
  to ``log10(prod of matched products)`` when all Q k-mers match
  (``PlacementProcess.java:726-734``);
* ambiguity mean mode: the window contributes
  ``log10((sum_hit pp + n_miss * PP*_thr) / W)``
  (``PlacementProcess.java:1161-1172``);
* LWR over the candidate list with the max shift
  (``PlacementProcess.java:384-451``); jplace rows
  ``[edge_num, likelihood, lwr, branch_len/2, 0.0]``
  (``PlacementProcess.java:1016-1022``).

Every expected number in GOLDEN_DB / the read table is a plain product
of the fixture probabilities below -- checkable with a pocket
calculator.  No rappas_tpu code was used to produce them.
"""

import json

import numpy as np
import pytest

from rappas_tpu.alignment import Alignment
from rappas_tpu.alphabet import DNA
from rappas_tpu.ar.results import ARResults
from rappas_tpu.build.pipeline import BuildConfig, generate_kmers
from rappas_tpu.extend import extend_tree
from rappas_tpu.place.engine import PlacementEngine
from rappas_tpu.tree import parse_newick

#: per-site posterior profiles of the X0 ghost injected on each edge
#: (columns: site 0..3; each cell letter -> probability).  X1 ghosts get
#: uniform 0.25 everywhere: 0.25^2 = 0.0625 < 0.140625, so they register
#: nothing and every edge's postings come from its X0 alone.
PROFILES = {
    "A": [{"A": .8, "T": .1, "C": .06, "G": .04},
          {"A": .7, "C": .2, "T": .06, "G": .04},
          {"C": .9, "A": .05, "T": .03, "G": .02},
          {"G": .6, "A": .3, "T": .06, "C": .04}],
    "B": [{"T": .8, "A": .1, "C": .06, "G": .04},
          {"T": .7, "G": .2, "A": .06, "C": .04},
          {"G": .9, "T": .05, "A": .03, "C": .02},
          {"C": .6, "T": .3, "A": .06, "G": .04}],
    "ab": [{"A": .5, "C": .4, "T": .06, "G": .04}] * 4,
    "C": [{"G": .9, "A": .04, "T": .03, "C": .03}] * 4,
}

#: hand enumeration of every 2-mer window with product >= 0.140625,
#: max-merged over start positions: kmer -> {edge label: product}
GOLDEN_DB = {
    "AA": {"A": .8 * .7, "ab": .5 * .5},
    "AC": {"A": .7 * .9, "ab": .5 * .4},      # A: max(.8*.2, .7*.9)
    "CC": {"A": .2 * .9, "ab": .4 * .4},
    "CG": {"A": .9 * .6},
    "CA": {"A": .9 * .3, "ab": .4 * .5},
    "TT": {"B": .8 * .7},
    "TG": {"B": .7 * .9},                      # B: max(.8*.2, .7*.9)
    "GG": {"B": .2 * .9, "C": .9 * .9},
    "GC": {"B": .9 * .6},
    "GT": {"B": .9 * .3},
}

THR = 0.140625          # (1.5/4)^2
#: ambiguity means for read "ACN" window "CN" -> alts CA, CC, CG, CT
MEAN_A = (.27 + .18 + .54 + THR) / 4          # CT misses
MEAN_AB = (.2 + .16 + THR + THR) / 4          # CG, CT miss

#: read -> list of (edge label, score as log10(product))
GOLDEN_READS = {
    "ACG": [("A", .63 * .54), ("ab", .2 * THR)],
    "GG": [("C", .81), ("B", .18 * THR / THR)],   # single kmer: pp
    "TTT": [("B", .56 * .56)],                    # TT matched twice
    "ACN": [("A", .63 * MEAN_A), ("ab", .2 * MEAN_AB)],
}


def build_golden_db(exact: bool):
    original = parse_newick("((A:0.1,B:0.2)ab:0.3,C:0.4)root;")
    original.reset_jplace_edge_ids()
    extended = extend_tree(original, n_ghosts=1)
    ext_align = Alignment.from_records(
        DNA, [("A", "ACGT"), ("B", "ACGT"), ("C", "ACGT")]
    ).add_gap_rows([n.label for n in extended.fake_leaves])

    by_label = {n.label: n.id for n in original.nodes}
    n_ids = max(n.id for n in extended.nodes) + 1
    probas = np.full((n_ids, 4, 4), np.nan, np.float32)
    for node in extended.nodes:
        if node.is_leaf or not node.is_fake:
            continue
        orig_id = extended.fake_to_original_id(node.id)
        orig_label = original.by_id(orig_id).label
        if node.label.endswith("_X0"):
            prof = PROFILES[orig_label]
            for site, cell in enumerate(prof):
                for letter, p in cell.items():
                    code = DNA.char_to_code[ord(letter)]
                    probas[node.id, site, code] = np.float32(
                        np.log10(np.float32(p)))
        else:  # X1: uniform -> below threshold everywhere
            probas[node.id, :, :] = np.float32(np.log10(np.float32(0.25)))

    ar = ARResults(ar_tree=extended, probas=probas,
                   ar_to_extended={n.id: n.id for n in extended.nodes})
    cfg = BuildConfig(k=2, omega=1.5, exact_explorer=exact)
    db = generate_kmers(ar, extended, ext_align, original, DNA, cfg,
                        gap_jumps=False)
    return db, by_label


@pytest.mark.parametrize("exact", [False, True])
def test_db_matches_hand_derivation(exact):
    """Both explorer implementations must reproduce the hand-enumerated
    postings: same kmer set, same edges, scores == log10(product)."""
    db, by_label = build_golden_db(exact)
    dump = db.to_json_dump()
    id_of = by_label
    assert sorted(dump.keys()) == sorted(GOLDEN_DB.keys())
    for word, exp in GOLDEN_DB.items():
        got = dump[word]
        exp_ids = {id_of[lbl]: prod for lbl, prod in exp.items()}
        assert sorted(got.keys()) == sorted(str(i) if isinstance(
            next(iter(got)), str) else i for i in exp_ids), word
        for edge_id, prod in exp_ids.items():
            key = edge_id if edge_id in got else str(edge_id)
            assert abs(got[key] - np.log10(prod)) < 2e-6, \
                f"{word} edge {edge_id}: {got[key]} vs log10({prod})"


@pytest.mark.parametrize("table", ["direct", "compact", "postings"])
def test_placement_matches_hand_derivation(table):
    """All three device table modes must reproduce the hand-derived
    read scores (candidate sets exact, scores within f32 tolerance)."""
    db, by_label = build_golden_db(exact=False)
    engine = PlacementEngine(db, table=table)
    reads = list(GOLDEN_READS.keys())
    Lmax = max(len(r) for r in reads)
    mat = np.full((len(reads), Lmax), 0xFF, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        mat[i, :len(r)] = np.frombuffer(r.encode(), np.uint8)
        lens[i] = len(r)
    res = engine.score(mat, lens)
    for i, read in enumerate(reads):
        exp = GOLDEN_READS[read]
        assert res.n_matched[i] == len(exp), read
        got = {int(e): float(s) for e, s in
               zip(res.top_edges[i], res.top_scores[i]) if e >= 0}
        for rank, (lbl, prod) in enumerate(exp):
            eid = by_label[lbl]
            assert eid in got, f"{read}: edge {lbl} missing"
            assert abs(got[eid] - np.log10(prod)) < 5e-6, \
                f"{read} edge {lbl}: {got[eid]} vs log10({prod})"
        # ranking: first expected row is the best edge
        assert int(res.top_edges[i][0]) == by_label[exp[0][0]], read


def test_jplace_matches_hand_derivation(tmp_path):
    """End-to-end CLI-path jplace vs hand-computed rows: exact edge
    ids, fp-tolerant likelihood/LWR (SURVEY section 7.3 comparator)."""
    from rappas_tpu.place.pipeline import PlacementConfig, place_queries

    db, by_label = build_golden_db(exact=False)
    q = tmp_path / "reads.fasta"
    with open(q, "w") as f:
        for i, r in enumerate(GOLDEN_READS):
            f.write(f">r{i}\n{r}\n")
    out = place_queries(db, q, tmp_path, PlacementConfig(batch_size=8))
    j = json.loads(out.read_text())
    assert j["fields"] == ["edge_num", "likelihood", "like_weight_ratio",
                           "distal_length", "pendant_length"]
    jplace_id = {n.label: int(n.jplace_edge_id) for n in db.tree.nodes}
    branch = {n.label: float(np.float32(n.branch_len) / np.float32(2.0))
              for n in db.tree.nodes}
    assert len(j["placements"]) == len(GOLDEN_READS)
    for p, (read, exp) in zip(j["placements"], GOLDEN_READS.items()):
        scores = [np.log10(prod) for _, prod in exp]
        shift = scores[0]
        ws = [10.0 ** (s - shift) for s in scores]
        lwrs = [w / sum(ws) for w in ws]
        assert len(p["p"]) == len(exp), read
        for row, (lbl, _), s, lwr in zip(p["p"], exp, scores, lwrs):
            assert row[0] == jplace_id[lbl], (read, lbl)
            assert abs(row[1] - s) < 5e-6, (read, lbl)
            assert abs(row[2] - lwr) < 1e-5, (read, lbl)
            assert abs(row[3] - branch[lbl]) < 1e-9, (read, lbl)
            assert row[4] == 0.0
