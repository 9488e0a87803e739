"""Postings (light/heavy split) table mode vs the compact dense mode
and the serial oracle.

The postings layout targets the large-tree regime (BASELINE.json configs
3 and 5) where one dense row per k-mer is too wide; semantics must be
identical to the other table modes (same candidate set L, same scores
within f32-reordering tolerance).
"""

import numpy as np
import pytest

from rappas_tpu.db import PhyloKmerDB, build_csr
from rappas_tpu.place.engine import PlacementEngine
from rappas_tpu.tree import parse_newick
from tests.test_engine import batch_of, compare, synthetic_db


def skewed_db(seed=0, k=5, n_edges=40, n_kmers=300, heavy_frac=0.1):
    """DB with a skewed posting-length distribution: most k-mers get
    1-4 postings, a ``heavy_frac`` tail gets 12-30 (past the width-8
    light cap), exercising both sides of the split."""
    rng = np.random.default_rng(seed)
    labels = ",".join(f"L{i}:0.{i % 9 + 1}" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    kmers = rng.choice(4 ** k, size=n_kmers, replace=False)
    codes, edges = [], []
    for km in kmers:
        n = (int(rng.integers(12, 31)) if rng.random() < heavy_frac
             else int(rng.integers(1, 5)))
        es = rng.choice(np.arange(1, n_edges), size=min(n, n_edges - 1),
                        replace=False)
        codes.extend([km] * len(es))
        edges.extend(es)
    codes = np.array(codes, np.int64)
    edges = np.array(edges, np.int32)
    scores = (thr + 0.01 + rng.random(codes.shape[0]) * 2.5
              ).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    from rappas_tpu.alphabet import DNA
    return PhyloKmerDB(k=k, omega=1.5, alphabet=DNA, thr_log10=thr,
                       tree=tree, keys=keys, offsets=offsets,
                       edges=e, deltas=deltas)


def random_reads(db, n, L, seed=1, alphabet="ACGT"):
    rng = np.random.default_rng(seed)
    return ["".join(rng.choice(list(alphabet), L)) for _ in range(n)]


@pytest.fixture(scope="module")
def db():
    return skewed_db()


def test_postings_tables_roundtrip(db):
    """Every posting lands in exactly one of the two tables."""
    pt = db.postings_tables(width=8)
    lens = np.diff(db.offsets)
    assert pt.light_keys.shape[0] + pt.heavy_keys.shape[0] == db.n_kmers
    assert (lens[np.isin(db.keys, pt.light_keys)] <= 8).all()
    assert (lens[np.isin(db.keys, pt.heavy_keys)] > 8).all()
    # light rows reproduce the CSR content
    n_light_postings = int(np.count_nonzero(pt.light_deltas))
    n_heavy_postings = int(np.count_nonzero(pt.heavy_dense))
    assert n_light_postings + n_heavy_postings == db.nnz
    # spot-check one light and one heavy k-mer
    for key_arr in (pt.light_keys, pt.heavy_keys):
        kidx = int(key_arr[0])
        edges, scores = db.lookup(kidx)
        i = np.searchsorted(db.keys, kidx)
        if (np.diff(db.offsets))[i] <= 8:
            j = np.searchsorted(pt.light_keys, kidx)
            got = {int(e): float(d) for e, d in
                   zip(pt.light_edges[j], pt.light_deltas[j]) if d > 0}
        else:
            j = np.searchsorted(pt.heavy_keys, kidx)
            got = {int(e): float(d) for e, d in
                   enumerate(pt.heavy_dense[j]) if d > 0}
        want = {int(e): float(s - db.thr_log10)
                for e, s in zip(edges, scores)}
        assert set(got) == set(want)


def test_postings_matches_oracle(db):
    engine = PlacementEngine(db, table="postings")
    assert engine.table == "postings"
    compare(db, engine, random_reads(db, 24, 30))


def test_postings_matches_compact(db):
    """Same batch through both table modes: identical candidate counts
    and edges, scores equal within f32 reordering tolerance."""
    e_post = PlacementEngine(db, table="postings")
    e_comp = PlacementEngine(db, table="compact")
    mat, lens = batch_of(random_reads(db, 32, 40, seed=7))
    rp = e_post.score(mat.copy(), lens)
    rc = e_comp.score(mat.copy(), lens)
    assert np.array_equal(rp.n_matched, rc.n_matched)
    for i in range(mat.shape[0]):
        ep = [int(x) for x in rp.top_edges[i] if x >= 0]
        ec = [int(x) for x in rc.top_edges[i] if x >= 0]
        assert sorted(ep) == sorted(ec), f"read {i}"
        sp = sorted(float(x) for x, ed in
                    zip(rp.top_scores[i], rp.top_edges[i]) if ed >= 0)
        sc = sorted(float(x) for x, ed in
                    zip(rc.top_scores[i], rc.top_edges[i]) if ed >= 0)
        assert np.allclose(sp, sc, atol=5e-4), f"read {i}"


def test_postings_ambiguous_reads(db):
    engine = PlacementEngine(db, table="postings")
    reads = [r[:10] + "N" + r[11:] for r in random_reads(db, 8, 30,
                                                         seed=3)]
    compare(db, engine, reads)


def test_postings_ambiguous_max_mode(db):
    engine = PlacementEngine(db, table="postings",
                             ambiguities_with_max=True)
    reads = [r[:6] + "R" + r[7:] for r in random_reads(db, 6, 24,
                                                       seed=5)]
    compare(db, engine, reads, ambiguities_with_max=True)


def test_postings_light_only():
    """DB where no k-mer exceeds the width: heavy table is empty."""
    db = synthetic_db(n_edges=5, n_kmers=60)
    pt = db.postings_tables(width=64)
    assert pt.heavy_keys.shape[0] == 0
    engine = PlacementEngine(db, table="postings", postings_width=64)
    compare(db, engine, random_reads(db, 12, 25, seed=11))


def test_postings_heavy_only(db):
    """Width 0 pushes everything into the heavy dense matrix."""
    engine = PlacementEngine(db, table="postings", postings_width=0)
    compare(db, engine, random_reads(db, 12, 25, seed=13))


def test_postings_u16_rejected(db):
    with pytest.raises(ValueError):
        PlacementEngine(db, table="postings", precision="u16")


def test_auto_selects_postings_for_huge_compact(db, monkeypatch):
    monkeypatch.setattr(PlacementEngine, "DIRECT_BYTE_LIMIT", 1024)
    engine = PlacementEngine(db, table="auto")
    assert engine.table == "postings"
    compare(db, engine, random_reads(db, 6, 25, seed=17))


def test_postings_fallback_without_direct_table(db, monkeypatch):
    """When S^k exceeds the direct-index budget the light lookup falls
    back to binary search and heavy hits to host searchsorted (the
    protein / very-large-k path)."""
    monkeypatch.setattr(PlacementEngine, "DIRECT_INDEX_LIMIT", 0)
    engine = PlacementEngine(db, table="postings")
    assert engine._rof_np is None
    compare(db, engine, random_reads(db, 12, 30, seed=19))


def test_postings_protein_mode():
    """AA postings: 20^k index space, int64 keys, no direct table."""
    from rappas_tpu.alphabet import get_alphabet
    from rappas_tpu.tree import parse_newick
    rng = np.random.default_rng(4)
    aa = get_alphabet("amino")
    k, n_edges = 8, 12
    labels = ",".join(f"L{i}:0.2" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, 20)
    codes = rng.integers(0, 20 ** k, 500, dtype=np.int64)
    edges = rng.integers(1, n_edges, 500).astype(np.int32)
    scores = (thr + 0.01 + rng.random(500) * 2.0).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    db = PhyloKmerDB(k=k, omega=1.5, alphabet=aa, thr_log10=thr,
                     tree=tree, keys=keys, offsets=offsets,
                     edges=e, deltas=deltas)
    engine = PlacementEngine(db, table="postings")
    assert engine._rof_np is None
    letters = "ARNDCQEGHILKMFPSTWYV"
    reads = ["".join(rng.choice(list(letters), 25)) for _ in range(6)]
    # include one read built from a DB k-mer so something matches
    reads.append(db.alphabet.kmer_to_string(int(keys[0]), k) * 3)
    compare(db, engine, reads)


def test_postings_tiny_delta_membership():
    """An edge matched only by a threshold-grade (DELTA_TINY) posting
    must stay in the candidate list even when the per-read cumsum is
    large before its segment (f32 cancellation would zero its sum);
    membership is tested via the exact count cumsum."""
    from rappas_tpu.alphabet import DNA
    from rappas_tpu.db import DELTA_TINY
    from rappas_tpu.tree import parse_newick
    k, n_edges = 5, 10
    labels = ",".join(f"L{i}:0.2" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    # read = 8 distinct k-mers; 7 carry big deltas on low edge ids,
    # one carries a threshold-exact score (delta clamps to DELTA_TINY)
    # on the highest edge id, whose segment sorts last per read
    read = "ACGTACGTACGT"
    weights = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    code_of = {c: i for i, c in enumerate("ACGT")}
    kmers = [read[i:i + k] for i in range(len(read) - k + 1)]
    codes, edges, scores = [], [], []
    for j, km in enumerate(kmers):
        kidx = int(np.array([code_of[c] for c in km]) @ weights)
        if j == len(kmers) - 1:
            codes.append(kidx); edges.append(9); scores.append(float(thr))
        else:
            codes.append(kidx); edges.append(1 + j % 5)
            scores.append(float(thr) + 2.5)
    keys, offsets, e, deltas = build_csr(
        np.array(codes, np.int64), np.array(edges, np.int32),
        np.array(scores, np.float32), thr)
    db = PhyloKmerDB(k=k, omega=1.5, alphabet=DNA, thr_log10=thr,
                     tree=tree, keys=keys, offsets=offsets, edges=e,
                     deltas=deltas)
    assert (deltas == DELTA_TINY).any()
    engine = PlacementEngine(db, table="postings")
    mat = np.frombuffer(read.encode(), np.uint8)[None, :].copy()
    res = engine.score(mat, np.array([len(read)], np.int32))
    got = {int(x) for x in res.top_edges[0] if x >= 0}
    assert 9 in got, "threshold-grade posting dropped from candidates"
    rows_o, n_o = oracle_place(db, read)
    assert int(res.n_matched[0]) == n_o


def oracle_place(db, read):
    from rappas_tpu.place import oracle
    return oracle.place_read(db, read)


@pytest.mark.parametrize("mode", ["direct", "compact", "postings"])
def test_threshold_grade_score_all_modes(mode):
    """VERDICT r1 #1 regression: a score stored EXACTLY at threshold
    (delta clamps to DELTA_TINY) must survive every device table layout
    -- the edge stays in L, n_matched counts it, and its score is
    Q*thr within one clamp quantum.  Also asserts the clamp itself is a
    normal f32 (flush-to-zero on TPU would erase a subnormal clamp).

    Reference semantics: ``CustomHash_v4_FastUtil81.java:73-102`` stores
    the score and ``PlacementProcess.java:726-734`` still increments C
    and joins L for a threshold-grade match."""
    from rappas_tpu.alphabet import DNA
    from rappas_tpu.db import DELTA_TINY
    from rappas_tpu.tree import parse_newick

    assert float(DELTA_TINY) >= float(np.finfo(np.float32).tiny), \
        "DELTA_TINY must be a normal float32 (FTZ-safe)"

    k, n_edges = 5, 6
    labels = ",".join(f"L{i}:0.2" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    read = "AACGTTGCAT"  # 6 k-mers, all distinct (non-periodic)
    weights = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    code_of = {c: i for i, c in enumerate("ACGT")}
    kmers = [read[i:i + k] for i in range(len(read) - k + 1)]
    # edge 3 is matched ONLY at exact threshold by every k-mer
    codes, edges, scores = [], [], []
    for j, km in enumerate(kmers):
        kidx = int(np.array([code_of[c] for c in km]) @ weights)
        codes.append(kidx); edges.append(3); scores.append(float(thr))
        codes.append(kidx); edges.append(1); scores.append(float(thr) + 1.0)
    keys, offsets, e, deltas = build_csr(
        np.array(codes, np.int64), np.array(edges, np.int32),
        np.array(scores, np.float32), thr)
    db = PhyloKmerDB(k=k, omega=1.5, alphabet=DNA, thr_log10=thr,
                     tree=tree, keys=keys, offsets=offsets, edges=e,
                     deltas=deltas)
    assert (deltas == DELTA_TINY).sum() == len(kmers)
    engine = PlacementEngine(db, table=mode)
    mat = np.frombuffer(read.encode(), np.uint8)[None, :].copy()
    res = engine.score(mat, np.array([len(read)], np.int32))
    got = {int(x) for x in res.top_edges[0] if x >= 0}
    assert got == {1, 3}, f"{mode}: candidate set {got} != {{1, 3}}"
    assert int(res.n_matched[0]) == 2
    # edge 3's score is Q*thr + Q*DELTA_TINY ~= Q*thr
    q = len(kmers)
    i3 = [int(x) for x in res.top_edges[0]].index(3)
    s3 = float(res.top_scores[0][i3])
    assert abs(s3 - q * thr) < 1e-4, f"{mode}: score {s3} vs {q * thr}"
    rows_o, n_o = oracle_place(db, read)
    assert n_o == 2


def test_postings_split_light_table(db, monkeypatch):
    """Height-split light table (the >96MB regime, forced tiny here):
    both parts' gathers + select must equal the single-table result."""
    pairs_bytes = (db.postings_tables(8).light_keys.shape[0] + 1) * 64
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        pairs_bytes // 2 + 64)
    engine = PlacementEngine(db, table="postings")
    assert len(engine.light_parts) == 2
    reads = random_reads(db, 10, 30, seed=23)
    # include DB k-mers so light hits are guaranteed
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 4
              for k in db.keys[:3]]
    compare(db, engine, reads)


def test_postings_nway_split_light_table(db, monkeypatch):
    """N-part height split (the multi-GB config-3 regime, forced tiny
    here): part-routed two-stage gathers across 4+ parts must equal the
    single-table result."""
    pairs_bytes = (db.postings_tables(8).light_keys.shape[0] + 1) * 64
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        pairs_bytes // 4 + 64)
    engine = PlacementEngine(db, table="postings")
    assert len(engine.light_parts) >= 4
    reads = random_reads(db, 10, 30, seed=41)
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 4
              for k in db.keys[:6]]
    compare(db, engine, reads)
    # ambiguity alternatives take the full light_gather select across
    # all N parts
    amb = [r[:8] + "N" + r[9:] for r in random_reads(db, 6, 30, seed=43)]
    compare(db, engine, amb)


def test_postings_nway_split_matches_unsplit_bitwise(db, monkeypatch):
    """Scores through a forced 5-part split are bit-equal to the unsplit
    engine (same summation order per read)."""
    e_ref = PlacementEngine(db, table="postings")
    assert len(e_ref.light_parts) == 1
    pairs_bytes = (db.postings_tables(8).light_keys.shape[0] + 1) * 64
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        pairs_bytes // 5 + 64)
    e_split = PlacementEngine(db, table="postings")
    e_split.enable_routed_windows(False)   # pin the two-stage contract
    assert len(e_split.light_parts) >= 5
    reads = random_reads(db, 12, 40, seed=47)
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 5
              for k in db.keys[:4]]
    reads = reads * 2          # repetition so the unique stage engages
    mat, lens = batch_of(reads)
    r1 = e_ref.score(mat.copy(), lens.copy())
    r2 = e_split.score(mat.copy(), lens.copy())
    assert np.array_equal(r1.top_edges, r2.top_edges)
    assert np.array_equal(r1.top_scores.view(np.uint32),
                          r2.top_scores.view(np.uint32))
    assert np.array_equal(r1.n_matched, r2.n_matched)


def test_postings_split_no_two_stage_fallback(db, monkeypatch):
    """Split table with the two-stage gather disabled (unique cap 0):
    the both-parts + select fallback path must stay oracle-correct."""
    pairs_bytes = (db.postings_tables(8).light_keys.shape[0] + 1) * 64
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        pairs_bytes // 2 + 64)
    monkeypatch.setattr(PlacementEngine, "TWO_STAGE_MAX_UNIQUE", 0)
    engine = PlacementEngine(db, table="postings")
    assert len(engine.light_parts) == 2
    reads = random_reads(db, 10, 30, seed=31)
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 4
              for k in db.keys[:3]]
    compare(db, engine, reads)


def test_postings_two_stage_unique(db, monkeypatch):
    """Two-stage batch-unique gather (forced): scores bit-equal to the
    direct-gather engine."""
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES", 1 << 62)
    e_direct = PlacementEngine(db, table="postings")
    assert not e_direct._light_slow

    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES", 0)
    # one part only (splitting skipped when 2x over budget), slow regime
    e_slow = PlacementEngine(db, table="postings")
    assert e_slow._light_slow and len(e_slow.light_parts) == 1

    reads = random_reads(db, 8, 40, seed=29)
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 6
              for k in db.keys[:4]]
    # heavy repetition across the batch so the unique stage engages
    reads = reads * 3
    mat, lens = batch_of(reads)
    r1 = e_direct.score(mat.copy(), lens.copy())
    r2 = e_slow.score(mat.copy(), lens.copy())
    assert np.array_equal(r1.top_edges, r2.top_edges)
    assert np.array_equal(r1.top_scores.view(np.uint32),
                          r2.top_scores.view(np.uint32))
    assert np.array_equal(r1.n_matched, r2.n_matched)
    compare(db, e_slow, reads[:12])


def test_postings_ambiguous_reads_compact_slots(db):
    """IUPAC windows route through the compact-slot dense side."""
    engine = PlacementEngine(db, table="postings")
    base = db.alphabet.kmer_to_string(int(db.keys[0]), db.k) * 5
    reads = [base[:12] + "N" + base[13:], base, "N" * 20,
             base[:5] + "R" + base[6:]]
    compare(db, engine, reads)


def test_postings_pipeline_multibatch_bitwise(db, monkeypatch):
    """The software-pipelined two-stage path (batch i scored in the
    same program that gathers batch i+1's compact table) must be
    bit-equal to per-batch scoring, across in-flight batches fetched in
    order and a flushed tail."""
    pairs_bytes = (db.postings_tables(8).light_keys.shape[0] + 1) * 64
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        pairs_bytes // 3 + 64)
    e_pipe = PlacementEngine(db, table="postings")
    e_pipe.enable_pipeline()
    e_ref = PlacementEngine(db, table="postings")
    e_ref.enable_routed_windows(False)     # pipeline rides two-stage
    batches = []
    for seed in (5, 6, 7):
        reads = random_reads(db, 8, 40, seed=seed)
        reads += [db.alphabet.kmer_to_string(int(k), db.k) * 5
                  for k in db.keys[seed:seed + 3]]
        reads = reads * 2       # unique stage engages
        batches.append(batch_of(reads))
    pend = [e_pipe.score_async(m.copy(), l.copy()) for m, l in batches]
    assert e_pipe._pp_tail is not None      # tail deferred
    for (m, l), p in zip(batches, pend):
        r1 = p.result()
        r2 = e_ref.score(m.copy(), l.copy())
        assert np.array_equal(r1.top_edges, r2.top_edges)
        assert np.array_equal(r1.top_scores.view(np.uint32),
                              r2.top_scores.view(np.uint32))
        assert np.array_equal(r1.n_matched, r2.n_matched)
    assert e_pipe._pp_tail is None          # tail was flushed


def test_postings_unique_overflow_batch_split(db, monkeypatch):
    """When the batch-unique set exceeds the compact-table budget the
    engine halves the batch (SplitPending) instead of taking the slow
    both-parts+select fallback; results must be bit-equal to the
    unsplit engine."""
    e_ref = PlacementEngine(db, table="postings")
    pairs_bytes = (db.postings_tables(8).light_keys.shape[0] + 1) * 64
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        pairs_bytes // 3 + 64)
    monkeypatch.setattr(PlacementEngine, "TWO_STAGE_MAX_UNIQUE", 6)
    monkeypatch.setattr(PlacementEngine, "MIN_SPLIT_B", 2)
    e_split = PlacementEngine(db, table="postings")
    e_split.enable_routed_windows(False)   # pin the overflow contract
    assert len(e_split.light_parts) >= 2
    reads = random_reads(db, 12, 40, seed=51)
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 5
              for k in db.keys[:4]]
    mat, lens = batch_of(reads)
    from rappas_tpu.place.engine import SplitPending
    pend = e_split.score_async(mat.copy(), lens.copy())
    assert isinstance(pend, SplitPending)   # the overflow path engaged
    r2 = pend.result()
    r1 = e_ref.score(mat.copy(), lens.copy())
    assert np.array_equal(r1.top_edges, r2.top_edges)
    assert np.array_equal(r1.top_scores.view(np.uint32),
                          r2.top_scores.view(np.uint32))
    assert np.array_equal(r1.n_matched, r2.n_matched)


def test_postings_routed_windows(db, monkeypatch):
    """Part-routed window gathers (round 5): hit windows are packed
    per owning part on host and gathered with one independent gather
    per part -- candidate sets, counts and edge order must match the
    unsplit engine; scores agree within f32 reordering tolerance
    (per-read summation order differs by design), and the routed
    engine stays oracle-correct including ambiguity reads."""
    e_ref = PlacementEngine(db, table="postings")
    pairs_bytes = (db.postings_tables(8).light_keys.shape[0] + 1) * 64
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        pairs_bytes // 4 + 64)
    e_r = PlacementEngine(db, table="postings")
    assert len(e_r.light_parts) >= 4
    e_r.enable_routed_windows()
    reads = random_reads(db, 16, 40, seed=53)
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 5
              for k in db.keys[:4]]
    mat, lens = batch_of(reads)
    r1 = e_ref.score(mat.copy(), lens.copy())
    r2 = e_r.score(mat.copy(), lens.copy())
    assert np.array_equal(r1.top_edges, r2.top_edges)
    assert np.array_equal(r1.n_matched, r2.n_matched)
    np.testing.assert_allclose(r2.top_scores, r1.top_scores,
                               rtol=0, atol=2e-4)
    # oracle agreement on the routed engine directly, incl. ambiguity
    # windows (they ride the dense side, unchanged by routing)
    amb = [r[:8] + "N" + r[9:] for r in random_reads(db, 4, 30, seed=54)]
    compare(db, e_r, random_reads(db, 8, 30, seed=55) + amb)
