"""Device engine vs the serial reference-semantics oracle."""

import numpy as np
import pytest

from rappas_tpu.db import PhyloKmerDB, build_csr
from rappas_tpu.place import oracle
from rappas_tpu.place.engine import PlacementEngine
from rappas_tpu.tree import parse_newick


def synthetic_db(seed=0, k=5, n_edges=6, n_kmers=400):
    """Random small DB over a star-ish tree."""
    rng = np.random.default_rng(seed)
    labels = ",".join(f"L{i}:0.{i + 1}" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    n = n_kmers * 3
    codes = rng.integers(0, 4 ** k, n).astype(np.int64)
    edges = rng.integers(1, n_edges, n).astype(np.int32)  # 0 is root
    scores = (thr + rng.random(n) * 2.5).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    return PhyloKmerDB(k=k, omega=1.5, alphabet=__import__(
        "rappas_tpu.alphabet", fromlist=["DNA"]).DNA,
        thr_log10=thr, tree=tree, keys=keys, offsets=offsets,
        edges=e, deltas=deltas)


def batch_of(reads):
    Lmax = max(len(s) for s in reads)
    mat = np.full((len(reads), Lmax), 0xFF, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, s in enumerate(reads):
        raw = np.frombuffer(s.encode(), np.uint8)
        mat[i, :len(raw)] = raw
        lens[i] = len(raw)
    return mat, lens


def compare(db, engine, reads, **oracle_kw):
    mat, lens = batch_of(reads)
    res = engine.score(mat, lens)
    for i, s in enumerate(reads):
        rows, nm = oracle.place_read(db, s, **oracle_kw)
        assert nm == res.n_matched[i], f"read {i}: |L| mismatch"
        if nm == 0:
            continue
        e_edges = [int(x) for x in res.top_edges[i] if x >= 0]
        o_edges = [r[0] for r in rows]
        assert sorted(e_edges) == sorted(o_edges), f"read {i}"
        o_scores = sorted(float(r[1]) for r in rows)
        e_scores = sorted(float(x) for x, ed in
                          zip(res.top_scores[i], res.top_edges[i])
                          if ed >= 0)
        assert np.allclose(o_scores, e_scores, atol=2e-4), f"read {i}"
        o_lwr = sorted(r[2] for r in rows)
        e_lwr = sorted(float(x) for x, ed in
                       zip(res.top_lwr[i], res.top_edges[i]) if ed >= 0)
        assert np.allclose(o_lwr, e_lwr, atol=1e-4), f"read {i}"


@pytest.fixture(scope="module")
def db():
    return synthetic_db()


@pytest.fixture(scope="module")
def engine(db):
    return PlacementEngine(db)


def random_reads(n, rng, with_amb=0.0):
    reads = []
    for _ in range(n):
        L = int(rng.integers(8, 40))
        chars = list("ACGT"[c] for c in rng.integers(0, 4, L))
        if with_amb and rng.random() < with_amb:
            pos = int(rng.integers(0, L))
            chars[pos] = str(rng.choice(list("NRYWS")))
        reads.append("".join(chars))
    return reads


def test_pure_reads_match_oracle(db, engine):
    rng = np.random.default_rng(1)
    compare(db, engine, random_reads(40, rng))


def test_ambiguous_reads_match_oracle(db, engine):
    rng = np.random.default_rng(2)
    compare(db, engine, random_reads(40, rng, with_amb=1.0))


def test_ambiguous_max_mode(db):
    engine = PlacementEngine(db, ambiguities_with_max=True)
    rng = np.random.default_rng(3)
    compare(db, engine, random_reads(30, rng, with_amb=1.0),
            ambiguities_with_max=True)


def test_noamb_mode(db):
    engine = PlacementEngine(db, treat_ambiguities=False)
    rng = np.random.default_rng(4)
    compare(db, engine, random_reads(30, rng, with_amb=1.0),
            treat_ambiguities=False)


def test_u16_precision_close_to_f32(db, engine):
    eng16 = PlacementEngine(db, precision="u16")
    rng = np.random.default_rng(9)
    reads = random_reads(30, rng)
    mat, lens = batch_of(reads)
    r32 = engine.score(mat, lens)
    r16 = eng16.score(mat, lens)
    assert np.array_equal(r32.n_matched, r16.n_matched)
    for i in range(len(reads)):
        v32 = r32.top_edges[i] >= 0
        v16 = r16.top_edges[i] >= 0
        assert v32.sum() == v16.sum()
        # quantisation error: ~2.6e-5 per matched k-mer
        assert np.allclose(sorted(r32.top_scores[i][v32]),
                           sorted(r16.top_scores[i][v16]), atol=5e-3)


def test_packed_path_matches_int8(db, engine):
    from rappas_tpu.place.engine import (accumulate, kmer_rows,
                                         kmer_rows_packed, pack_reads)
    import jax.numpy as jnp
    rng = np.random.default_rng(10)
    reads = random_reads(16, rng)
    mat, lens = batch_of(reads)
    codes = engine.encode_batch(mat)
    L = mat.shape[1]
    r_int8 = np.asarray(kmer_rows(jnp.asarray(codes), engine.k, 4,
                                  engine.n_rows))
    packed = pack_reads(codes)
    r_packed = np.asarray(kmer_rows_packed(
        jnp.asarray(packed), jnp.asarray(lens), engine.k, 4,
        engine.n_rows, L))
    # pure-ACGT reads: identical row streams
    assert np.array_equal(r_int8, r_packed)


def test_engine_packed_fast_path_equals_general(db, engine):
    """score() takes the 2-bit packed branch for pure-ACGT batches
    (the pipeline the CLI and bench.py share); a batch containing any
    ambiguity must fall back to the general path.  Both must agree with
    each other and the oracle."""
    rng = np.random.default_rng(11)
    pure = random_reads(12, rng)
    mat, lens = batch_of(pure)
    res_fast = engine.score(mat, lens)
    # force the general path by disabling the direct table
    eng_c = PlacementEngine(db, table="compact")
    res_slow = eng_c.score(mat, lens)
    assert np.array_equal(res_fast.top_edges, res_slow.top_edges)
    assert np.array_equal(res_fast.n_matched, res_slow.n_matched)
    assert np.allclose(res_fast.top_scores, res_slow.top_scores,
                       atol=2e-4, equal_nan=True)
    # one ambiguous read anywhere in the batch -> general path for all,
    # ambiguity windows still scored
    mixed = pure[:6] + ["".join("ACGT"[c] for c in rng.integers(0, 4, 9))
                        .replace("A", "N", 1)]
    compare(db, engine, mixed)


def test_compact_table_matches_oracle(db):
    engine = PlacementEngine(db, table="compact")
    rng = np.random.default_rng(11)
    compare(db, engine, random_reads(30, rng, with_amb=0.5))


def synthetic_aa_db(seed=0, k=4, n_edges=6, n_post=1500):
    from rappas_tpu.alphabet import AA
    from rappas_tpu.tree import parse_newick
    rng = np.random.default_rng(seed)
    labels = ",".join(f"L{i}:0.1" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, 20)
    codes = rng.integers(0, 20 ** k, n_post).astype(np.int64)
    edges = rng.integers(1, n_edges, n_post).astype(np.int32)
    scores = (thr + rng.random(n_post) * 2.0).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    return PhyloKmerDB(k=k, omega=1.5, alphabet=AA, thr_log10=thr,
                       tree=tree, keys=keys, offsets=offsets, edges=e,
                       deltas=deltas)


def test_protein_mode_matches_oracle():
    db = synthetic_aa_db()
    engine = PlacementEngine(db)
    assert engine.table == "direct"  # 20^4 = 160k rows, still direct
    rng = np.random.default_rng(12)
    letters = db.alphabet.letters
    reads = ["".join(letters[c] for c in rng.integers(0, 20, 25))
             for _ in range(20)]
    # sprinkle an X ambiguity
    reads[0] = reads[0][:5] + "X" + reads[0][6:]
    compare(db, engine, reads)


def test_protein_compact_mode():
    db = synthetic_aa_db(k=4)
    engine = PlacementEngine(db, table="compact")
    rng = np.random.default_rng(13)
    letters = db.alphabet.letters
    reads = ["".join(letters[c] for c in rng.integers(0, 20, 30))
             for _ in range(20)]
    compare(db, engine, reads)


def test_too_short_read(db, engine):
    mat, lens = batch_of(["ACG"])  # shorter than k
    res = engine.score(mat, lens)
    assert res.n_matched[0] == 0


def test_score_formula_unmatched_is_excluded(db, engine):
    """Edges with no matching k-mer never appear in the output."""
    rng = np.random.default_rng(5)
    reads = random_reads(20, rng)
    mat, lens = batch_of(reads)
    res = engine.score(mat, lens)
    for i in range(len(reads)):
        n = int(res.n_matched[i])
        valid = (res.top_edges[i] >= 0).sum()
        assert valid == min(n, engine.keep_at_most)


def test_lwr_normalized(db, engine):
    rng = np.random.default_rng(6)
    reads = random_reads(10, rng)
    mat, lens = batch_of(reads)
    res = engine.score(mat, lens)
    for i in range(len(reads)):
        if res.n_matched[i] == 0:
            continue
        w = res.top_lwr[i][res.top_edges[i] >= 0]
        assert np.isclose(w.sum(), 1.0, atol=1e-5)
        assert (np.diff(res.top_scores[i][res.top_edges[i] >= 0]) <=
                1e-6).all()


def test_direct_split_matches_unsplit(db, monkeypatch):
    """Height-split direct table (round 5, slow-zone dense tables,
    forced tiny here): candidate sets, counts and edge order match the
    unsplit direct engine; scores agree within f32 reordering tolerance
    (part-major summation order by design); oracle-correct including
    ambiguity reads (their alternatives ride the per-part select
    gather)."""
    e_ref = PlacementEngine(db, table="direct")
    dense_bytes = db.dense_matrix(pad_rows=1).nbytes
    monkeypatch.setattr(PlacementEngine, "DIRECT_SPLIT_MIN", 1024)
    monkeypatch.setattr(PlacementEngine, "LIGHT_SPLIT_BYTES",
                        dense_bytes // 4 + 64)
    e_split = PlacementEngine(db, table="direct")
    assert e_split.direct_parts is not None
    assert len(e_split.direct_parts) >= 4
    assert e_split.D is None
    rng = np.random.default_rng(61)
    reads = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(24)]
    reads += [db.alphabet.kmer_to_string(int(k), db.k) * 6
              for k in db.keys[:4]]
    mat, lens = batch_of(reads)
    r1 = e_ref.score(mat.copy(), lens.copy())
    r2 = e_split.score(mat.copy(), lens.copy())
    assert np.array_equal(r1.top_edges, r2.top_edges)
    assert np.array_equal(r1.n_matched, r2.n_matched)
    np.testing.assert_allclose(r2.top_scores, r1.top_scores,
                               rtol=0, atol=2e-4)
    amb = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(4)]
    amb = [r[:7] + "N" + r[8:] for r in amb]
    compare(db, e_split,
            ["".join(rng.choice(list("ACGT"), 30)) for _ in range(8)]
            + amb)
