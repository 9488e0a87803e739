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
