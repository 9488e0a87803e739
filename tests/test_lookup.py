"""Round-4 host-side machinery: bucketed key lookup, shape buckets,
table auto-selection rules."""

import numpy as np
import pytest

from rappas_tpu.alphabet import AA, DNA
from rappas_tpu.db import PhyloKmerDB, build_csr
from rappas_tpu.place.engine import (HostKeyIndex, PlacementEngine,
                                     _bucket_size, make_key_lookup,
                                     searchsorted_rows)


@pytest.mark.parametrize("space,nk", [(20 ** 8, 200_000),
                                      (4 ** 14, 50_000),
                                      (1 << 62, 10_000)])
def test_host_key_index_matches_searchsorted(space, nk):
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, space, nk).astype(np.int64))
    q = np.concatenate([
        rng.choice(keys, 4000),
        rng.integers(0, space, 4000),
        np.array([-1, -1, 0, space - 1, int(keys[0]), int(keys[-1])]),
    ]).astype(np.int64)
    rng.shuffle(q)
    q = q.reshape(2, -1)
    assert np.array_equal(searchsorted_rows(keys, q),
                          HostKeyIndex(keys)(q))


def test_host_key_index_oversized_bucket_fallback():
    rng = np.random.default_rng(1)
    # a dense cluster forces buckets far beyond any scan cap
    cluster = np.arange(5000, dtype=np.int64) + 10 ** 12
    keys = np.unique(np.concatenate(
        [cluster, rng.integers(0, 1 << 45, 50_000).astype(np.int64)]))
    idx = HostKeyIndex(keys, scan_cap=2)
    q = np.concatenate([rng.choice(cluster, 2000),
                        rng.integers(0, 1 << 45, 2000)]).astype(np.int64)
    assert np.array_equal(searchsorted_rows(keys, q), idx(q))


def test_make_key_lookup_small_stays_plain():
    keys = np.array([3, 7, 9], np.int64)
    lk = make_key_lookup(keys)
    q = np.array([3, 4, 9, -1], np.int64)
    assert np.array_equal(lk(q), searchsorted_rows(keys, q))


def test_bucket_size_ladder():
    assert _bucket_size(1) == 1 and _bucket_size(16) == 16
    assert _bucket_size(17) == 20       # quarter step of the octave
    for n in (100, 1000, 65_537, 81_920, 131_073, 1_000_000):
        b = _bucket_size(n)
        assert b >= n
        assert (b - n) / n <= 0.25      # quarter-step waste bound
    # monotone
    prev = 0
    for n in range(1, 3000, 7):
        b = _bucket_size(n)
        assert b >= prev
        prev = b


def _db(alpha, k, n_keys, mean_post, n_edges=300, heavy=False, seed=0):
    from rappas_tpu.tree import parse_newick
    rng = np.random.default_rng(seed)
    labels = ",".join(f"L{i}:0.1" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, alpha.n_states)
    space = alpha.n_states ** k
    keys = np.unique(rng.integers(0, space, int(n_keys * 1.2),
                                  np.int64))[:n_keys]
    per = 40 if heavy else 4
    codes = np.repeat(keys, per)
    edges = rng.integers(1, n_edges, codes.shape[0]).astype(np.int32)
    scores = (thr + 0.01 + rng.random(codes.shape[0]) * 2.0
              ).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    return PhyloKmerDB(k=k, omega=1.5, alphabet=alpha, thr_log10=thr,
                       tree=tree, keys=keys, offsets=offsets, edges=e,
                       deltas=deltas)


def _resolve(db, precision="f32"):
    return PlacementEngine.resolve_table(
        db, "auto", precision, PlacementEngine.DIRECT_BYTE_LIMIT)


def test_resolve_table_small_dense_goes_direct():
    # 4^8 * 300 * 4 B = 79 MB -- VMEM-stageable zone
    assert _resolve(_db(DNA, 8, 10_000, 4)) == "direct"


def test_resolve_table_light_dominated_goes_postings():
    # k=12 sparse, 4 postings/kmer: dense would be 20 GB
    assert _resolve(_db(DNA, 12, 100_000, 4)) == "postings"
    # protein k=8: 20^8 key space
    assert _resolve(_db(AA, 8, 100_000, 4)) == "postings"


def test_resolve_table_heavy_dominated_takes_capacity_rule():
    # k=10 with 40 postings/kmer (the real 150-taxon build shape):
    # dense 1.26 GB <= limit -> direct, NOT postings
    assert _resolve(_db(DNA, 10, 100_000, 40, heavy=True)) == "direct"


def test_resolve_table_u16_never_postings():
    # u16 (postings is f32-only): a sparse k=12 DB whose f32 auto pick
    # is postings resolves to compact instead (dense 10 GB > limit,
    # compact 60 MB)
    db = _db(DNA, 12, 100_000, 4)
    assert _resolve(db) == "postings"
    assert _resolve(db, precision="u16") == "compact"


def test_explicit_table_respected():
    db = _db(DNA, 8, 1000, 4)
    assert PlacementEngine.resolve_table(
        db, "postings", "f32", PlacementEngine.DIRECT_BYTE_LIMIT) == \
        "postings"
