"""Edge-range-sharded postings placement vs the single-chip postings
engine, on the virtual 8-device CPU mesh (conftest sets it up)."""

import numpy as np
import pytest

from rappas_tpu.parallel.mesh import make_mesh
from rappas_tpu.parallel.postings_sharded import (PostingsShardedPlacement,
                                                  shard_db_by_edge)
from rappas_tpu.place.engine import PlacementEngine
from tests.test_postings import random_reads, skewed_db


@pytest.fixture(scope="module")
def db():
    return skewed_db(n_edges=40, n_kmers=300)


def encode(db, reads):
    tab = PlacementEngine(db, table="postings", postings_width=4)
    mat = np.full((len(reads), max(len(r) for r in reads)), 0xFF,
                  np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        raw = np.frombuffer(r.encode(), np.uint8)
        mat[i, :len(raw)] = raw
        lens[i] = len(raw)
    return tab, tab.encode_batch(mat), lens


def test_shard_db_partition(db):
    bounds, t = shard_db_by_edge(db, mp=4, width=4)
    # every posting is in exactly one shard
    total = sum(int(np.count_nonzero(t["light_pairs"][i, :, 4:])) +
                int(np.count_nonzero(t["heavy_dense"][i]))
                for i in range(4))
    assert total == db.nnz
    assert bounds[0] == 0 and bounds[-1] == db.n_edge_slots


@pytest.mark.parametrize("dp,mp", [(2, 4), (4, 2), (1, 8)])
def test_sharded_matches_single_chip(db, dp, mp):
    import jax
    mesh = make_mesh(jax.devices()[:dp * mp], dp=dp, mp=mp)
    sharded = PostingsShardedPlacement(db, mesh, postings_width=4)
    engine, codes, lens = encode(db, random_reads(db, 8 * dp, 30,
                                                  seed=21))
    rs = sharded.score(codes, lens)
    mat = np.where(codes >= 0, np.frombuffer(b"ACGT", np.uint8)[
        np.maximum(codes, 0)], 0xFF)
    r1 = engine.score(mat, lens)
    assert np.array_equal(rs.n_matched, r1.n_matched)
    for i in range(codes.shape[0]):
        es = sorted(int(x) for x in rs.top_edges[i] if x >= 0)
        e1 = sorted(int(x) for x in r1.top_edges[i] if x >= 0)
        assert es == e1, f"read {i}"
        ss = sorted(float(x) for x, e in zip(rs.top_scores[i],
                                             rs.top_edges[i]) if e >= 0)
        s1 = sorted(float(x) for x, e in zip(r1.top_scores[i],
                                             r1.top_edges[i]) if e >= 0)
        assert np.allclose(ss, s1, atol=5e-4), f"read {i}"
        ls = sorted(float(x) for x, e in zip(rs.top_lwr[i],
                                             rs.top_edges[i]) if e >= 0)
        l1 = sorted(float(x) for x, e in zip(r1.top_lwr[i],
                                             r1.top_edges[i]) if e >= 0)
        assert np.allclose(ls, l1, atol=1e-4), f"read {i}"
