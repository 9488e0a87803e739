"""Mesh placement on the virtual 8-device CPU mesh: sharded == replicated."""

import numpy as np
import pytest

from rappas_tpu.parallel.mesh import ShardedPlacement, make_mesh
from rappas_tpu.place.engine import PlacementEngine
from tests.test_engine import batch_of, random_reads, synthetic_db


@pytest.fixture(scope="module")
def db():
    return synthetic_db(seed=3, k=5, n_edges=9, n_kmers=600)


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single(db, dp, mp):
    import jax
    if len(jax.devices()) < dp * mp:
        pytest.skip("not enough devices")
    mesh = make_mesh(dp=dp, mp=mp)
    sharded = ShardedPlacement(db, mesh)
    single = PlacementEngine(db, treat_ambiguities=False)

    rng = np.random.default_rng(0)
    reads = random_reads(16, rng)
    mat, lens = batch_of(reads)
    codes = single.encode_batch(mat)

    r_ref = single.score(mat, lens)
    r_sh = sharded.score(codes, lens)

    assert np.array_equal(r_ref.n_matched, r_sh.n_matched)
    for i in range(len(reads)):
        # same edge sets and scores (order may differ on exact ties)
        ref_valid = r_ref.top_edges[i] >= 0
        sh_valid = r_sh.top_edges[i] >= 0
        assert ref_valid.sum() == sh_valid.sum()
        assert sorted(r_ref.top_edges[i][ref_valid].tolist()) == \
            sorted(r_sh.top_edges[i][sh_valid].tolist())
        assert np.allclose(sorted(r_ref.top_scores[i][ref_valid]),
                           sorted(r_sh.top_scores[i][sh_valid]),
                           atol=1e-5)
        assert np.allclose(sorted(r_ref.top_lwr[i][ref_valid]),
                           sorted(r_sh.top_lwr[i][sh_valid]), atol=1e-5)


@pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4), (1, 8)])
def test_kmer_sharded_matches_single(db, dp, mp):
    import jax
    from rappas_tpu.parallel.kmer_sharded import KmerShardedPlacement
    if len(jax.devices()) < dp * mp:
        pytest.skip("not enough devices")
    mesh = make_mesh(dp=dp, mp=mp)
    sharded = KmerShardedPlacement(db, mesh)
    single = PlacementEngine(db, treat_ambiguities=False)

    rng = np.random.default_rng(7)
    reads = random_reads(16, rng)
    mat, lens = batch_of(reads)
    codes = single.encode_batch(mat)

    r_ref = single.score(mat, lens)
    r_sh = sharded.score(codes, lens)
    assert np.array_equal(r_ref.n_matched, r_sh.n_matched)
    for i in range(len(reads)):
        ref_valid = r_ref.top_edges[i] >= 0
        sh_valid = r_sh.top_edges[i] >= 0
        assert sorted(r_ref.top_edges[i][ref_valid].tolist()) == \
            sorted(r_sh.top_edges[i][sh_valid].tolist())
        assert np.allclose(sorted(r_ref.top_scores[i][ref_valid]),
                           sorted(r_sh.top_scores[i][sh_valid]),
                           atol=1e-5)


def test_shard_reads_and_merge(tmp_path):
    from rappas_tpu.parallel.distributed import merge_jplace, shard_reads
    reads = [(f"r{i}", "ACGT") for i in range(10)]
    shards = [list(shard_reads(reads, p, 3)) for p in range(3)]
    assert sum(len(s) for s in shards) == 10
    assert {h for s in shards for h, _ in s} == {h for h, _ in reads}

    import json
    base = {"tree": "(A:1{0});", "fields": ["edge_num"], "version": 3,
            "metadata": {}}
    for i in range(2):
        j = dict(base)
        j["placements"] = [{"p": [[0]], "nm": [[f"r{i}", 1]]}]
        (tmp_path / f"part{i}.jplace").write_text(json.dumps(j))
    merge_jplace([tmp_path / "part0.jplace", tmp_path / "part1.jplace"],
                 tmp_path / "merged.jplace")
    m = json.loads((tmp_path / "merged.jplace").read_text())
    assert len(m["placements"]) == 2


def test_mesh_shapes():
    import jax
    mesh = make_mesh(dp=4, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, mp=3)
