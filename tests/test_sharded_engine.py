"""CLI-reachable multi-chip placement (virtual 8-device CPU mesh):
the ShardedEngine must be a drop-in for PlacementEngine -- same jplace,
ambiguities included -- across dense and postings table modes.
"""

import json

import numpy as np
import pytest

from rappas_tpu.parallel.engine import ShardedEngine
from rappas_tpu.parallel.mesh import make_mesh
from rappas_tpu.place.engine import PlacementEngine
from tests.test_engine import batch_of, compare, random_reads, synthetic_db


@pytest.fixture(scope="module")
def db():
    return synthetic_db(seed=5, k=5, n_edges=10, n_kmers=700)


def assert_same_results(r_ref, r_sh, n):
    assert np.array_equal(r_ref.n_matched, r_sh.n_matched)
    for i in range(n):
        ref_valid = r_ref.top_edges[i] >= 0
        sh_valid = r_sh.top_edges[i] >= 0
        assert ref_valid.sum() == sh_valid.sum()
        assert sorted(r_ref.top_edges[i][ref_valid].tolist()) == \
            sorted(r_sh.top_edges[i][sh_valid].tolist())
        assert np.allclose(sorted(r_ref.top_scores[i][ref_valid]),
                           sorted(r_sh.top_scores[i][sh_valid]),
                           atol=1e-5)


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2), (2, 4)])
def test_dense_sharded_engine_with_ambiguities(db, dp, mp):
    import jax
    if len(jax.devices()) < dp * mp:
        pytest.skip("not enough devices")
    mesh = make_mesh(dp=dp, mp=mp)
    sharded = ShardedEngine(db, mesh, table="direct")
    single = PlacementEngine(db, table="direct")

    rng = np.random.default_rng(21)
    reads = random_reads(16, rng, with_amb=0.5)
    mat, lens = batch_of(reads)
    assert_same_results(single.score(mat, lens),
                        sharded.score(mat, lens), len(reads))
    # and against the oracle directly
    compare(db, sharded, random_reads(16, rng, with_amb=1.0))


@pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4)])
def test_postings_sharded_engine_with_ambiguities(db, dp, mp):
    import jax
    if len(jax.devices()) < dp * mp:
        pytest.skip("not enough devices")
    mesh = make_mesh(dp=dp, mp=mp)
    sharded = ShardedEngine(db, mesh, table="postings")
    single = PlacementEngine(db, table="postings")

    rng = np.random.default_rng(22)
    reads = random_reads(16, rng, with_amb=0.5)
    mat, lens = batch_of(reads)
    assert_same_results(single.score(mat, lens),
                        sharded.score(mat, lens), len(reads))
    compare(db, sharded, random_reads(16, rng, with_amb=1.0))


def test_compact_sharded_engine(db):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = make_mesh(dp=4, mp=2)
    sharded = ShardedEngine(db, mesh, table="compact")
    single = PlacementEngine(db, table="compact")
    rng = np.random.default_rng(23)
    reads = random_reads(16, rng, with_amb=0.3)
    mat, lens = batch_of(reads)
    assert_same_results(single.score(mat, lens),
                        sharded.score(mat, lens), len(reads))


def write_reads(path, reads):
    with open(path, "w") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i} synthetic\n{s}\n")


def canon(jplace_path):
    j = json.loads(open(jplace_path).read())
    return j["tree"], j["fields"], [
        (tuple(tuple(row) for row in p["p"]), tuple(map(tuple, p["nm"])))
        for p in j["placements"]]


def test_cli_multichip_jplace_matches_single(db, tmp_path):
    """One CLI command places a FASTA over the 8-device mesh and the
    jplace equals the single-chip run (VERDICT round-1 item 2)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from rappas_tpu import cli

    db_path = tmp_path / "db.rptpu"
    db.save(db_path)
    rng = np.random.default_rng(31)
    reads = random_reads(40, rng, with_amb=0.3)
    reads.append(reads[0])            # duplicate -> nm grouping
    q = tmp_path / "reads.fasta"
    write_reads(q, reads)

    wd1 = tmp_path / "single"
    wd2 = tmp_path / "mesh"
    base = ["-p", "p", "-d", str(db_path), "-q", str(q),
            "--batch-size", "16"]
    assert cli.main(base + ["-w", str(wd1)]) == 0
    assert cli.main(base + ["-w", str(wd2), "--dp", "4", "--mp", "2"]) == 0

    t1, f1, p1 = canon(wd1 / "placements_reads.fasta.jplace")
    t2, f2, p2 = canon(wd2 / "placements_reads.fasta.jplace")
    assert (t1, f1) == (t2, f2)
    assert len(p1) == len(p2)
    for (rows1, nm1), (rows2, nm2) in zip(p1, p2):
        assert nm1 == nm2
        assert len(rows1) == len(rows2)
        for r1, r2 in zip(rows1, rows2):
            assert r1[0] == r2[0]                      # edge id exact
            assert abs(r1[1] - r2[1]) < 1e-5           # likelihood
            assert abs(r1[2] - r2[2]) < 1e-5           # lwr


def test_multihost_parts_merge_to_full_run(db, tmp_path):
    """Two host shards (read_shard) produce parts whose merged
    placements cover exactly the full run's reads."""
    from rappas_tpu.parallel.distributed import merge_jplace
    from rappas_tpu.place.pipeline import PlacementConfig, place_queries

    rng = np.random.default_rng(33)
    reads = random_reads(30, rng)
    q = tmp_path / "reads.fasta"
    write_reads(q, reads)

    full_cfg = PlacementConfig(batch_size=8)
    out_full = place_queries(db, q, tmp_path / "full", full_cfg)
    parts = []
    for host in range(2):
        cfg = PlacementConfig(batch_size=8, read_shard=(host, 2))
        parts.append(place_queries(db, q, tmp_path / "hosts", cfg))
    merged = tmp_path / "merged.jplace"
    merge_jplace(parts, merged)

    jf = json.loads(open(out_full).read())
    jm = json.loads(open(merged).read())
    assert jf["tree"] == jm["tree"]

    def by_read(j):
        return {nm[0]: tuple(tuple(r) for r in p["p"])
                for p in j["placements"] for nm in p["nm"]}
    bf, bm = by_read(jf), by_read(jm)
    assert bf.keys() == bm.keys()
    for k in bf:
        assert bf[k] == bm[k]
