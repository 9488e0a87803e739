"""End-to-end: build DB with real PhyML, place reads, check jplace."""

import json

import numpy as np
import pytest

from rappas_tpu.place import oracle
from rappas_tpu.place.pipeline import PlacementConfig, place_queries
from rappas_tpu.seqio import read_fasta
from rappas_tpu.tree import parse_newick


def test_db_content_sane(tiny_db):
    db = tiny_db
    assert db.n_kmers > 1000
    assert db.nnz >= db.n_kmers
    # every posting's edge is a non-root original node
    arr = db.arrays
    assert (db.edges != arr.root_id).all()
    assert (arr.parent[db.edges] >= 0).all()
    # scores are >= threshold (delta >= 0)
    assert (db.deltas > 0).all()


def test_db_jsondb_dump(tiny_db):
    dump = tiny_db.to_json_dump()
    word, postings = next(iter(dump.items()))
    assert len(word) == tiny_db.k
    assert set(word) <= set("ACGT")
    assert all(s <= 0 for s in postings.values())


def test_place_pipeline(tiny_db, tmp_path, fixtures_dir):
    out = place_queries(tiny_db, fixtures_dir / "tiny_reads.fasta",
                        tmp_path)
    j = json.loads(out.read_text())
    assert j["version"] == 3
    assert j["fields"] == ["edge_num", "likelihood", "like_weight_ratio",
                           "distal_length", "pendant_length"]
    assert j["placements"]
    # tree string parses back with jplace ids
    t = parse_newick(j["tree"], jplace_edge_ids=True)
    ids = sorted(n.jplace_edge_id for n in t.nodes)
    assert ids == list(range(len(ids)))
    # duplicate reads share one placement: dupA full header, dupB subheader
    dup = [p for p in j["placements"]
           if any(str(n[0]).startswith("dup") for n in p["nm"])]
    assert len(dup) == 1
    assert [n[0] for n in dup[0]["nm"]] == ["dupA", "dupB"]
    # every p row: edge_num valid, lwr in [0,1], distal = bl/2
    arr = tiny_db.arrays
    jp_to_node = {int(arr.jplace_edge_id[i]): i
                  for i in arr.dfs_order.tolist()}
    for p in j["placements"]:
        best = p["p"][0]
        assert best[0] in jp_to_node
        node = jp_to_node[best[0]]
        assert np.isclose(best[3],
                          float(np.float32(arr.branch_len[node] /
                                           np.float32(2.0))))
        assert 0.0 <= best[2] <= 1.0


def test_placement_matches_oracle_end_to_end(tiny_db, tmp_path,
                                             fixtures_dir):
    out = place_queries(tiny_db, fixtures_dir / "tiny_reads.fasta",
                        tmp_path)
    j = json.loads(out.read_text())
    reads = dict(read_fasta(fixtures_dir / "tiny_reads.fasta"))
    arr = tiny_db.arrays
    jp = arr.jplace_edge_id
    for p in j["placements"]:
        header = p["nm"][0][0]
        rows, nm = oracle.place_read(tiny_db, reads[header])
        assert rows, header
        # keep-factor may truncate; compare the common prefix
        for (edge_jp, score, lwr, _, _), (o_edge, o_score, o_lwr) in zip(
                [tuple(r) for r in p["p"]], rows):
            assert edge_jp == int(jp[o_edge])
            assert np.isclose(score, float(o_score), atol=2e-4)
            assert np.isclose(lwr, o_lwr, atol=1e-4)


def test_guppy_field_order(tiny_db, tmp_path, fixtures_dir):
    cfg = PlacementConfig(guppy_compatible=True)
    out = place_queries(tiny_db, fixtures_dir / "tiny_reads.fasta",
                        tmp_path, cfg)
    j = json.loads(out.read_text())
    assert j["fields"] == ["distal_length", "edge_num",
                           "like_weight_ratio", "likelihood",
                           "pendant_length"]


def test_fastq_input(tiny_db, tmp_path, fixtures_dir):
    reads = dict(__import__("rappas_tpu.seqio",
                            fromlist=["read_fasta"]).read_fasta(
        fixtures_dir / "tiny_reads.fasta"))
    q = tmp_path / "reads.fastq"
    with open(q, "w") as f:
        for h, s in list(reads.items())[:5]:
            f.write(f"@{h}\n{s}\n+\n{'I' * len(s)}\n")
    out = place_queries(tiny_db, q, tmp_path)
    j = json.loads(out.read_text())
    assert len(j["placements"]) == 5


def test_u16_pipeline_close_to_f32(tiny_db, tmp_path, fixtures_dir):
    out32 = place_queries(tiny_db, fixtures_dir / "tiny_reads.fasta",
                          tmp_path / "a")
    out16 = place_queries(tiny_db, fixtures_dir / "tiny_reads.fasta",
                          tmp_path / "b",
                          PlacementConfig(precision="u16"))
    j32 = json.loads(out32.read_text())
    j16 = json.loads(out16.read_text())
    assert len(j32["placements"]) == len(j16["placements"])
    for p32, p16 in zip(j32["placements"], j16["placements"]):
        assert p32["p"][0][0] == p16["p"][0][0]  # same best edge
        assert abs(p32["p"][0][1] - p16["p"][0][1]) < 5e-3


def test_notplaced_log(tiny_db, tmp_path, fixtures_dir):
    # a read of pure junk that can't match (all same base repeated: its
    # kmers may still exist; use impossible pattern instead -> reads
    # shorter than k go unplaced)
    q = tmp_path / "short.fasta"
    q.write_text(">s1\nACG\n>s2\nACG\n")
    place_queries(tiny_db, q, tmp_path)
    listed = (tmp_path / "logs" / "notplaced_short.fasta.tsv").read_text()
    # both occurrences listed (duplicate of unplaced is re-listed,
    # PlacementProcess.java:591-629)
    assert listed.splitlines() == ["s1", "s2"]


def test_many_duplicates_nm_lists(tiny_db, tmp_path, fixtures_dir):
    """Heavy duplication across blocks/batches: every duplicate lands
    on its first occurrence's nm list, sub-headers truncated at the
    first space, in arrival order (exercises the round-5 vectorized
    extras chunks + native nm rendering, PlacementProcess.java:
    591-629,1052-1060)."""
    seqs = dict(read_fasta(fixtures_dir / "tiny.fasta"))
    bases = list(seqs.values())[:4]
    qp = tmp_path / "dups.fasta"
    with open(qp, "w") as f:
        # firsts
        for i, s in enumerate(bases):
            f.write(f">first{i} descr {i}\n{s[:80]}\n")
        # many duplicates, interleaved, arriving over several batches
        for r in range(25):
            for i, s in enumerate(bases):
                f.write(f">dup{i}_{r} tail text\n{s[:80]}\n")
    out = place_queries(tiny_db, qp, tmp_path,
                        PlacementConfig(batch_size=16))
    j = json.loads(out.read_text())
    firsts = {p["nm"][0][0]: p for p in j["placements"]}
    assert len(j["placements"]) == 4
    for i in range(4):
        p = firsts[f"first{i} descr {i}"]
        names = [n[0] for n in p["nm"]]
        # full header first, then sub-headers in arrival order
        assert names[0] == f"first{i} descr {i}"
        assert names[1:] == [f"dup{i}_{r}" for r in range(25)]
        assert all(n[1] == 1 for n in p["nm"])
