"""Edge cases a real metagenomic stream throws at the pipeline."""

import json

import numpy as np
import pytest

from rappas_tpu.place.pipeline import PlacementConfig, place_queries
from tests.test_engine import synthetic_db


@pytest.fixture(scope="module")
def db():
    return synthetic_db(seed=6, k=5, n_edges=8, n_kmers=500)


def place(db, tmp_path, text, name="q.fasta", **kw):
    q = tmp_path / name
    q.write_text(text)
    out = place_queries(db, q, tmp_path, PlacementConfig(**kw))
    return json.loads(out.read_text())


def test_empty_query_file(db, tmp_path):
    j = place(db, tmp_path, "")
    assert j["placements"] == []
    assert j["version"] == 3


def test_all_ambiguous_read(db, tmp_path):
    j = place(db, tmp_path, ">n\n" + "N" * 30 + "\n")
    # every window exceeds maxAmbigPerMer -> skipped -> unplaced
    assert j["placements"] == []
    listed = (tmp_path / "logs" / "notplaced_q.fasta.tsv").read_text()
    assert "n" in listed


def test_crlf_and_multiline(db, tmp_path):
    body = (">a desc here\r\nACGTA\r\nCGTACGT\r\n"
            ">b\r\nACGTACGTAC\r\n")
    j = place(db, tmp_path, body)
    headers = [p["nm"][0][0] for p in j["placements"]]
    # multi-line + CRLF sequences concatenate; full header preserved
    assert "a desc here" in headers


def test_lowercase_reads(db, tmp_path):
    up = place(db, tmp_path, ">x\nACGTACGTACGTACG\n")
    lo = place(db, tmp_path, ">x\nacgtacgtacgtacg\n", name="q2.fasta")
    if up["placements"]:
        assert up["placements"][0]["p"] == lo["placements"][0]["p"]


def test_read_exactly_k(db, tmp_path):
    j = place(db, tmp_path, ">x\nACGTA\n")  # length == k == 5 -> Q=1
    # either placed on some edges or unplaced; must not crash and Q=1
    for p in j["placements"]:
        assert p["p"]


def test_huge_header_and_unicode_safe(db, tmp_path):
    h = "read|" + "x" * 500 + " tail"
    j = place(db, tmp_path, f">{h}\nACGTACGTACGTACG\n")
    if j["placements"]:
        assert j["placements"][0]["nm"][0][0] == h


def test_pipeline_thread_cleanup_on_error(tiny_db, tmp_path):
    """An exception mid-placement must not leak the pipeline threads
    (reader / formatter / prep executor) -- round-5 try/finally."""
    import threading
    import time as _time

    from rappas_tpu.place.pipeline import place_queries

    bad = tmp_path / "bad.fastq"
    bad.write_text("@r1\nACGT\nBAD-SEPARATOR\n!!!!\n")
    n0 = threading.active_count()
    with pytest.raises(ValueError):
        place_queries(tiny_db, bad, tmp_path)
    deadline = _time.time() + 5
    while threading.active_count() > n0 and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= n0, \
        "pipeline threads leaked after an ingest error"


def test_fastq_pipeline_matches_fasta(tiny_db, tmp_path, fixtures_dir):
    """A FASTQ stream rides the PyBlock path (python header blobs,
    python md5) while plain FASTA rides the native block path -- both
    must produce identical placements, nm lists (incl. duplicates) and
    TSV reports."""
    from rappas_tpu.seqio import read_fasta

    recs = list(read_fasta(fixtures_dir / "tiny_reads.fasta"))
    fq = tmp_path / "reads.fastq"
    fa = tmp_path / "reads.fasta"
    with open(fq, "w") as f, open(fa, "w") as g:
        for h, s in recs + recs[:3]:        # tail duplicates
            f.write(f"@{h}\n{s}\n+\n{'I' * len(s)}\n")
            g.write(f">{h}\n{s}\n")
    wd_q = tmp_path / "wd_q"
    wd_a = tmp_path / "wd_a"
    out_q = place_queries(tiny_db, fq, wd_q,
                          PlacementConfig(batch_size=16))
    out_a = place_queries(tiny_db, fa, wd_a,
                          PlacementConfig(batch_size=16))
    jq = json.loads(out_q.read_text())
    ja = json.loads(out_a.read_text())
    assert jq["placements"] == ja["placements"]
    tsv_q = (wd_q / "logs" / "placements_reads.fastq.tsv").read_bytes()
    tsv_a = (wd_a / "logs" / "placements_reads.fasta.tsv").read_bytes()
    assert tsv_q == tsv_a


def test_nsbound_filters_reads_and_dups_silently(tiny_db, tmp_path,
                                                 fixtures_dir):
    """--nsbound: reads whose best score falls below the bound are
    dropped from jplace WITHOUT joining the notplaced list, and their
    duplicates re-filter silently (the _FILTERED order state)."""
    from rappas_tpu.place.engine import PlacementEngine
    from rappas_tpu.seqio import read_fasta

    seqs = dict(read_fasta(fixtures_dir / "tiny.fasta"))
    vals = list(seqs.values())
    r0, r1 = vals[0][:90], vals[1][:30]
    eng = PlacementEngine(tiny_db)
    mat = np.full((2, 90), 0xFF, np.uint8)
    mat[0, :len(r0)] = np.frombuffer(r0.encode(), np.uint8)
    mat[1, :len(r1)] = np.frombuffer(r1.encode(), np.uint8)
    res = eng.score(mat, np.array([len(r0), len(r1)], np.int32))
    s0, s1 = (float(res.top_scores[i, 0]) for i in range(2))
    assert s0 != s1
    # filter whichever read scores lower; the other must survive
    good, weak = (r0, r1) if s0 > s1 else (r1, r0)
    bound = (s0 + s1) / 2

    qp = tmp_path / "q.fasta"
    qp.write_text(f">good one\n{good}\n>weak one\n{weak}\n"
                  f">weakdup tail\n{weak}\n")
    out = place_queries(tiny_db, qp, tmp_path,
                        PlacementConfig(batch_size=4, ns_bound=bound))
    j = json.loads(out.read_text())
    names = [n[0] for p in j["placements"] for n in p["nm"]]
    assert "good one" in names
    assert all("weak" not in n for n in names)
    np_file = tmp_path / "logs" / "notplaced_q.fasta.tsv"
    assert "weak" not in np_file.read_text()   # filtered, NOT unplaced
