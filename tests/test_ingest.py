"""Native read-ingest layer vs python fallback (round 4).

The pipeline consumes parsed blocks (``seqio.ingest_blocks``); the
native path (C++ parse + RFC1321 md5 + matrix fill,
``rappas_tpu/native/ingest.cpp``) must agree byte-for-byte with
:class:`rappas_tpu.seqio.PyBlock`, and the native jplace line assembler
(``jplacefmt.cpp jp_format_lines``) must produce output the python
formatter parses identically.
"""

import hashlib
import json

import numpy as np
import pytest

from rappas_tpu.seqio import IndexBatcher, PyBlock, read_raw_fasta_blocks

native = pytest.importorskip("rappas_tpu.native")


def _records(n=500, seed=0, dashes=True):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGTN" + (b"-" if dashes else b""), np.uint8)
    out = []
    for i in range(n):
        L = int(rng.integers(0, 200))
        out.append((f"q{i} desc/{i}",
                    alpha[rng.integers(0, alpha.size, L)].tobytes()))
    return out


def _blob(recs):
    return b"\n".join(b">" + h.encode() + b"\n" + s
                      for h, s in recs) + b"\n"


def test_parse_block_matches_pyblock():
    recs = _records()
    pb = native.parse_fasta_block(_blob(recs))
    py = PyBlock(recs)
    assert pb.n == py.n == len(recs)
    assert np.array_equal(pb.lens, py.lens)
    assert np.array_equal(pb.md5s, py.md5s)
    for i in (0, 7, 499):
        assert pb.header(i) == py.header(i)
        assert pb.sequence(i) == py.sequence(i)
    idx = np.arange(0, 500, 7)
    assert np.array_equal(pb.fill_matrix(idx, 256),
                          py.fill_matrix(idx, 256))


def test_md5_matches_hashlib_gap_stripped():
    recs = _records(50, seed=3)
    pb = native.parse_fasta_block(_blob(recs))
    for i, (_, s) in enumerate(recs):
        assert pb.md5s[i].tobytes() == \
            hashlib.md5(s.replace(b"-", b"")).digest()


def test_parse_multiline_and_crlf_and_comments():
    data = (b">r1 one\r\nACGT\r\nTT\r\n#note\n>r2\n\n>r3\nAC\n")
    pb = native.parse_fasta_block(data)
    assert pb.n == 3
    assert pb.header(0) == "r1 one"
    assert pb.sequence(0) == b"ACGTTT"
    assert pb.sequence(1) == b""
    assert pb.sequence(2) == b"AC"


def test_raw_blocks_cover_file(tmp_path):
    recs = _records(300, seed=5, dashes=False)
    p = tmp_path / "reads.fasta"
    p.write_bytes(_blob(recs))
    seen = []
    for block in read_raw_fasta_blocks(p, block_bytes=4096):
        pb = native.parse_fasta_block(block)
        seen.extend(pb.header(i) for i in range(pb.n))
    assert seen == [h for h, _ in recs]


def test_index_batcher_round_trip():
    recs = _records(333, seed=7, dashes=False)
    pb = PyBlock(recs)
    bat = IndexBatcher(batch_size=64)
    orders_in = np.arange(pb.n, dtype=np.int64)
    batches = bat.add_block(pb, list(range(pb.n)), orders_in)
    batches += list(bat.flush())
    total = 0
    seen_orders = []
    for refs, orders, lens, mat in batches:
        assert mat.shape[0] == 64          # pad_batch static shape
        r = 0
        for blk, idx in refs:
            for i in np.asarray(idx, np.int64).tolist():
                s = blk.sequence(i)
                assert lens[r] == len(s)
                assert mat[r, :len(s)].tobytes() == s
                assert (mat[r, len(s):] == 0xFF).all()
                r += 1
        assert r == orders.shape[0]
        seen_orders.extend(orders.tolist())
        total += r
    assert total == pb.n
    # every read appears exactly once with its arrival order preserved
    assert sorted(seen_orders) == list(range(pb.n))


def test_jplace_lines_native_matches_python(tmp_path):
    """Force the python formatter and compare parsed placements."""
    from rappas_tpu.place.jplace import JplaceWriter
    from rappas_tpu.tree import parse_newick

    def build_writer(native_fmt):
        tree = parse_newick("(A:0.1,B:0.2,(C:0.3,D:0.1)E:0.2)root;")
        tree.reset_jplace_edge_ids()
        w = JplaceWriter(tree, "test")
        w._native_fmt = native_fmt
        rng = np.random.default_rng(0)
        n, K = 37, 5
        pre = {
            "node": rng.integers(0, 6, (n, K)),
            "scores": rng.random((n, K)).astype(np.float32) * -50,
            "lwr": rng.random((n, K)).astype(np.float32),
            "n_keep": rng.integers(1, K + 1, n).astype(np.int64),
        }
        headers = [f'h{i} "q"\\x' if i % 5 == 0 else f"h{i}"
                   for i in range(n)]
        hs = [h.encode("utf-8") for h in headers]
        hdr_blob = np.frombuffer(b"".join(hs), np.uint8)
        hdr_off = np.zeros(n + 1, np.int64)
        np.cumsum([len(h) for h in hs], out=hdr_off[1:])
        reads = np.arange(n, dtype=np.int64)
        orders = rng.permutation(n).astype(np.int64)
        b = w.add_batch(hdr_blob, hdr_off, pre, reads, orders)
        w.add_duplicate(b, 3, "dup3 tail")
        return w

    d_nat = build_writer(True).to_dict()
    d_py = build_writer(False).to_dict()
    assert len(d_nat["placements"]) == len(d_py["placements"]) == 37
    assert d_nat == d_py
    out = tmp_path / "x.jplace"
    build_writer(True).write(out)
    assert json.load(open(out)) == d_nat


def test_fastq_crlf_line_endings(tmp_path):
    """CRLF FASTQ must parse identically to LF (a stray '\\r' on the
    sequence would corrupt the md5 dedup key and kill the read's last
    k-mer window -- round-5 review fix)."""
    from rappas_tpu.seqio import read_fastq

    recs = [("r1 desc", "ACGTACGT"), ("r2", "GGGGCCCC")]
    lf = tmp_path / "a.fastq"
    crlf = tmp_path / "b.fastq"
    lf.write_text("".join(f"@{h}\n{s}\n+\n{'I' * len(s)}\n"
                          for h, s in recs))
    crlf.write_bytes("".join(f"@{h}\r\n{s}\r\n+\r\n{'I' * len(s)}\r\n"
                             for h, s in recs).encode())
    assert list(read_fastq(lf)) == list(read_fastq(crlf)) == recs
