"""Native explorer must match the Python oracle bit for bit."""

import numpy as np
import pytest

from rappas_tpu.build.explorer import explore_node_exact, sort_probas_desc
from rappas_tpu.db import PhyloKmerDB

native = pytest.importorskip("rappas_tpu.native")


def random_logp(L, S, seed, conc=0.3):
    rng = np.random.default_rng(seed)
    P = rng.dirichlet(np.ones(S) * conc, size=L).astype(np.float32)
    return np.log10(np.maximum(P, np.float32(1.4e-45))).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 5])
def test_native_matches_python_no_jumps(seed):
    k = 5
    P = random_logp(25, 4, seed)
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    st, pp = sort_probas_desc(P)
    c_py, s_py = explore_node_exact(st, pp, k, thr)
    c_na, s_na = native.explore_node_exact_native(st, pp, k, thr)
    # identical emission order and bit-identical f32 sums
    assert np.array_equal(c_py, c_na)
    assert np.array_equal(s_py.view(np.uint32), s_na.view(np.uint32))


def test_native_matches_python_with_jumps():
    k = 4
    P = random_logp(20, 4, 3, conc=1.0)
    thr = np.float32(-3.0)
    gaps = {3: [2], 7: [1, 4], 12: [3]}
    st, pp = sort_probas_desc(P)
    for limit1 in (True, False):
        c_py, s_py = explore_node_exact(st, pp, k, thr, gaps, True, limit1)
        c_na, s_na = native.explore_node_exact_native(st, pp, k, thr,
                                                      gaps, True, limit1)
        assert np.array_equal(c_py, c_na)
        assert np.array_equal(s_py.view(np.uint32), s_na.view(np.uint32))


def test_native_empty_result():
    k = 4
    P = np.full((10, 4), -40.0, np.float32)
    st, pp = sort_probas_desc(P)
    c, s = native.explore_node_exact_native(st, pp, k, np.float32(-1.0))
    assert c.size == 0 and s.size == 0


def test_native_speed_sanity():
    """Native should chew a realistic node quickly.

    Generous bound: catches pathological slowness (e.g. an accidental
    O(4^k) regression), not machine-load jitter.  A tiny warmup call
    first so one-time .so compilation isn't timed.
    """
    import time
    k = 8
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    st_w, pp_w = sort_probas_desc(random_logp(10, 4, 2))
    native.explore_node_exact_native(st_w, pp_w, k, thr)  # warmup/build
    P = random_logp(1500, 4, 1)
    st, pp = sort_probas_desc(P)
    t = time.time()
    c, s = native.explore_node_exact_native(st, pp, k, thr)
    dt = time.time() - t
    assert dt < 15.0, f"native explorer too slow: {dt:.1f}s"
    assert c.size > 0


def test_gather_ranges_basic():
    from rappas_tpu.native import gather_ranges
    buf = np.frombuffer(b"abcdefghij", np.uint8)
    starts = np.array([0, 3, 9, 2], np.int64)
    ends = np.array([2, 7, 10, 2], np.int64)   # incl. an empty range
    blob, off = gather_ranges(buf, starts, ends)
    assert blob.tobytes() == b"abdefgj"
    assert off.tolist() == [0, 2, 6, 7, 7]
    # empty input
    blob, off = gather_ranges(buf, starts[:0], ends[:0])
    assert blob.shape[0] == 0 and off.tolist() == [0]


def test_format_tsv_rows_matches_python():
    pytest.importorskip("ctypes")
    try:
        from rappas_tpu.native import format_tsv_rows
    except Exception:
        pytest.skip("toolchain missing")
    headers = [b"q1 with desc", b"q2", b"name only"]
    blob = np.frombuffer(b"".join(headers), np.uint8)
    off = np.zeros(4, np.int64)
    np.cumsum([len(h) for h in headers], out=off[1:])
    best = np.array([2, 0, 1], np.int32)
    scores = np.array([-1.5, -20.969999313354492, -0.25], np.float32)
    lbls = [b"L0", b"", b"Lbl2"]
    lbl_buf = b"".join(lbls)
    lbl_off = np.zeros(4, np.int32)
    np.cumsum([len(x) for x in lbls], out=lbl_off[1:])
    out = format_tsv_rows(blob, off, best, scores, lbl_buf, lbl_off)
    lines = out.decode().splitlines()
    exp = []
    for h, b, s in zip(["q1 with desc", "q2", "name only"],
                       best.tolist(), scores.tolist()):
        q = h.split(" ")[0]
        exp.append(f"{q}\t\t\t\t\t{b}\t{lbls[b].decode()}\t{s}")
    assert lines == exp


def test_keyprobe_matches_numpy_path():
    """Fused native rolling-hash + key probe must equal the numpy
    Horner + combined-lookup pass, including ambiguity codes, mid-read
    pads and past-length windows (protein k=8 regime, forced big-key
    fallback)."""
    from rappas_tpu.alphabet import AA
    from rappas_tpu.db import PhyloKmerDB, build_csr
    from rappas_tpu.place.engine import PlacementEngine
    from rappas_tpu.tree import parse_newick

    rng = np.random.default_rng(3)
    n_edges = 24
    labels = ",".join(f"L{i}:0.1" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(8, 1.5, 20)
    # enough keys that make_key_lookup builds a HostKeyIndex (>= 2^16)
    keys = np.unique(rng.integers(0, 20 ** 8, 90_000, np.int64))
    codes = np.repeat(keys, 2)
    edges = rng.integers(1, n_edges, codes.shape[0]).astype(np.int32)
    scores = (thr + 0.01 + rng.random(codes.shape[0]) * 2.0
              ).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    db = PhyloKmerDB(k=8, omega=1.5, alphabet=AA, thr_log10=thr,
                     tree=tree, keys=keys, offsets=offsets, edges=e,
                     deltas=deltas)
    eng = PlacementEngine(db, table="postings")
    assert eng._native_probe is not None
    B, L = 64, 40
    letters = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    mat = letters[rng.integers(0, 20, (B, L))]
    # sprinkle ambiguity (B/X/Z) and force DB keys into some reads so
    # hits exist
    for i in range(0, B, 7):
        mat[i, rng.integers(0, L)] = ord("X")
    for i in range(0, B, 5):
        s = db.alphabet.kmer_to_string(int(db.keys[i]), 8)
        mat[i, 3:3 + 8] = np.frombuffer(s.encode(), np.uint8)
    lens = np.full(B, L, np.int32)
    lens[::9] = rng.integers(8, L, (B + 8) // 9)   # short reads
    codes_m = eng.encode_batch(mat)
    got = eng._native_probe(codes_m, lens)
    want = eng._host_rows(eng._host_kmer_indices(codes_m, lens))
    assert np.array_equal(got, want)
    # some real hits and some misses were actually exercised
    assert (got != eng._nl).any() and (got == eng._nl).any()
