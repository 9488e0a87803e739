import numpy as np
import pytest

from rappas_tpu.build.explorer import (explore_node, explore_node_exact,
                                       sort_probas_desc)
from rappas_tpu.db import PhyloKmerDB, build_csr


def random_logp(L, S, seed, conc=0.3):
    rng = np.random.default_rng(seed)
    P = rng.dirichlet(np.ones(S) * conc, size=L).astype(np.float32)
    return np.log10(np.maximum(P, np.float32(1.4e-45))).astype(np.float32)


def brute_force(P, k, thr):
    """Enumerate every k-mer window naively (float32 left-to-right sums)."""
    L, S = P.shape
    out = {}
    for pos in range(L - k + 1):
        stack = [(0, np.float32(0.0), 0)]
        while stack:
            d, s, code = stack.pop()
            if d == k:
                if s >= thr:
                    out[code] = max(out.get(code, -1e9), float(s))
                continue
            for j in range(S):
                stack.append((d + 1, np.float32(s + P[pos + d, j]),
                              code * S + j))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_bruteforce(seed):
    k = 4
    P = random_logp(12, 4, seed)
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    codes, sums = explore_node(P, k, thr)
    got = {}
    for c, s in zip(codes.tolist(), sums.tolist()):
        got[c] = max(got.get(c, -1e9), s)
    want = brute_force(P, k, float(thr))
    assert set(got) == set(want)
    for c in got:
        assert abs(got[c] - want[c]) < 1e-6


def test_exact_matches_vectorized_no_jumps():
    k = 6
    P = random_logp(30, 4, 7)
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    c1, s1 = explore_node(P, k, thr)
    st, pp = sort_probas_desc(P)
    c2, s2 = explore_node_exact(st, pp, k, thr)

    def agg(c, s):
        d = {}
        for ci, si in zip(c.tolist(), s.tolist()):
            d[ci] = max(d.get(ci, -1e9), si)
        return d

    d1, d2 = agg(c1, s1), agg(c2, s2)
    assert set(d1) == set(d2)
    # scores agree within the documented f32 +=/-= residual drift
    assert max(abs(d1[c] - d2[c]) for c in d1) < 1e-4


def test_gap_jumps_generate_extra_words():
    """A gap interval lets words skip the gapped columns."""
    k = 3
    S = 4
    L = 8
    # certain states: site i -> state i%4 with prob ~1
    P = np.full((L, S), -40.0, np.float32)
    for i in range(L):
        P[i, i % 4] = np.float32(-0.001)
    thr = np.float32(-1.0)
    st, pp = sort_probas_desc(P)
    # gap interval of length 2 starting at column 2
    gaps = {2: [2]}
    c_nj, _ = explore_node_exact(st, pp, k, thr)
    c_j, _ = explore_node_exact(st, pp, k, thr, gap_intervals=gaps,
                                do_gap_jumps=True, limit_to_1_jump=True)
    set_nj = set(c_nj.tolist())
    set_j = set(c_j.tolist())
    assert set_nj <= set_j
    # jumped word from pos 0: sites 0,1 then jump over cols 2-3 to col 4
    # -> states 0,1,0 = code 0*16+1*4+0
    jumped = 0 * 16 + 1 * 4 + 0
    assert jumped in set_j
    assert jumped not in set_nj


def test_build_csr_max_merge():
    codes = np.array([5, 5, 5, 2], np.int64)
    edges = np.array([1, 1, 2, 1], np.int32)
    scores = np.array([-2.0, -1.0, -3.0, -1.5], np.float32)
    thr = np.float32(-4.0)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    assert keys.tolist() == [2, 5]
    assert offsets.tolist() == [0, 1, 3]
    # kmer 5, edge 1 keeps max score -1.0
    assert e.tolist() == [1, 1, 2]
    assert np.allclose(deltas, [(-1.5 + 4), (-1.0 + 4), (-3.0 + 4)])
