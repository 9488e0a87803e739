"""HAND-DERIVED golden for the gap-jump explorer (VERDICT r2 item 3).

Round-2 validation of gap jumps compared only this repo's python port
against this repo's native port -- both written by the same builder from
the same reading of the Java, so a shared misreading would pass.  The
expected words below were enumerated BY HAND on paper, directly from
``/root/reference/src/core/algos/WordExplorer_v3.java:98-199``, for a
6-site k=3 matrix small enough to trace every recursion step:

* jump rule: while exploring children of position ``i``, if column
  ``i+1`` starts a gap interval of length ``g``, a second child
  exploration jumps to ``i+1+g`` with the same state rank
  (``WordExplorer_v3.java:161-190``);
* ``limitTo1Jump`` quirk: ``idxOfFirstJump`` is an INSTANCE field reset
  only when the recursion re-enters depth 0 (``:112-115``), so the
  first executed jump anywhere in a (pos, state) exploration disables
  every later jump of that exploration -- including in sibling subtrees
  entered after backtracking above the jump position;
* sibling pruning: ``boundReached``/``boundReachingK`` are shared
  mutable fields; a child loop breaks only when the *most recent*
  exploration hit the bound exactly one level below (``:120-125,147``);
* start positions run to ``L - k + 1`` inclusive
  (``Main_DBBUILD_3.java:692``); over-the-end sites return before
  accumulating (``:109-111``).

The PP matrix (log10, sorted descending per site; columns beyond rank 1
are -9 = dead):

    site:        0      1      2      3      4      5
    rank 0:  (A,-0.10)(C,-0.20)(T,-0.30)(G,-0.40)(G,-0.15)(A,-0.25)
    rank 1:  (C,-0.90)(A,-0.65)(A,-5.0) (A,-5.0) (C,-0.50)(T,-0.95)

with state codes A=0, C=1, G=2, T=3 (codes chosen by the fixture, not
the alphabet), threshold log10 = -1.0, and one gap interval: columns
2-3 ('-' run of length 2 starting at column 2) => gap_intervals {2: [2]}.

Hand enumeration (word = state-code triple, code = base-4 big-endian):

With jumps + limitTo1Jump (the default):
  pos 0: (0,1,3)@-0.60 [straight], (0,1,2)@-0.45 [jump 2->4]
  pos 1: (1,3,2)@-0.90 [straight], (1,2,0)@-0.60 [jump 2->4, then 5]
  pos 2: (3,2,2)@-0.85;  pos 3: (2,2,0)@-0.80;  pos 4: nothing (no site 6)
  MUST BE ABSENT (a non-quirky "jump always allowed" implementation
  would emit them; the reference's idxOfFirstJump suppresses them):
  (0,1,1)@-0.80, (0,0,2)@-0.90, (1,1,0)@-0.95

With jumps, no 1-jump limit (--do-n-jumps): the three quirk words join.
Without jumps: only the straight words (0,1,3),(1,3,2),(3,2,2),(2,2,0).
"""

import numpy as np
import pytest

from rappas_tpu.build.explorer import explore_node_exact

ST = np.array([[0, 1, 2, 3],
               [1, 0, 2, 3],
               [3, 0, 1, 2],
               [2, 0, 1, 3],
               [2, 1, 0, 3],
               [0, 3, 1, 2]], np.int8)
PP = np.array([[-0.10, -0.90, -9.0, -9.0],
               [-0.20, -0.65, -9.0, -9.0],
               [-0.30, -5.00, -9.0, -9.0],
               [-0.40, -5.00, -9.0, -9.0],
               [-0.15, -0.50, -9.0, -9.0],
               [-0.25, -0.95, -9.0, -9.0]], np.float32)
THR = np.float32(-1.0)
GAPS = {2: [2]}


def code(*w):
    c = 0
    for x in w:
        c = c * 4 + x
    return c


#: emission order is the recursion's own (pos-major)
GOLD_LIMIT = [(code(0, 1, 3), -0.60), (code(0, 1, 2), -0.45),
              (code(1, 3, 2), -0.90), (code(1, 2, 0), -0.60),
              (code(3, 2, 2), -0.85), (code(2, 2, 0), -0.80)]
QUIRK_ABSENT = [code(0, 1, 1), code(0, 0, 2), code(1, 1, 0)]
GOLD_NJUMPS = [(code(0, 1, 3), -0.60), (code(0, 1, 2), -0.45),
               (code(0, 1, 1), -0.80), (code(0, 0, 2), -0.90),
               (code(1, 3, 2), -0.90), (code(1, 2, 0), -0.60),
               (code(1, 1, 0), -0.95),
               (code(3, 2, 2), -0.85), (code(2, 2, 0), -0.80)]
GOLD_NOJUMP = [(code(0, 1, 3), -0.60), (code(1, 3, 2), -0.90),
               (code(3, 2, 2), -0.85), (code(2, 2, 0), -0.80)]


def explorers():
    out = [("python", explore_node_exact)]
    try:
        from rappas_tpu.native import explore_node_exact_native
        out.append(("native", explore_node_exact_native))
    except Exception:  # pragma: no cover - toolchain missing
        pass
    return out


def run(fn, **kw):
    codes, sums = fn(ST, PP, 3, THR, gap_intervals=GAPS, **kw)
    return list(codes), list(sums)


@pytest.mark.parametrize("name,fn", explorers())
def test_gapjump_limit1_golden(name, fn):
    codes, sums = run(fn, do_gap_jumps=True, limit_to_1_jump=True)
    assert codes == [c for c, _ in GOLD_LIMIT], name
    np.testing.assert_allclose(sums, [s for _, s in GOLD_LIMIT],
                               atol=2e-6)
    for q in QUIRK_ABSENT:
        assert q not in codes, (name,
                                "idxOfFirstJump quirk not reproduced")


@pytest.mark.parametrize("name,fn", explorers())
def test_gapjump_njumps_golden(name, fn):
    codes, sums = run(fn, do_gap_jumps=True, limit_to_1_jump=False)
    assert codes == [c for c, _ in GOLD_NJUMPS], name
    np.testing.assert_allclose(sums, [s for _, s in GOLD_NJUMPS],
                               atol=2e-6)


@pytest.mark.parametrize("name,fn", explorers())
def test_no_jump_golden(name, fn):
    codes, sums = run(fn, do_gap_jumps=False)
    assert codes == [c for c, _ in GOLD_NOJUMP], name
    np.testing.assert_allclose(sums, [s for _, s in GOLD_NOJUMP],
                               atol=2e-6)


def test_gap_interval_extraction_matches_fixture():
    """The alignment that motivates GAPS: a 6-column alignment with one
    row gapped at columns 2-3 yields exactly {2: [2]}
    (``Alignment.java:229-260`` semantics)."""
    from rappas_tpu.alignment import Alignment
    from rappas_tpu.alphabet import DNA
    aln = Alignment.from_records(
        DNA, [("x", "ACTGGA"), ("y", "AC--GA"), ("z", "CATGCT")])
    assert aln.gap_intervals() == {2: [2]}
