import numpy as np
import pytest

from rappas_tpu.alignment import Alignment
from rappas_tpu.alphabet import DNA


def make(records):
    return Alignment.from_records(DNA, records)


def test_gap_reduction():
    a = make([("s1", "A-C-"), ("s2", "A-CG"), ("s3", "A-C-")])
    # col1 gap prop 1.0 >= 0.99 -> dropped; col3 prop 2/3 kept
    r = a.reduce(0.99)
    assert r.length == 3
    assert r.row(0) == "AC-"


def test_gap_proportions_only_dash():
    # '.' does not count as gap for proportions (Alignment.java:160-166)
    a = make([("s1", "A."), ("s2", "A-")])
    assert a.gap_proportions().tolist() == [0.0, 0.5]


def test_gap_intervals():
    a = make([("s1", "AA--AA-A"), ("s2", "A---AAAA")])
    iv = a.gap_intervals()
    # row1: run at col2 len2, run at col6 len1; row2: run at col1 len3
    assert iv[2] == [2]
    assert iv[6] == [1]
    assert iv[1] == [3]


def test_gap_interval_at_row_end():
    a = make([("s1", "AAA--")])
    assert a.gap_intervals()[3] == [2]


def test_add_gap_rows_updates_intervals():
    a = make([("s1", "ACGT")])
    b = a.add_gap_rows(["g1"])
    assert b.n_rows == 2
    # the all-gap row registers a full-length interval at col 0
    # (updateGapIntervals after addAllSequences, Alignment.java:386-424)
    assert b.gap_intervals()[0] == [4]


def test_rejects_unknown_state():
    with pytest.raises(ValueError):
        make([("s1", "AC!T")])


def test_phylip_format(tmp_path):
    a = make([("seq1", "ACGT" * 100)])
    p = tmp_path / "x.phylip"
    a.write_phylip(p)
    lines = p.read_text().splitlines()
    assert lines[0] == "1 400"
    # label padded to 250 chars, then sequence with a space every 250
    assert lines[1][:250] == "seq1".ljust(250)
    body = lines[1][250:]
    assert body[250] == " "
    assert len(body) == 400 + 1


def test_gap_ratio():
    a = make([("s1", "A---"), ("s2", "AAAA")])
    # sum(prop)/sum(1-prop) = 1.5 / 2.5
    assert np.isclose(a.gap_ratio(), 1.5 / 2.5)
