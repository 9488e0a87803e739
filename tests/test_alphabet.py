import numpy as np
import pytest

from rappas_tpu.alphabet import AA, DNA


def test_dna_encode_decode_roundtrip():
    codes = DNA.encode("ACGT")
    assert codes.tolist() == [0, 1, 2, 3]
    assert DNA.decode(codes) == "ACGT"


def test_dna_case_and_u_folding():
    # U -> T like the reference (DNAStatesShifted.java:193-196)
    assert DNA.encode("acgu").tolist() == DNA.encode("ACGT").tolist()


def test_dna_ambiguity_codes():
    # IUPAC table (DNAStatesShifted.java:44-101)
    assert DNA.encode("RYNWSKM-.").tolist() == [-1] * 9
    assert sorted(DNA.ambiguity_codes("R").tolist()) == [0, 2]  # A,G
    assert sorted(DNA.ambiguity_codes("Y").tolist()) == [1, 3]  # C,T
    assert sorted(DNA.ambiguity_codes("B").tolist()) == [1, 2, 3]  # not A
    assert sorted(DNA.ambiguity_codes("N").tolist()) == [0, 1, 2, 3]
    assert sorted(DNA.ambiguity_codes("-").tolist()) == [0, 1, 2, 3]


def test_dna_rejects_invalid():
    with pytest.raises(ValueError):
        DNA.encode("ACGQ")


def test_kmer_indexing_roundtrip():
    idx = DNA.kmer_index(DNA.encode("ACGTAC"), 6)
    assert DNA.kmer_to_string(int(idx), 6) == "ACGTAC"


def test_rolling_kmers():
    idx, valid = DNA.rolling_kmer_indices(DNA.encode("ACGTN" + "ACG"), 3)
    assert len(idx) == 6
    # windows overlapping the N are invalid
    assert valid.tolist() == [True, True, False, False, False, True]
    assert idx[0] == DNA.kmer_index(DNA.encode("ACG"), 3)


def test_aa_alphabet():
    # reference order R=0..V=19 (AAStates.java:23-28)
    assert AA.letters == "RHKDESTNQCGPAILMFWYV"
    assert AA.encode("R")[0] == 0
    assert AA.encode("V")[0] == 19
    # U -> C, O -> L folding only with --convertUO (AAStates.java:118-123)
    from rappas_tpu.alphabet import get_alphabet
    uo = get_alphabet("amino", convert_uo=True)
    assert uo.encode("U")[0] == uo.encode("C")[0]
    assert uo.encode("O")[0] == uo.encode("L")[0]
    with pytest.raises(ValueError):
        AA.encode("U")
    assert sorted(AA.ambiguity_codes("B").tolist()) == sorted(
        [AA.encode("D")[0], AA.encode("N")[0]])
    assert len(AA.ambiguity_codes("X")) == 20
