"""AR output parsing: PhyML / RAxML-ng / PAML formats + unroot reversal."""

import numpy as np
import pytest

from rappas_tpu.alphabet import DNA
from rappas_tpu.ar import wrappers
from rappas_tpu.tree import parse_newick


def test_reroot_surgery():
    """(C3,C1,C2)root; -> ((C1,C2)root,C3)added_root;
    (PHYMLWrapper.java:69-119)."""
    s = "((X:0.3,Y:0.4)c3:0.2,A:0.1,B:0.2);"
    out = wrappers.reroot_ar_newick(s)
    assert out == "(A:0.1,B:0.2,(X:0.3,Y:0.4)c3:0.2);"
    t = wrappers.parse_ar_tree(s, reroot=True)
    assert t.rooted
    assert t.root.label == "added_root"
    assert [c.label for c in t.root.children][1] == "c3"


def test_phyml_proba_parsing():
    tree = parse_newick("((A:0.1,B:0.2)n1:0.3,C:0.4)root;")
    text = (
        "some header\n"
        "\n"
        "Site\tNode\tA\tC\tG\tT\tMPEE\n"
        "1\tn1\t0.7\t0.1\t0.1\t0.1\tA\n"
        "2\tn1\t0.25\t0.25\t0.25\t0.25\tA\n"
        "1\troot\t0.1\t0.2\t0.3\t0.4\tT\n"
        "2\troot\t0.0\t0.0\t1.0\t0.0\tG\n")
    P = wrappers.parse_phyml_probas(text, tree, 2, DNA)
    n1 = tree.by_label("n1").id
    root = tree.by_label("root").id
    assert np.isclose(P[n1, 0, 0], np.log10(0.7), atol=1e-6)
    assert np.isclose(P[root, 0, 3], np.log10(0.4), atol=1e-6)
    # zero clamps to Float.MIN_VALUE then log10
    assert P[root, 1, 0] < -40
    # leaf rows stay NaN
    assert np.isnan(P[tree.by_label("A").id]).all()


def test_raxmlng_proba_parsing():
    tree = parse_newick("((A:0.1,B:0.2)n1:0.3,C:0.4)root;")
    text = (
        "Node\tSite\tState\tp_A\tp_C\tp_G\tp_T\n"
        "n1\t1\tA\t0.9\t0.02\t0.03\t0.05\n"
        "n1\t2\tC\t0.1\t0.6\t0.2\t0.1\n")
    P = wrappers.parse_raxmlng_probas(text, tree, 2, DNA)
    n1 = tree.by_label("n1").id
    assert np.isclose(P[n1, 0, 0], np.log10(0.9), atol=1e-6)
    assert np.isclose(P[n1, 1, 1], np.log10(0.6), atol=1e-6)


PAML_RST = """Supplemental results for BASEML

seqf:  x
treef: y

TREE #  1

Ancestral reconstruction by BASEML.

((A: 0.1, B: 0.2): 0.3, C: 0.4);

((1, 2), 3);

  4..5   5..1   5..2   4..3

tree with node labels for Rod Page's TreeView
((1_A, 2_B) 5 , 3_C) 4 ;

Nodes 4 to 5 are ancestral

(1) Marginal reconstruction of ancestral sequences

Prob distribs at nodes, those with p < 0.001 not listed

Prob distribution at node 4, by site

   site  Freq   Data

      1      1   -: T(0.5) C(0.2) A(0.2) G(0.1)
      2      1   -: A(0.999)

Prob distribution at node 5, by site

   site  Freq   Data

      1      1   -: T(0.25) C(0.25) A(0.25) G(0.25)
      2      1   -: G(0.9) A(0.1)

(2) Joint reconstruction of ancestral sequences

some other content A(0.5) that must not be parsed
"""


def test_paml_parsing():
    tree = wrappers.parse_paml_tree(PAML_RST, DNA)
    assert tree.by_label("4") is tree.root
    n5 = tree.by_label("5")
    assert {c.label for c in n5.children} == {"A", "B"}
    P = wrappers.parse_paml_probas(PAML_RST, tree, 2, DNA)
    assert np.isclose(P[tree.root.id, 0, 3], np.log10(0.5), atol=1e-6)
    # omitted states default to the clamp
    assert P[tree.root.id, 1, 3] < -40
    assert np.isclose(P[tree.root.id, 1, 0], np.log10(0.999), atol=1e-6)
    assert np.isclose(P[n5.id, 1, 2], np.log10(0.9), atol=1e-6)


def test_paml_dat_vendored():
    """All 9 registry .dat matrices resolve from the vendored
    rappas_tpu/ar/paml_dat/ dir with no external search path -- a
    standalone deploy never needs the reference checkout or a PAML
    install (VERDICT r2 item 5; cf. ``EvolModel.java:199-207`` whose
    DCMut/MtArt names don't match its own shipped files)."""
    from rappas_tpu.ar.launcher import ARLauncher
    from rappas_tpu.models import AA_MODELS, EvolModel
    import os
    old = os.environ.pop("PAML_DATA", None)
    try:
        for m in AA_MODELS:
            launcher = ARLauncher("/nonexistent/codeml",
                                  EvolModel.from_string(m))
            p = launcher._find_paml_dat(launcher.model.paml_equivalent)
            assert p.parent.name == "paml_dat" and p.is_file()
            # sanity: a 20x20 matrix file, not an empty stub
            assert p.stat().st_size > 500
    finally:
        if old is not None:
            os.environ["PAML_DATA"] = old


@pytest.mark.slow
def test_codeml_protein_end_to_end(tmp_path, fixtures_dir):
    """Full amino pipeline: codeml AR -> AA phylo-kmers -> placement."""
    from rappas_tpu.build.pipeline import BuildConfig, build_database
    from rappas_tpu.place.engine import PlacementEngine
    from rappas_tpu.place import oracle
    from rappas_tpu.seqio import read_fasta
    cfg = BuildConfig(k=4, states="amino",
                      ar_binary="/root/reference/bindep/codeml")
    db = build_database(fixtures_dir / "tiny_aa.fasta",
                        fixtures_dir / "tiny_aa.tree", tmp_path, cfg)
    assert db.alphabet.name == "amino"
    assert db.n_kmers > 1000
    engine = PlacementEngine(db, table="compact")
    seqs = dict(read_fasta(fixtures_dir / "tiny_aa.fasta"))
    read = seqs["P4"][30:70]
    mat = np.frombuffer(read.encode(), np.uint8)[None, :].copy()
    res = engine.score(mat, np.array([len(read)], np.int32))
    rows, nm = oracle.place_read(db, read)
    assert nm == res.n_matched[0]
    assert int(res.top_edges[0][0]) == rows[0][0]
    assert abs(float(res.top_scores[0][0]) - float(rows[0][1])) < 2e-4


@pytest.mark.slow
def test_baseml_end_to_end(tmp_path, fixtures_dir):
    from rappas_tpu.build.pipeline import BuildConfig, build_database
    cfg = BuildConfig(k=8, states="nucl",
                      ar_binary="/root/reference/bindep/baseml")
    db = build_database(fixtures_dir / "tiny.fasta",
                        fixtures_dir / "tiny.tree", tmp_path, cfg)
    assert db.n_kmers > 1000
