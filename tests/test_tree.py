import numpy as np

from rappas_tpu.tree import parse_newick, write_newick


NEWICK = "((A:0.1,B:0.2)ab:0.3,C:0.4)r;"


def test_parse_ids_reference_order():
    """Internal nodes are numbered at '(' opening, leaves at token close
    (NewickReader.java:76-160)."""
    t = parse_newick(NEWICK)
    by_label = {n.label: n.id for n in t.nodes}
    assert by_label == {"r": 0, "ab": 1, "A": 2, "B": 3, "C": 4}
    assert t.rooted


def test_jplace_postorder_ids():
    """Leaves numbered as encountered, internal after their subtree
    (PhyloTree.java:419-439)."""
    t = parse_newick(NEWICK)
    t.reset_jplace_edge_ids()
    jp = {n.label: n.jplace_edge_id for n in t.nodes}
    assert jp == {"A": 0, "B": 1, "ab": 2, "C": 3, "r": 4}


def test_forced_rooting():
    """(s1,s2,s3)r; -> ((s1,s2)r,s3)added_root; with next free id
    (NewickReader.java:225-256)."""
    t = parse_newick("(A:0.1,B:0.2,C:0.4)r;", force_rooting=True)
    assert t.rooted
    assert t.root.label == "added_root"
    assert t.root.id == 4  # ids 0..3 consumed by r, A, B, C
    assert [c.label for c in t.root.children] == ["r", "C"]
    assert [c.label for c in t.root.children[0].children] == ["A", "B"]
    assert float(t.root.children[0].branch_len) == 0.0


def test_write_newick_12_decimals():
    t = parse_newick(NEWICK)
    out = write_newick(t)
    # f32 0.1 widened to double then fixed 12 decimals
    assert "A:0.100000001490" in out
    assert out.endswith(";")


def test_write_jplace_labels_roundtrip():
    t = parse_newick(NEWICK)
    t.reset_jplace_edge_ids()
    s = write_newick(t, jplace_labels=True)
    t2 = parse_newick(s, jplace_edge_ids=True)
    assert {n.label: n.jplace_edge_id for n in t2.nodes} == \
        {n.label: n.jplace_edge_id for n in t.nodes}
    # branch lengths survive the roundtrip exactly (12 decimals > f32)
    assert {n.label: float(n.branch_len) for n in t2.nodes} == \
        {n.label: float(n.branch_len) for n in t.nodes}


def test_unrooted_root_suffix_suppressed():
    t = parse_newick("(A:0.1,B:0.2,C:0.4)r;")
    assert not t.rooted
    out = write_newick(t, jplace_labels=True)
    # no branch length nor {id} on the trifurcation root
    # (NewickWriter.java:91-95,193-201)
    assert out.endswith(")r;")


def test_map_nodes():
    a = parse_newick(NEWICK)
    # same topology, different labels on internals, different id order
    b = parse_newick("((C:0.4,(A:0.1,B:0.2)x:0.3)y;".replace("((", "("))
    b = parse_newick("(C:0.4,(A:0.1,B:0.2)x:0.3)y;")
    m = a.map_nodes(b)
    assert m[a.by_label("A").id] == b.by_label("A").id
    assert m[a.by_label("ab").id] == b.by_label("x").id
    assert m[a.root.id] == b.root.id


def test_array_tree():
    t = parse_newick(NEWICK)
    t.reset_jplace_edge_ids()
    arr = t.to_arrays()
    assert arr.parent[t.by_label("A").id] == t.by_label("ab").id
    assert arr.parent[t.root.id] == -1
    assert arr.is_leaf[t.by_label("C").id]
    assert arr.jplace_edge_id[t.by_label("ab").id] == 2
    assert np.isclose(arr.branch_len[t.by_label("B").id], 0.2)
