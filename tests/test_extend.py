import numpy as np

from rappas_tpu.extend import extend_tree
from rappas_tpu.tree import parse_newick


def make_tree():
    return parse_newick("((A:0.1,B:0.2)ab:0.3,C:0.4)r;")


def test_ghost_counts_and_ids():
    t = make_tree()
    ext = extend_tree(t, n_ghosts=1)
    # 4 edges -> 4 quads (X0,X1,X2,X3)
    assert len(ext.fake_internal) == 8
    assert len(ext.fake_leaves) == 8
    # id node_count (=5) is skipped; first quad starts at 6
    # (ExtendedTree.java:144,284-288)
    ids = sorted(n.id for n in ext.fake_internal + ext.fake_leaves)
    assert ids[0] == 6
    assert 5 not in {n.id for n in ext.nodes}


def test_postorder_edge_processing():
    """Edges get ghost ids in post-order of the son node: A, B, ab, C
    (ExtendedTree.java:242-254)."""
    t = make_tree()
    ext = extend_tree(t, n_ghosts=1)
    # first quad (6..9) belongs to A's edge, mapped to A's id
    a_id = 2  # from parser numbering
    assert ext.fake_to_original[6] == a_id
    assert ext.fake_to_original[7] == a_id


def test_branch_length_formulas():
    t = make_tree()
    ext = extend_tree(t, n_ghosts=1)
    # leaf edge A (l_init=0.1): l_b = 0.05; X0 bl = l_b, X1 bl = l_b
    x0 = ext.by_id(6)
    x1 = ext.by_id(7)
    assert np.isclose(float(x0.branch_len), 0.05)
    assert np.isclose(float(x1.branch_len), 0.05)
    # X2/X3 bl = 0.01 (ExtendedTree.java:287-288)
    assert np.isclose(float(ext.by_id(8).branch_len), 0.01)
    # internal edge ab (l_init=0.3): l_b=0.15, l_XO_B=0.15,
    # mean leaf path below ab (after child extension) = (0.1+0.2)/2=0.15
    # -> l_new = 0.15 + 0.15 = 0.3
    x1_ab = ext.by_id(15)
    assert ext.fake_to_original[15] == 1  # ab's id
    assert np.isclose(float(x1_ab.branch_len), 0.3, atol=1e-6)
    # son B keeps l_init - N*l_b
    assert np.isclose(float(ext.by_id(1).branch_len), 0.15)


def test_multiple_ghosts_chain():
    t = make_tree()
    ext = extend_tree(t, n_ghosts=3)
    # chain on A's edge: A's parent chain holds 3 X0s each bl=0.1/4
    a = ext.by_id(2)
    bl = []
    p = a.parent
    while p is not None and p.is_fake:
        bl.append(float(p.branch_len))
        p = p.parent
    assert len(bl) == 3
    assert np.allclose(bl, 0.025)
    assert np.isclose(float(a.branch_len), 0.1 - 3 * 0.025)


def test_original_tree_untouched():
    t = make_tree()
    before = {n.id: float(n.branch_len) for n in t.nodes}
    extend_tree(t, n_ghosts=1)
    after = {n.id: float(n.branch_len) for n in t.nodes}
    assert before == after
