"""--original-nodes support: shortest_path port, ghost-neighbor
resolution table, TSV mapping columns (PlacementProcess.java:856-962)."""

import numpy as np
import pytest

from rappas_tpu.build.pipeline import orinodes_resolution_table
from rappas_tpu.tree import parse_newick
from tests.test_golden import GOLDEN_READS, build_golden_db


def test_shortest_path_port():
    """Port of PhyloTree.shortestPath (PhyloTree.java:586-673): the
    docstring example -- path B->A via W, and a path through the LCA."""
    t = parse_newick("(((A:0.1,B:0.2)W:0.1,C:0.3)Z:0.3,D:0.4)added_root;")
    A, B, C, D = (t.by_label(x) for x in "ABCD")
    W, Z = t.by_label("W"), t.by_label("Z")

    path, nd, bd = t.shortest_path(B, A)
    assert [n.label for n in path] == ["B", "W", "A"]
    assert nd == 1                       # the LCA W
    assert abs(bd - (0.2 + 0.1)) < 1e-6

    path, nd, bd = t.shortest_path(A, D)
    assert [n.label for n in path] == ["A", "W", "Z", "added_root", "D"]
    assert nd == 3                       # W, Z + the LCA root
    assert abs(bd - (0.1 + 0.1 + 0.3 + 0.4)) < 1e-6

    # a -> its own ancestor: LCA is the ancestor itself
    path, nd, bd = t.shortest_path(A, W)
    assert [n.label for n in path] == ["A", "W"]
    assert nd == 1
    assert abs(bd - 0.1) < 1e-6

    # identical nodes: single-element path, zero distances
    path, nd, bd = t.shortest_path(A, A)
    assert [n.label for n in path] == ["A"]
    assert nd == 0 and bd == 0.0


def test_resolution_table_golden_tree():
    """Internal node ab resolves to the ghost on its first child edge
    (the reference's child-0 fallback, always taken since
    secondBestNodeId is never set); leaves resolve to the ghost on
    their own edge (documented deviation from a reference crash)."""
    from rappas_tpu.ar.results import ARResults
    from rappas_tpu.extend import extend_tree

    original = parse_newick("((A:0.1,B:0.2)ab:0.3,C:0.4)root;")
    original.reset_jplace_edge_ids()
    extended = extend_tree(original, n_ghosts=1)
    ar = ARResults(ar_tree=extended, probas=None,
                   ar_to_extended={n.id: n.id for n in extended.nodes})
    table = orinodes_resolution_table(ar, extended, original)

    by_label = {n.label: n.id for n in original.nodes}
    # every original node resolves to a ghost
    assert set(table) == {str(n.id) for n in original.nodes}
    for node in original.nodes:
        ar_id, ar_lbl, ext_id, ext_lbl, orig = table[str(node.id)]
        assert "_X0" in ext_lbl          # always an X0 chain ghost
        ghost = extended.by_id(ext_id)
        assert ghost.is_fake
        if node.is_leaf:
            # ghost on the leaf's own edge
            assert orig == node.id
        else:
            # ghost on the first child edge
            first_child_ids = {c.id for c in node.children}
            assert orig in first_child_ids
    # deterministic spot checks
    assert table[str(by_label["ab"])][4] == by_label["A"]
    assert table[str(by_label["root"])][4] == by_label["ab"]
    assert table[str(by_label["A"])][4] == by_label["A"]


def test_tsv_columns_filled_for_orinodes_db(tmp_path):
    """Placement TSV: --original-nodes DBs fill the AR/extended mapping
    columns; default DBs leave them empty (reference parity,
    PlacementProcess.java:937-962)."""
    from rappas_tpu.ar.results import ARResults
    from rappas_tpu.extend import extend_tree
    from rappas_tpu.place.pipeline import PlacementConfig, place_queries

    db, by_label = build_golden_db(exact=False)
    q = tmp_path / "reads.fasta"
    with open(q, "w") as f:
        for i, r in enumerate(GOLDEN_READS):
            f.write(f">r{i}\n{r}\n")

    # default DB: mapping columns empty
    out_dir = tmp_path / "default"
    place_queries(db, q, out_dir, PlacementConfig(batch_size=8))
    rows = [ln.split("\t") for ln in
            (out_dir / "logs" / "placements_reads.fasta.tsv")
            .read_text().splitlines()[1:]]
    assert rows and all(r[1] == r[2] == r[3] == r[4] == "" for r in rows)

    # orinodes DB (same postings + resolution meta): columns filled
    original = db.tree
    extended = extend_tree(original, n_ghosts=1)
    ar = ARResults(ar_tree=extended, probas=None,
                   ar_to_extended={n.id: n.id for n in extended.nodes})
    db.meta["orinodes_resolution"] = orinodes_resolution_table(
        ar, extended, original)
    db.meta["only_fake_nodes"] = False
    out_dir2 = tmp_path / "orinodes"
    place_queries(db, q, out_dir2, PlacementConfig(batch_size=8))
    rows2 = [ln.split("\t") for ln in
             (out_dir2 / "logs" / "placements_reads.fasta.tsv")
             .read_text().splitlines()[1:]]
    assert rows2 and all(r[1] and r[2] and r[3] and r[4] for r in rows2)
    labels = {n.id: n.label for n in original.nodes}
    for r in rows2:
        assert "_X0" in r[4]             # extended name is a ghost
        assert labels[int(r[5])] == r[6]
    # round-trips through DB save/load (meta is JSON)
    db_path = tmp_path / "db.rptpu"
    db.save(db_path)
    from rappas_tpu.db import PhyloKmerDB
    db2 = PhyloKmerDB.load(db_path)
    assert db2.meta["orinodes_resolution"] == db.meta["orinodes_resolution"]
    assert db2.meta["only_fake_nodes"] is False


@pytest.mark.slow
def test_e2e_original_nodes_build(tmp_path, fixtures_dir):
    """Full CLI build with --original-nodes (PhyML) then placement:
    resolution meta present, TSV mapping columns filled."""
    from rappas_tpu.cli import main
    rc = main(["-p", "b", "-b", "/root/reference/bindep/phyml_x64",
               "-r", str(fixtures_dir / "tiny.fasta"),
               "-t", str(fixtures_dir / "tiny.tree"),
               "-w", str(tmp_path), "--original-nodes",
               "--dbfilename", "ori.rptpu"])
    assert rc == 0
    rc = main(["-p", "p", "-d", str(tmp_path / "ori.rptpu"),
               "-q", str(fixtures_dir / "tiny_reads.fasta"),
               "-w", str(tmp_path), "--batch-size", "64"])
    assert rc == 0
    tsv = (tmp_path / "logs" /
           "placements_tiny_reads.fasta.tsv").read_text().splitlines()
    assert len(tsv) > 1
    for ln in tsv[1:]:
        cols = ln.split("\t")
        assert cols[1] != "" and cols[3] != ""
