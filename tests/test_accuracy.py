"""Placement accuracy sanity: reads drawn from a leaf should place on or
adjacent to that leaf's edge (the expected-node-distance criterion PEWO
uses to benchmark the reference externally, SURVEY.md section 4)."""

import numpy as np
import pytest

from rappas_tpu.place.engine import PlacementEngine
from rappas_tpu.seqio import read_fasta


def node_distance(arr, a, b):
    """#edges between nodes a and b on the original tree."""
    pa, pb = [], []
    while a != -1:
        pa.append(a)
        a = int(arr.parent[a])
    while b != -1:
        pb.append(b)
        b = int(arr.parent[b])
    sa = {n: i for i, n in enumerate(pa)}
    for j, n in enumerate(pb):
        if n in sa:
            return sa[n] + j
    return len(pa) + len(pb)


@pytest.mark.slow
def test_reads_place_near_origin(tiny_db, fixtures_dir):
    db = tiny_db
    arr = db.arrays
    engine = PlacementEngine(db)
    seqs = dict(read_fasta(fixtures_dir / "tiny.fasta"))
    label_to_id = {lb: i for i, lb in enumerate(arr.labels) if lb}

    rng = np.random.default_rng(0)
    n_ok = 0
    n_total = 0
    for taxon, seq in seqs.items():
        src = label_to_id[taxon]
        for _ in range(10):
            start = int(rng.integers(0, len(seq) - 60))
            read = seq[start:start + 60]
            mat = np.frombuffer(read.encode(), np.uint8)[None, :]
            res = engine.score(mat.copy(),
                               np.array([len(read)], np.int32))
            assert res.n_matched[0] > 0
            best = int(res.top_edges[0][0])
            d = node_distance(arr, best, src)
            n_total += 1
            if d <= 2:
                n_ok += 1
    # exact 60bp subsequences of the leaf should overwhelmingly place on
    # or right next to that leaf's edge
    assert n_ok / n_total >= 0.8, f"{n_ok}/{n_total} within distance 2"
