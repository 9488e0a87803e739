"""End-to-end DB build on a gappy alignment: gap jumps activate
(ratio >= 0.3, ``Main_DBBUILD_3.java:240-261``) and the native exact
explorer takes over."""

import numpy as np
import pytest

from rappas_tpu.build.pipeline import BuildConfig, build_database


@pytest.fixture(scope="module")
def gappy_dataset(tmp_path_factory):
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("gappy")
    bases = "ACGT"
    L = 120
    anc = rng.integers(0, 4, L)

    def mutate(seq, p):
        m = rng.random(L) < p
        out = seq.copy()
        out[m] = rng.integers(0, 4, m.sum())
        return out

    seqs = {f"T{i}": mutate(anc, 0.12) for i in range(6)}
    # introduce per-taxon gap blocks covering ~40% of columns
    gapped = {}
    for i, (t, s) in enumerate(seqs.items()):
        chars = [bases[c] for c in s]
        start = (i * 17) % (L - 50)
        for j in range(start, start + 48):
            chars[j] = "-"
        gapped[t] = "".join(chars)
    with open(d / "align.fasta", "w") as f:
        for t, s in gapped.items():
            f.write(f">{t}\n{s}\n")
    with open(d / "tree.nwk", "w") as f:
        f.write("(((T0:0.1,T1:0.12)a:0.2,T2:0.3)b:0.15,"
                "((T3:0.11,T4:0.09)c:0.22,T5:0.31)d:0.18)root;\n")
    return d


@pytest.mark.slow
def test_gap_jump_build(gappy_dataset, tmp_path):
    cfg = BuildConfig(k=6, states="nucl",
                      ar_binary="/root/reference/bindep/phyml_x64")
    db = build_database(gappy_dataset / "align.fasta",
                        gappy_dataset / "tree.nwk", tmp_path, cfg)
    assert db.meta["gap_jumps"] is True
    assert db.n_kmers > 100


@pytest.mark.slow
def test_gap_jump_native_equals_python(gappy_dataset, tmp_path_factory):
    """Build twice -- native explorer vs forced python port -- and
    compare DB content bit for bit."""
    import rappas_tpu.build.pipeline as bp

    wd1 = tmp_path_factory.mktemp("native")
    cfg = BuildConfig(k=6, states="nucl",
                      ar_binary="/root/reference/bindep/phyml_x64")
    db1 = build_database(gappy_dataset / "align.fasta",
                         gappy_dataset / "tree.nwk", wd1, cfg)

    # substitute the python port for the native explorer
    import rappas_tpu.native as native_mod
    from rappas_tpu.build.explorer import explore_node_exact
    orig = native_mod.explore_node_exact_native
    try:
        native_mod.explore_node_exact_native = explore_node_exact
        wd2 = tmp_path_factory.mktemp("python")
        cfg2 = BuildConfig(k=6, states="nucl",
                           ar_binary="/root/reference/bindep/phyml_x64",
                           ar_dir=str(wd1 / "AR"))
        db2 = build_database(gappy_dataset / "align.fasta",
                             gappy_dataset / "tree.nwk", wd2, cfg2)
    finally:
        native_mod.explore_node_exact_native = orig

    assert np.array_equal(db1.keys, db2.keys)
    assert np.array_equal(db1.edges, db2.edges)
    assert np.array_equal(db1.deltas.view(np.uint32),
                          db2.deltas.view(np.uint32))
