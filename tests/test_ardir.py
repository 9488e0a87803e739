"""--ardir reuse: consistency validation + the canned RAxML-ng fixture.

VERDICT r2 items 4 & 6.  The reference's ``loadExistingAR`` only checks
that files exist (``ARProcessLauncher.java:158-212``); here a mismatched
AR directory must abort with an actionable message instead of silently
building a wrong DB.  The RAxML-ng fixture
(``tests/fixtures/raxmlng_ardir/``) is a canned output dir in the format
of ``RAXMLNGWrapper.java:120-231`` (converted from a real PhyML run on
the tiny fixture with probability strings copied verbatim), so the full
``--ardir`` build pipeline exercises the RAxML-ng parser end-to-end and
must produce a bit-identical DB.
"""

import shutil

import numpy as np
import pytest

from rappas_tpu.build.pipeline import BuildConfig, build_database


@pytest.fixture(scope="module")
def raxml_ardir(fixtures_dir):
    return fixtures_dir / "raxmlng_ardir"


def _build(fixtures_dir, workdir, ar_dir, align="tiny.fasta",
           tree="tiny.tree"):
    cfg = BuildConfig(k=8, omega=1.5, states="nucl",
                      ar_binary="/fake/path/raxml-ng", ar_dir=str(ar_dir))
    return build_database(fixtures_dir / align, fixtures_dir / tree,
                          workdir, cfg)


def test_raxmlng_ardir_build_bit_identical(tmp_path, fixtures_dir,
                                           raxml_ardir):
    """Full build through the RAxML-ng parser == the PhyML build the
    fixture was converted from, bit for bit."""
    db = _build(fixtures_dir, tmp_path, raxml_ardir)
    exp = np.load(raxml_ardir / "expected_db.npz")
    assert np.array_equal(db.keys, exp["keys"])
    assert np.array_equal(db.offsets, exp["offsets"])
    assert np.array_equal(db.edges, exp["edges"])
    assert np.array_equal(db.deltas.view(np.uint32),
                          exp["deltas"].view(np.uint32))


def test_ardir_wrong_tree_aborts(tmp_path, fixtures_dir, raxml_ardir):
    """An AR dir built for a different tree (other leaf set) aborts."""
    # 5-taxon subset of the tiny fixture: drop T6 from align and tree
    recs = (fixtures_dir / "tiny.fasta").read_text().split(">")
    keep = [r for r in recs if r and not r.startswith("T6")]
    (tmp_path / "sub.fasta").write_text(">" + ">".join(keep))
    (tmp_path / "sub.tree").write_text(
        "(((T1:0.1,T2:0.12)n1:0.2,T3:0.3)n2:0.15,"
        "(T4:0.11,T5:0.09)n3:0.22)root;\n")
    with pytest.raises(SystemExit, match="does not match"):
        _build(tmp_path, tmp_path / "wd", raxml_ardir,
               align=str(tmp_path / "sub.fasta"),
               tree=str(tmp_path / "sub.tree"))


def test_ardir_wrong_sites_aborts(tmp_path, fixtures_dir, raxml_ardir):
    """An AR dir whose posteriors cover a different site count aborts."""
    # truncate every sequence to 100 of 120 columns, same labels
    out = []
    for block in (fixtures_dir / "tiny.fasta").read_text().split(">"):
        if not block.strip():
            continue
        name, seq = block.split("\n", 1)
        out.append(f">{name}\n{seq.strip()[:100]}\n")
    (tmp_path / "short.fasta").write_text("".join(out))
    with pytest.raises(SystemExit, match="sites"):
        _build(tmp_path, tmp_path / "wd", raxml_ardir,
               align=str(tmp_path / "short.fasta"),
               tree=str(fixtures_dir / "tiny.tree"))


def test_fresh_run_truncated_output_aborts(tmp_path, fixtures_dir,
                                           raxml_ardir):
    """A FRESH AR run whose output is truncated (disk full / OOM-killed
    AR program) must abort with the actionable site-count mismatch, not
    surface later as a parser error.  The reference gates fresh PhyML
    runs on parsed stats (``ARProcessLauncher.java:302-314,737-797``);
    here ``validate_existing`` runs after ``launch()`` too."""
    probas = (raxml_ardir /
              "extended_align.phylip.raxml.ancestralProbs").read_text()
    lines = probas.splitlines()
    truncated = "\n".join(lines[: len(lines) // 2]) + "\n"
    fake = tmp_path / "raxml-ng"
    fake.write_text(
        "#!/bin/sh\n"
        f"cp {raxml_ardir}/extended_align.phylip.raxml.ancestralTree .\n"
        f"cp {tmp_path}/truncated.probas "
        "extended_align.phylip.raxml.ancestralProbs\n")
    (tmp_path / "truncated.probas").write_text(truncated)
    fake.chmod(0o755)
    cfg = BuildConfig(k=8, omega=1.5, states="nucl", ar_binary=str(fake))
    with pytest.raises(SystemExit, match="truncated"):
        build_database(fixtures_dir / "tiny.fasta",
                       fixtures_dir / "tiny.tree", tmp_path / "wd", cfg)


def test_ardir_missing_files_aborts(tmp_path, fixtures_dir, raxml_ardir):
    """Half-copied AR dir (probas file missing) fails fast."""
    broken = tmp_path / "broken_ar"
    broken.mkdir()
    shutil.copy(raxml_ardir / "extended_align.phylip.raxml.ancestralTree",
                broken)
    with pytest.raises(FileNotFoundError):
        _build(fixtures_dir, tmp_path / "wd", broken)
