"""CLI flag-surface tests (through argparse, like a user would)."""

import json

import pytest

from rappas_tpu.cli import main


PHYML = "/root/reference/bindep/phyml_x64"


def test_missing_args():
    with pytest.raises(SystemExit):
        main([])
    assert main(["-p", "b"]) == 2          # needs -r/-t
    assert main(["-p", "p"]) == 2          # needs -d/-q


def test_arinputonly(tmp_path, fixtures_dir):
    rc = main(["-p", "b", "-b", PHYML,
               "-r", str(fixtures_dir / "tiny.fasta"),
               "-t", str(fixtures_dir / "tiny.tree"),
               "-w", str(tmp_path), "--arinputonly"])
    assert rc == 0
    cmd = (tmp_path / "AR" / "ar_command.txt").read_text()
    assert "--ancestral" in cmd
    assert (tmp_path / "extended_trees" /
            "extended_align.phylip").exists()
    assert not list(tmp_path.glob("*.rptpu"))


@pytest.mark.slow
def test_aronly(tmp_path, fixtures_dir):
    rc = main(["-p", "b", "-b", PHYML,
               "-r", str(fixtures_dir / "tiny.fasta"),
               "-t", str(fixtures_dir / "tiny.tree"),
               "-w", str(tmp_path), "--aronly"])
    assert rc == 0
    assert (tmp_path / "AR" /
            "extended_align.phylip_phyml_ancestral_seq.txt").exists()
    assert not list(tmp_path.glob("*.rptpu"))


@pytest.mark.slow
def test_build_jsondb_and_place(tmp_path, fixtures_dir):
    rc = main(["-p", "b", "-b", PHYML,
               "-r", str(fixtures_dir / "tiny.fasta"),
               "-t", str(fixtures_dir / "tiny.tree"),
               "-w", str(tmp_path), "--jsondb",
               "--dbfilename", "test.rptpu"])
    assert rc == 0
    dump = json.loads((tmp_path / "DB.json").read_text())
    word = next(iter(dump))
    assert len(word) == 8
    rc = main(["-p", "p", "-d", str(tmp_path / "test.rptpu"),
               "-q", str(fixtures_dir / "tiny_reads.fasta"),
               "-w", str(tmp_path), "--batch-size", "64"])
    assert rc == 0
    j = json.loads(
        (tmp_path / "placements_tiny_reads.fasta.jplace").read_text())
    assert j["version"] == 3 and j["placements"]


@pytest.mark.slow
def test_dbinram(tmp_path, fixtures_dir):
    """--dbinram builds then places in one invocation WITHOUT writing
    any DB file (the reference's contract: place from RAM and skip DB
    persistence entirely, Main_DBBUILD_3.java:873-986)."""
    rc = main(["-p", "b", "-b", PHYML,
               "-r", str(fixtures_dir / "tiny.fasta"),
               "-t", str(fixtures_dir / "tiny.tree"),
               "-w", str(tmp_path), "--dbinram",
               "-q", str(fixtures_dir / "tiny_reads.fasta"),
               "--batch-size", "64"])
    assert rc == 0
    assert (tmp_path /
            "placements_tiny_reads.fasta.jplace").exists()
    assert not list(tmp_path.rglob("*.rptpu")), \
        "--dbinram must not persist the DB"


def test_reference_compat_flags_accepted(tmp_path, fixtures_dir):
    """--extree/--dbfull/--poshash parse and don't change behavior
    (reference compat: ArgumentsParser_v2.java:407-424,471-474)."""
    rc = main(["-p", "b", "-b", PHYML,
               "-r", str(fixtures_dir / "tiny.fasta"),
               "-t", str(fixtures_dir / "tiny.tree"),
               "-w", str(tmp_path), "--arinputonly",
               "--extree", str(tmp_path), "--dbfull", "--poshash"])
    assert rc == 0
    assert (tmp_path / "AR" / "ar_command.txt").exists()
