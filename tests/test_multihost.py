"""Two-process multi-host placement over a real jax.distributed setup.

VERDICT r2 item 7: the ``--coordinator`` path previously never executed
in CI (host sharding was only simulated in-process).  Here two actual
CLI processes initialise ``jax.distributed`` on the CPU backend, shard
the read stream round-robin, hit the ``sync_global_devices`` barrier,
and rank 0 streams the part merge; the result must be semantically
equal to a single-host run.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cpu_env() -> dict:
    env = dict(os.environ)
    # strip the sitecustomize hook that pre-imports jax on the tunneled
    # TPU backend; these subprocesses must run on local CPU
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


def _placements_by_read(jplace_path):
    """Map truncated read header -> p rows.  Dedup is per host shard: a
    duplicate pair split across hosts yields two placements with
    identical p rows, and duplicate headers are truncated at the first
    space -- so the truncated header is the comparable key."""
    j = json.loads(open(jplace_path).read())
    out = {}
    for p in j["placements"]:
        for header, mult in p["nm"]:
            out[header.split(" ")[0]] = [tuple(row) for row in p["p"]]
    return out, j


@pytest.mark.slow
def test_two_process_coordinator(tmp_path, fixtures_dir, tiny_db):
    from rappas_tpu.db import PhyloKmerDB

    dbfile = tmp_path / "db.rptpu"
    tiny_db.save(dbfile)
    reads = fixtures_dir / "tiny_reads.fasta"
    port = _free_port()

    def run(host_id, wd):
        wd.mkdir(exist_ok=True)
        cmd = [sys.executable, "-m", "rappas_tpu.cli", "-p", "p",
               "-d", str(dbfile), "-q", str(reads), "-w", str(wd),
               "--coordinator", f"127.0.0.1:{port}",
               "--num-hosts", "2", "--host-id", str(host_id)]
        return subprocess.Popen(cmd, cwd="/root/repo", env=_cpu_env(),
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    wd = tmp_path / "multi"
    wd.mkdir()
    procs = [run(i, wd) for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"host process failed:\n{o}"

    merged = wd / "placements_tiny_reads.fasta.jplace"
    assert merged.exists(), outs[0]
    got, jm = _placements_by_read(merged)

    # single-host reference run (same CLI, same backend)
    wd1 = tmp_path / "single"
    wd1.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "rappas_tpu.cli", "-p", "p",
         "-d", str(dbfile), "-q", str(reads), "-w", str(wd1)],
        cwd="/root/repo", env=_cpu_env(), capture_output=True, text=True,
        timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    want, j1 = _placements_by_read(
        wd1 / "placements_tiny_reads.fasta.jplace")

    assert jm["tree"] == j1["tree"]
    assert jm["fields"] == j1["fields"]
    assert got == want
    # every read accounted for
    n_reads = sum(1 for line in open(reads) if line.startswith(">"))
    total_nm = sum(len(p["nm"]) for p in jm["placements"])
    # unplaced reads are excluded from jplace on both sides equally
    total_nm_1 = sum(len(p["nm"]) for p in j1["placements"])
    assert total_nm == total_nm_1
    assert total_nm <= n_reads
