"""CLI host-loop profile with the device stubbed out.

Replaces PlacementEngine.score_async with an instant fake so the full
place_queries host path (parse, md5 dedup, batching, jplace/TSV
assembly, file writes) is measured in isolation -- the denominator of
VERDICT r4 item 3 (parallelize the host loop across cores).

Usage: python scripts/host_profile.py [n_reads] [--cprofile]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rappas_tpu.db import PhyloKmerDB              # noqa: E402
from rappas_tpu.place import engine as eng         # noqa: E402
from rappas_tpu.place.engine import BatchResult, PendingBatch  # noqa: E402
from rappas_tpu.place.pipeline import (            # noqa: E402
    PlacementConfig, place_queries)

CACHE = Path("/tmp/rappas_bench_db")


class FakeEngine:
    """Instant scorer with plausible outputs: every read places on a
    few edges (exercises the full writer path)."""

    def __init__(self, db, K=7):
        self.db = db
        self.K = K
        self.rng = np.random.default_rng(0)
        self.E = db.n_edge_slots

    def score_async(self, mat, lens):
        B = mat.shape[0]
        te = np.tile(np.arange(self.K, dtype=np.int32), (B, 1))
        te += self.rng.integers(0, self.E - self.K, (B, 1)).astype(
            np.int32)
        ts = -20.0 - np.arange(self.K, dtype=np.float32) * 0.6
        ts = np.tile(ts, (B, 1))
        lwr = np.power(10.0, ts - ts[:, :1])
        lwr /= lwr.sum(axis=1, keepdims=True)
        nm = np.full(B, 40, np.int32)
        return PendingBatch(BatchResult(te, ts.astype(np.float32),
                                        lwr.astype(np.float32), nm))


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 and \
        sys.argv[1].isdigit() else 200_000
    db = PhyloKmerDB.load(CACHE / "bench150.rptpu")
    src = CACHE / "reads1m.fasta"
    sub = Path(f"/tmp/host_profile_reads_{n_reads}.fasta")
    if not sub.exists():
        with open(src) as f, open(sub, "w") as g:
            import itertools
            g.writelines(itertools.islice(f, 2 * n_reads))
    wd = Path("/tmp/host_profile_wd")
    wd.mkdir(exist_ok=True)
    cfg = PlacementConfig(batch_size=16384)
    fake = FakeEngine(db)

    if "--cprofile" in sys.argv:
        import cProfile
        import pstats
        pr = cProfile.Profile()
        pr.enable()
        place_queries(db, sub, wd, cfg, engine=fake)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(35)
    else:
        t0 = time.time()
        place_queries(db, sub, wd, cfg, engine=fake)
        dt = time.time() - t0
        print(f"host-only: {n_reads} reads in {dt:.2f}s = "
              f"{n_reads / dt / 1e3:.0f}k reads/s", flush=True)


if __name__ == "__main__":
    main()
