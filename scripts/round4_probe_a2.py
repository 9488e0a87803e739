"""Round-4 probe A2: postings step vs batch size.

Probe A showed the grouped-sort idea is a loss (sort cost at these
widths is nearly independent of the ROW count: 256 rows and 1817 rows
both ~2 ms at width 128), which means the step carries a large fixed
overhead.  The cheap win is then amortization: time the full captured
postings step at B in {4096, 8192, 16384, 32768} and report reads/s.
Host-side prep (kmer indexing, compaction, unique) is timed separately
so the device-sustained and orchestration ceilings stay distinct.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import numpy as np

from round4_probe import capture_step, reads_for, timed


def main():
    from scale_check import build_large_db

    from rappas_tpu.place.engine import PlacementEngine

    print("device:", jax.devices()[0], flush=True)
    db = build_large_db()
    engine = PlacementEngine(db, table="postings")
    L = 150
    for B in (4096, 8192, 16384, 32768):
        mat, lens = reads_for(db, B, L)
        codes_np = engine.encode_batch(mat)
        t0 = time.perf_counter()
        (a_args, a_kw), orig = capture_step(engine, codes_np, mat, lens)
        host_dt = time.perf_counter() - t0

        def full():
            return orig(*a_args, **a_kw)
        dt = timed(full, n=20)
        W = np.asarray(a_args[1]).shape[1]
        print(f"B={B:6d} W={W:3d}: device {dt * 1e3:6.2f} ms "
              f"({B / dt / 1e3:5.0f}k r/s)  host prep {host_dt * 1e3:6.1f} ms "
              f"({B / host_dt / 1e3:5.0f}k r/s)", flush=True)


if __name__ == "__main__":
    main()
