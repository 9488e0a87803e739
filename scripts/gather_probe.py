"""Probe the TPU gather cost model for the placement hot loop.

The placement inner loop is `acc += D[rows].sum(axis=1)` over a
[n_rows, E] table.  BASELINE.md measured ~20% of HBM peak for the
round-1 configuration; to pick the right kernel design this probe
answers: is the gather cost per row proportional to

  (a) useful bytes (E*4)            -> shrink bytes (u16 pair packing),
  (b) fetched tiles ceil(E*4/tile)  -> align rows to tile boundaries,
  (c) row count (descriptor-bound)  -> reduce gathers (postings mode).

Also times: the u16-pair-packed int32 variant (half the bytes, same
lane count), the postings sort+segment-sum path, and a pure streaming
read of D as the roofline reference.

Run on the real TPU: `python scripts/gather_probe.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from rappas_tpu.place.engine import accumulate

    B, Q = 16384, 144
    n_rows = 4 ** 8 + 1
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, n_rows - 1, (B, Q)).astype(np.int32))

    print(f"device: {jax.devices()[0]}")
    print(f"B={B} Q={Q} rows={n_rows}")
    print("\n-- E sweep (f32 scan-gather accumulate) --")
    for E in (128, 256, 304, 384, 512, 768, 1024):
        D = jnp.asarray(rng.random((n_rows, E), np.float32))
        dt = timeit(accumulate, D, rows)
        gb = B * Q * E * 4 / 1e9
        print(f"E={E:5d}: {dt * 1e3:7.2f} ms  useful {gb / dt:6.1f} GB/s"
              f"  ns/row {dt / (B * Q) * 1e9:6.2f}")

    print("\n-- u16-pair packing (int32 rows, E/2 lanes) --")

    def acc_packed(Dp, rows, block_q=16):
        Bq, Qq = rows.shape
        pad = (-Qq) % block_q
        if pad:
            rows = jnp.concatenate(
                [rows, jnp.full((Bq, pad), Dp.shape[0] - 1, rows.dtype)],
                axis=1)
        rt = rows.reshape(Bq, -1, block_q).transpose(1, 0, 2)

        def step(acc, r):
            g = Dp[r]                                 # [B, bq, E/2] i32
            lo = (g & 0xFFFF).astype(jnp.float32).sum(axis=1)
            hi = ((g >> 16) & 0xFFFF).astype(jnp.float32).sum(axis=1)
            return acc[0] + lo, acc[1] + hi

        init = (jnp.zeros((Bq, Dp.shape[1]), jnp.float32),) * 2
        def body(c, r):
            return step(c, r), None
        (lo, hi), _ = jax.lax.scan(body, init, rt)
        return lo, hi

    for E in (256, 304, 512):
        Eh = (E + 1) // 2
        Dp = jnp.asarray(rng.integers(0, 2 ** 31, (n_rows, Eh)).astype(
            np.int32))
        f = jax.jit(acc_packed)
        dt = timeit(f, Dp, rows)
        gb = B * Q * Eh * 4 / 1e9
        print(f"E={E:5d}: {dt * 1e3:7.2f} ms  fetched {gb / dt:6.1f} GB/s"
              f"  ns/row {dt / (B * Q) * 1e9:6.2f}")

    print("\n-- streaming roofline (full-table reduce) --")
    for E in (304, 1024):
        D = jnp.asarray(rng.random((n_rows, E), np.float32))
        f = jax.jit(lambda d: d.sum(axis=0))
        dt = timeit(f, D)
        print(f"E={E:5d}: {dt * 1e3:7.2f} ms  "
              f"{D.nbytes / 1e9 / dt:6.1f} GB/s")

    print("\n-- postings mode on the bench-shape DB --")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import synthetic_db
    from rappas_tpu.place.engine import PlacementEngine

    db = synthetic_db()
    mat = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, (B, 150))]
    lens = np.full(B, 150, np.int32)
    for table in ("direct", "postings"):
        eng = PlacementEngine(db, table=table)
        f = lambda: eng.score(mat, lens)
        f()
        t0 = time.perf_counter()
        for _ in range(3):
            f()
        dt = (time.perf_counter() - t0) / 3
        print(f"{table:9s}: {dt * 1e3:7.2f} ms  "
              f"{B / dt / 1e6:5.2f} M reads/s")


if __name__ == "__main__":
    main()
