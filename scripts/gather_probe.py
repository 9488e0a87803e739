"""Probe the TPU gather cost model for the placement hot loop.

The placement inner loop is `acc += D[rows].sum(axis=1)` over a
[n_rows, E] table.  To pick the right kernel design this probe answers:
is the gather cost per row proportional to useful bytes (-> shrink
bytes), fetched tiles (-> align rows), or row count (-> fewer gathers)?

Timing note: on the tunneled `axon` backend `block_until_ready` returns
before execution finishes, so each measurement dispatches N executions
and forces completion by fetching one element of the LAST output (the
device executes in order).  The one-off fetch handshake is paid in the
warm-up.

Run on the real TPU: `python scripts/gather_probe.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timed(fn, *args, n=30):
    out = fn(*args)
    _force(out)                    # compile + fetch handshake
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = fn(*args)
    _force(outs)
    return (time.perf_counter() - t0) / n


def main():
    from rappas_tpu.place.engine import (accumulate, finalize,
                                         kmer_rows_packed)

    B, Q = 16384, 144
    n_rows = 4 ** 8 + 1
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, n_rows - 1, (B, Q)).astype(np.int32))

    print(f"device: {jax.devices()[0]}", flush=True)

    print("\n-- streaming roofline (full-table reduce, 50 tables) --",
          flush=True)
    Ds = jnp.asarray(rng.random((50, n_rows, 304), np.float32))

    @jax.jit
    def stream(Ds):
        return Ds.sum(axis=(0, 1))
    dt = timed(stream, Ds, n=10)
    print(f"  {Ds.nbytes / 1e9 / dt:6.1f} GB/s", flush=True)

    print("\n-- E sweep (f32 scan-gather accumulate) --", flush=True)
    for E in (128, 256, 304, 384, 512, 1024):
        D = jnp.asarray(rng.random((n_rows, E), np.float32))
        dt = timed(accumulate, D, rows)
        gb = B * Q * E * 4 / 1e9
        print(f"E={E:5d}: {dt * 1e3:7.2f} ms  useful {gb / dt:6.1f} GB/s"
              f"  ns/row {dt / (B * Q) * 1e9:6.2f}", flush=True)

    print("\n-- u16-pair packing (int32 rows, E/2 lanes) --", flush=True)

    @jax.jit
    def acc_packed(Dp, rows, block_q=16):
        Bq, Qq = rows.shape
        rt = rows.reshape(Bq, -1, block_q).transpose(1, 0, 2)

        def body(acc, r):
            g = Dp[r]                                 # [B, bq, E/2] i32
            lo = (g & 0xFFFF).astype(jnp.float32).sum(axis=1)
            hi = ((g >> 16) & 0xFFFF).astype(jnp.float32).sum(axis=1)
            return (acc[0] + lo, acc[1] + hi), None

        init = (jnp.zeros((Bq, Dp.shape[1]), jnp.float32),) * 2
        (lo, hi), _ = jax.lax.scan(body, init, rt)
        return lo, hi

    for E in (304, 512):
        Eh = (E + 1) // 2
        Dp = jnp.asarray(rng.integers(0, 2 ** 31, (n_rows, Eh)).astype(
            np.int32))
        dt = timed(acc_packed, Dp, rows)
        gb = B * Q * Eh * 4 / 1e9
        print(f"E={E:5d}: {dt * 1e3:7.2f} ms  fetched {gb / dt:6.1f} GB/s"
              f"  ns/row {dt / (B * Q) * 1e9:6.2f}", flush=True)

    print("\n-- bf16 D (E lanes, half bytes) --", flush=True)
    for E in (304,):
        Db = jnp.asarray(rng.random((n_rows, E), np.float32)
                         .astype(jnp.bfloat16))

        @jax.jit
        def acc_bf16(D, rows, block_q=16):
            Bq = rows.shape[0]
            rt = rows.reshape(Bq, -1, block_q).transpose(1, 0, 2)

            def body(acc, r):
                return acc + D[r].astype(jnp.float32).sum(axis=1), None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((Bq, D.shape[1]), jnp.float32), rt)
            return acc
        dt = timed(acc_bf16, Db, rows)
        gb = B * Q * E * 2 / 1e9
        print(f"E={E:5d}: {dt * 1e3:7.2f} ms  fetched {gb / dt:6.1f} GB/s"
              f"  ns/row {dt / (B * Q) * 1e9:6.2f}", flush=True)

    print("\n-- block_q sweep (f32, E=304) --", flush=True)
    D = jnp.asarray(rng.random((n_rows, 304), np.float32))
    import functools
    for bq in (8, 16, 48, 144):
        f = jax.jit(functools.partial(accumulate, block_q=bq))
        dt = timed(f, D, rows)
        print(f"bq={bq:4d}: {dt * 1e3:7.2f} ms", flush=True)

    print("\n-- full device step (packed kmers+gather+finalize) --",
          flush=True)
    from bench import synthetic_db
    from rappas_tpu.place.engine import pack_reads

    db = synthetic_db()
    D = jnp.asarray(db.dense_matrix(pad_rows=1))
    thr = jnp.float32(db.thr_log10)
    L = 150
    k = db.k
    nr = D.shape[0]
    codes = rng.integers(0, 4, (B, L)).astype(np.int8)
    packed = jnp.asarray(pack_reads(codes))
    lens = jnp.full(B, L, jnp.int32)

    @jax.jit
    def step(D, packed, lens):
        rows = kmer_rows_packed(packed, lens, k, 4, nr, L)
        acc = accumulate(D, rows)
        return finalize(acc, lens, thr, k, 7)
    dt = timed(step, D, packed, lens)
    print(f"  {dt * 1e3:7.2f} ms  {B / dt / 1e6:5.2f} M reads/s "
          f"(device compute only)", flush=True)


if __name__ == "__main__":
    main()
