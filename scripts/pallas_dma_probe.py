"""Mosaic-level attack on the 6.7 ns/row gather constant (VERDICT r2 #2).

The dense placement path is bounded by XLA's random-row gather at
~6.7 ns/row (docs/PERF.md round-2 study).  Round 2 *estimated* that a
Pallas per-row DMA kernel cannot beat it (descriptor issue ~30 ns each)
but never measured it.  This probe measures the remaining unexplored
cells on real hardware:

1. per-row HBM->VMEM DMA gather with an N-deep pipelined semaphore
   ring (manual double/quad/oct buffering over row blocks) -- the
   experiment VERDICT r2 names explicitly;
2. the same kernel issuing G rows per ring slot (amortizes the
   scalar-loop and semaphore overhead over G descriptors);
3. two independent XLA gathers inside one jit -- do concurrent gather
   streams overlap (i.e. is 6.7 ns/row a per-stream or a chip-wide
   rate)?
4. sorted vs random indices -- does the gather engine reward locality?

Run on the real chip: `python scripts/pallas_dma_probe.py`.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _force(out):
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timed(fn, *args, n=20):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = fn(*args)
    _force(outs)
    return (time.perf_counter() - t0) / n


def dma_gather_sum(D, rows, *, nslots=8, group=1):
    """sum_i D[rows[i]] via per-row async DMAs, nslots-deep ring.

    D: [n_rows, E] f32 in HBM.  rows: [N] int32 (N % (nslots*group) == 0).
    Returns [1, E] f32.  Each ring slot holds `group` rows fetched by
    `group` independent DMAs sharing one semaphore (waited jointly).
    """
    n_rows, E = D.shape
    N = rows.shape[0]
    n_groups = N // group
    assert n_groups % nslots == 0

    def kernel(rows_ref, D_ref, out_ref, scratch, sems):
        def dma(g, slot, j):
            idx = rows_ref[g * group + j]
            return pltpu.make_async_copy(
                D_ref.at[pl.ds(idx, 1), :],
                scratch.at[slot, pl.ds(j, 1), :],
                sems.at[slot, j],
            )

        def start(g, slot):
            for j in range(group):
                dma(g, slot, j).start()

        for s in range(nslots):
            start(s, s)

        def body(g, acc):
            slot = jax.lax.rem(g, nslots)
            for j in range(group):
                # .wait() only uses the semaphore + byte count (both
                # identical for every row copy), so reconstructing the
                # handle with the current g's index is fine
                dma(g, slot, j).wait()
            acc = acc + scratch[slot].sum(axis=0, keepdims=True)

            @pl.when(g + nslots < n_groups)
            def _():
                start(g + nslots, slot)

            return acc

        acc = jax.lax.fori_loop(
            0, n_groups, body, jnp.zeros((1, E), jnp.float32))
        out_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, E), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nslots, group, E), jnp.float32),
                pltpu.SemaphoreType.DMA((nslots, group)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, D)


def main():
    rng = np.random.default_rng(0)
    E = 304
    n_rows = 65536
    N = 1 << 17  # rows gathered per call
    D_np = rng.random((n_rows, E), np.float32)
    D = jnp.asarray(D_np)
    rows_np = rng.integers(0, n_rows, N).astype(np.int32)
    rows = jnp.asarray(rows_np)
    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"table {D.nbytes / 1e6:.0f} MB, {N} random row fetches/call",
          flush=True)

    # reference: XLA gather+sum on the identical workload
    @jax.jit
    def xla_gather(D, rows):
        r = rows.reshape(-1, 128)

        def body(acc, rr):
            return acc + D[rr].sum(axis=0), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((E,), jnp.float32), r.T)
        return acc

    @jax.jit
    def xla_gather_flat(D, rows):
        return D[rows].sum(axis=0)

    dt = timed(xla_gather_flat, D, rows)
    print(f"XLA gather+sum (flat)  : {dt * 1e3:7.2f} ms  "
          f"{dt / N * 1e9:6.2f} ns/row", flush=True)
    want = D_np[rows_np].sum(axis=0)

    # --- 1/2: Pallas DMA ring, nslots x group sweep ------------------- #
    for nslots, group in ((4, 1), (8, 1), (16, 1), (8, 4), (8, 8),
                          (16, 8), (8, 16)):
        try:
            f = jax.jit(functools.partial(
                dma_gather_sum, nslots=nslots, group=group))
            got = np.asarray(f(D, rows))[0]
            err = np.abs(got - want).max() / np.abs(want).max()
            dt = timed(f, D, rows, n=5)
            print(f"DMA ring slots={nslots:2d} group={group:2d}: "
                  f"{dt * 1e3:7.2f} ms  {dt / N * 1e9:6.2f} ns/row  "
                  f"(rel err {err:.1e})", flush=True)
        except Exception as e:  # noqa: BLE001 -- probe reports and moves on
            msg = str(e).split(chr(10))[0][:120]
            print(f"DMA ring slots={nslots:2d} group={group:2d}: "
                  f"FAILED: {msg}", flush=True)

    # --- 3: do two concurrent XLA gather streams overlap? ------------- #
    rows2 = jnp.asarray(rng.integers(0, n_rows, N).astype(np.int32))
    D2 = jnp.asarray(rng.random((n_rows, E), np.float32))

    @jax.jit
    def two_streams(D, Da, r1, r2):
        return D[r1].sum(axis=0) + Da[r2].sum(axis=0)

    @jax.jit
    def two_streams_same_table(D, r1, r2):
        return D[r1].sum(axis=0) + D[r2].sum(axis=0)

    dt1 = timed(xla_gather_flat, D, rows)
    dt2 = timed(two_streams, D, D2, rows, rows2)
    dt2s = timed(two_streams_same_table, D, rows, rows2)
    print(f"1 stream {dt1 * 1e3:.2f} ms vs 2 streams {dt2 * 1e3:.2f} ms "
          f"(same table: {dt2s * 1e3:.2f} ms) "
          f"-> overlap factor {2 * dt1 / dt2:.2f}x "
          f"(1.0 = serialized, 2.0 = full overlap)", flush=True)

    # --- 4: sorted vs random indices ---------------------------------- #
    rows_sorted = jnp.asarray(np.sort(rows_np))
    dt_r = timed(xla_gather_flat, D, rows)
    dt_s = timed(xla_gather_flat, D, rows_sorted)
    print(f"random {dt_r / N * 1e9:.2f} ns/row vs sorted "
          f"{dt_s / N * 1e9:.2f} ns/row", flush=True)

    # --- 5: does the overlap carry to the engine's scan-accumulate? --- #
    # The production hot loop is accumulate() -- lax.scan over 16-slot
    # blocks, [B, 16, E] gather per step, running [B, E] accumulator --
    # measured at ~6.7 ns/row (the round-2 speed of light).  If two
    # independent gather streams overlap there too, splitting the batch
    # (or the Q axis) in two concurrent streams is a free ~1.5x.
    from rappas_tpu.place.engine import accumulate

    B, Q = 16384, 144
    rowsBQ = jnp.asarray(
        rng.integers(0, n_rows, (B, Q)).astype(np.int32))
    NBQ = B * Q

    dt = timed(accumulate, D, rowsBQ, n=10)
    print(f"scan-accumulate [B={B},Q={Q}]      : {dt * 1e3:7.2f} ms  "
          f"{dt / NBQ * 1e9:5.2f} ns/row", flush=True)

    @jax.jit
    def acc_split_b(D, r):
        h = B // 2
        return accumulate(D, r[:h]), accumulate(D, r[h:])

    dt = timed(acc_split_b, D, rowsBQ, n=10)
    print(f"2 half-B scans (same jit)          : {dt * 1e3:7.2f} ms  "
          f"{dt / NBQ * 1e9:5.2f} ns/row", flush=True)

    @jax.jit
    def acc_split_q(D, r):
        h = Q // 2
        return accumulate(D, r[:, :h]) + accumulate(D, r[:, h:])

    dt = timed(acc_split_q, D, rowsBQ, n=10)
    print(f"2 half-Q scans (same jit)          : {dt * 1e3:7.2f} ms  "
          f"{dt / NBQ * 1e9:5.2f} ns/row", flush=True)

    @jax.jit
    def acc_dual_body(D, r, block_q=16):
        # one scan whose body issues TWO independent half-B gathers
        h = B // 2
        r1 = r[:h].reshape(h, -1, block_q).transpose(1, 0, 2)
        r2 = r[h:].reshape(h, -1, block_q).transpose(1, 0, 2)

        def body(acc, rr):
            a, b = acc
            return (a + D[rr[0]].sum(axis=1),
                    b + D[rr[1]].sum(axis=1)), None
        init = (jnp.zeros((h, E), jnp.float32),) * 2
        (a, b), _ = jax.lax.scan(body, init, (r1, r2))
        return a, b

    dt = timed(acc_dual_body, D, rowsBQ, n=10)
    print(f"1 scan, 2 gathers per body         : {dt * 1e3:7.2f} ms  "
          f"{dt / NBQ * 1e9:5.2f} ns/row", flush=True)

    @jax.jit
    def acc_quad_body(D, r, block_q=16):
        q4 = B // 4
        rs = [r[i * q4:(i + 1) * q4].reshape(q4, -1, block_q)
              .transpose(1, 0, 2) for i in range(4)]

        def body(acc, rr):
            return tuple(a + D[x].sum(axis=1)
                         for a, x in zip(acc, rr)), None
        init = (jnp.zeros((q4, E), jnp.float32),) * 4
        accs, _ = jax.lax.scan(body, init, tuple(rs))
        return accs

    dt = timed(acc_quad_body, D, rowsBQ, n=10)
    print(f"1 scan, 4 gathers per body         : {dt * 1e3:7.2f} ms  "
          f"{dt / NBQ * 1e9:5.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
