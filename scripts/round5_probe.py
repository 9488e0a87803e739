"""Round-5 measurement program (real v5e chip).

Sections (pass letters as argv, default all):

A. gather-cliff curve -- full accumulate step per-row cost vs dense
   table size at E=304 f32 (locates the fast->slow boundary that sets
   the direct-split part size).
B. config 2 (k=10 heavy DB, 1.26 GB direct table): unsplit vs
   height-split part-routed accumulate (VERDICT r4 item 1), plus host
   routing cost.
C. configs 3/5 (k=12 sparse 4000-taxon postings): two-stage unique
   gather vs part-routed window gathers (VERDICT r4 item 2).
D. config 3 (multi-GB k=12 light table): same A/B at B=4096.
E. u16x2-packed dense rows (two u16 edge columns per int32 word,
   VPU unpack post-gather) vs f32 rows (VERDICT r4 item 4; round-2
   measured the same idea slower -- fresh number for the record).

Findings land in docs/PERF.md round 5.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax                                        # noqa: E402
import jax.numpy as jnp                           # noqa: E402

from rappas_tpu.place.engine import (             # noqa: E402
    PlacementEngine, _bucket_size, accumulate, finalize, kmer_rows,
    routed_accumulate)

BENCH_CACHE = Path("/tmp/rappas_bench_db")


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(jnp.ravel(leaves[-1])[:1]))


def _timed(fn, n=20):
    out = fn()
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _force(out)
    return (time.perf_counter() - t0) / n


def timed2(fn, n=20):
    """Best of two measurement windows (tunnel drift)."""
    return min(_timed(fn, n), _timed(fn, n))


# ------------------------------------------------------------------ #

def probe_a():
    print("== A: gather-cliff curve, E=304 f32, B=8192 Q=144 ==",
          flush=True)
    E = 304
    B, Q = 8192, 144
    rng = np.random.default_rng(0)
    for mb in (48, 56, 64, 72, 80, 88, 96, 128, 256, 512, 1024):
        R = mb * (1 << 20) // (E * 4)
        D = jnp.asarray(rng.random((R, E), np.float32))
        rows = jnp.asarray(rng.integers(0, R, (B, Q)).astype(np.int32))
        dt = timed2(lambda: accumulate(D, rows))
        per_row = dt / (B * Q) * 1e9
        print(f"  {mb:4d} MB ({R:8d} rows): {dt * 1e3:7.2f} ms  "
              f"{per_row:6.2f} ns/row", flush=True)
        del D, rows
    # narrow rows (the light-table width): where is the cliff there?
    print("  -- narrow rows (2P=16 int32, light-table width) --",
          flush=True)
    W2 = 16
    for mb in (48, 64, 80, 96, 128):
        R = mb * (1 << 20) // (W2 * 4)
        D = jnp.asarray(rng.integers(0, 2 ** 30, (R, W2)).astype(
            np.int32))
        rows = jnp.asarray(
            rng.integers(0, R, (B * 64,)).astype(np.int32))

        def g():
            return D[rows].sum(axis=0)
        dt = timed2(g)
        per_row = dt / rows.shape[0] * 1e9
        print(f"  {mb:4d} MB ({R:8d} rows): {dt * 1e3:7.2f} ms  "
              f"{per_row:6.2f} ns/row", flush=True)
        del D, rows


# ------------------------------------------------------------------ #

def _k10_db():
    from rappas_tpu.db import PhyloKmerDB
    p = BENCH_CACHE / "bench150_k10.rptpu"
    if not p.exists():
        print("  (k=10 DB not cached; run bench.py first)", flush=True)
        return None
    return PhyloKmerDB.load(p)


def probe_b():
    print("== B: config 2 direct split-routing (k=10, 1.26 GB) ==",
          flush=True)
    db = _k10_db()
    if db is None:
        return
    B, L = 8192, 150
    rng = np.random.default_rng(3)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    lens = np.full(B, L, np.int32)

    # --- unsplit baseline ---------------------------------------- #
    import unittest.mock as mock
    with mock.patch.object(PlacementEngine, "DIRECT_SPLIT_MIN", 1 << 62):
        e0 = PlacementEngine(db, table="direct")
    assert e0.direct_parts is None
    codes = e0.encode_batch(mat)
    c_dev = jnp.asarray(codes)
    l_dev = jnp.asarray(lens)

    def step0():
        rows = kmer_rows(c_dev, e0.k, 4, e0.n_rows)
        acc = accumulate(e0.D, rows) * e0.scale
        return finalize(acc, l_dev, e0.thr, e0.k, e0.keep_at_most)

    dt0 = timed2(step0)
    print(f"  unsplit direct:            {dt0 * 1e3:7.2f} ms  "
          f"{B / dt0 / 1e3:6.0f}k r/s", flush=True)
    r_ref = step0()
    te_ref = np.asarray(r_ref[0])
    ts_ref = np.asarray(r_ref[1])
    del e0

    # --- split variants ------------------------------------------ #
    for part_mb in (32, 48, 64):
        with mock.patch.object(PlacementEngine, "LIGHT_SPLIT_BYTES",
                               part_mb << 20):
            e1 = PlacementEngine(db, table="direct")
        assert e1.direct_parts is not None, part_mb
        n_parts = len(e1.direct_parts)
        kidx = e1._host_kmer_indices(codes, lens)
        rows_np = np.where(kidx >= 0, kidx,
                           kidx.dtype.type(e1.n_rows - 1))
        t0 = time.perf_counter()
        routed_np = e1._route_direct(rows_np)
        t_route = time.perf_counter() - t0
        routed = tuple(jnp.asarray(r) for r in routed_np)
        tot_w = sum(r.shape[1] for r in routed_np)

        def step1():
            acc = routed_accumulate(e1.direct_parts, routed) * e1.scale
            return finalize(acc, l_dev, e1.thr, e1.k, e1.keep_at_most)

        dt1 = timed2(step1)
        r1 = step1()
        te1, ts1 = np.asarray(r1[0]), np.asarray(r1[1])
        eq = (np.array_equal(te1, te_ref) and
              np.allclose(ts1, ts_ref, atol=2e-4))
        print(f"  split {n_parts:2d}x{part_mb:3d}MB (sumW={tot_w:4d} "
              f"vs Q={L - e1.k + 1}): {dt1 * 1e3:7.2f} ms  "
              f"{B / dt1 / 1e3:6.0f}k r/s  host-route "
              f"{t_route * 1e3:5.1f} ms  eq={eq}", flush=True)
        del e1, routed


# ------------------------------------------------------------------ #

def _postings_rate(engine, mat, lens, n=20):
    """Device rate through the captured postings step (same method as
    bench.engine_device_rate), covering both the two-stage and the
    routed entry points."""
    import rappas_tpu.place.engine as eng
    names = ("finalize_postings_v2", "finalize_postings_routed")
    origs = {nm: getattr(eng, nm) for nm in names}
    calls = []
    try:
        for nm in names:
            def cap(*a, _orig=origs[nm], **kw):
                calls.append((_orig, a, kw))
                return _orig(*a, **kw)
            setattr(eng, nm, cap)
        codes = engine.encode_batch(mat)
        engine._score_postings(codes, mat, lens).result()
    finally:
        for nm in names:
            setattr(eng, nm, origs[nm])
    orig, a, kw = calls[-1]

    def step():
        return orig(*a, **kw)

    dt = timed2(step, n)
    return dt, np.asarray(step()[0])


def probe_c(db_path, B, tag):
    print(f"== {tag}: postings two-stage vs routed windows ==",
          flush=True)
    from rappas_tpu.db import PhyloKmerDB
    p = Path(db_path)
    if not p.exists():
        print(f"  ({p} not cached)", flush=True)
        return
    db = PhyloKmerDB.load(p)
    L = 150
    rng = np.random.default_rng(4)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    lens = np.full(B, L, np.int32)

    eng = PlacementEngine(db, table="postings")
    n_parts = len(eng.light_parts)
    print(f"  light parts: {n_parts}", flush=True)
    if n_parts > 1:
        eng.enable_routed_windows(False)
    dt0, te0 = _postings_rate(eng, mat, lens)
    print(f"  two-stage:            {dt0 * 1e3:7.2f} ms  "
          f"{B / dt0 / 1e3:6.0f}k r/s", flush=True)
    if n_parts < 2:
        return
    eng.enable_routed_windows()
    dt1, te1 = _postings_rate(eng, mat, lens)
    eq = np.array_equal(te0, te1)
    print(f"  routed (default):     {dt1 * 1e3:7.2f} ms  "
          f"{B / dt1 / 1e3:6.0f}k r/s  edges-eq={eq}", flush=True)


# ------------------------------------------------------------------ #

def probe_e():
    print("== E: u16x2-packed dense rows vs f32 (config-1 shape) ==",
          flush=True)
    E = 304
    E2 = (E + 1) // 2
    B, Q = 16384, 144
    R = 4 ** 8 + 1
    rng = np.random.default_rng(5)
    Df = rng.random((R, E), np.float32)
    u16 = np.round(Df * 65535.0 / 8.0).astype(np.uint16)
    lo = u16[:, 0::2].astype(np.int32)
    hi = np.zeros_like(lo)
    hi[:, :u16[:, 1::2].shape[1]] = u16[:, 1::2].astype(np.int32)
    Dp = jnp.asarray(lo | (hi << 16))
    Dfd = jnp.asarray(Df)
    rows = jnp.asarray(rng.integers(0, R, (B, Q)).astype(np.int32))

    @functools.partial(jax.jit, static_argnames=("block_q",))
    def accumulate_u16x2(Dp, rows, block_q=16):
        B, Q = rows.shape
        pad = (-Q) % block_q
        if pad:
            rows = jnp.concatenate(
                [rows, jnp.full((B, pad), Dp.shape[0] - 1, rows.dtype)],
                axis=1)
        nblocks = rows.shape[1] // block_q
        rows_t = rows.reshape(B, nblocks, block_q).transpose(1, 0, 2)

        def step(acc, r):
            g = Dp[r]
            alo = (g & 0xFFFF).astype(jnp.float32).sum(axis=1)
            ahi = ((g >> 16) & 0xFFFF).astype(jnp.float32).sum(axis=1)
            return (acc[0] + alo, acc[1] + ahi), None

        z = jnp.zeros((B, Dp.shape[1]), jnp.float32)
        (alo, ahi), _ = jax.lax.scan(step, (z, z), rows_t)
        return jnp.stack([alo, ahi], axis=-1).reshape(B, -1)[:, :E]

    dtf = timed2(lambda: accumulate(Dfd, rows))
    dtp = timed2(lambda: accumulate_u16x2(Dp, rows))
    print(f"  f32   [R,304] (80 MB):   {dtf * 1e3:7.2f} ms  "
          f"{dtf / (B * Q) * 1e9:5.2f} ns/row", flush=True)
    print(f"  u16x2 [R,152] (40 MB):   {dtp * 1e3:7.2f} ms  "
          f"{dtp / (B * Q) * 1e9:5.2f} ns/row", flush=True)


# ------------------------------------------------------------------ #

if __name__ == "__main__":
    which = set("".join(sys.argv[1:]).upper() or "ABCDE")
    if "A" in which:
        probe_a()
    if "B" in which:
        probe_b()
    if "C" in which:
        probe_c(BENCH_CACHE / "large4000_k12.rptpu", 8192, "C: k12/4000")
    if "D" in which:
        probe_c("/tmp/rappas_scale_db/DB_k12.rptpu", 4096,
                "D: k12 multi-GB")
    if "E" in which:
        probe_e()
