"""Consolidated postings-engine probe program (real-chip measurements).

One parameterized probe replaces the round-2..4 exploratory scripts
(postings_probe{,2,3,4,5,6}.py, round4_probe{,_a2,_d2}.py).  Their
MEASURED CONCLUSIONS live in docs/PERF.md; the index below maps each to
the subcommand that reproduces it.  Dead experiments (48 B packed rows,
one-hot MXU dense_at, per-row DMA pallas ring, grouped sorts) are
recorded as findings, not kept as code.

Findings index (docs/PERF.md has the numbers):

* round 2: postings stage attribution; gather ns/row vs table height
  (fast <~100 MB, slow above); two-stage unique gather; dense-side
  compaction.                                   -> `breakdown`, `gather`
* round 3: part-routed two-stage beats both-parts+select; 4-stream
  gather overlap (+8%); sorted indices don't help; v5p projection
  corrected.                                    -> `breakdown`
* round 4: per-read-group sort tiling REFUTED (sort cost ~independent
  of row count -- grouping multiplies fixed overhead); B=8192 is the
  k=12/4000 throughput peak; quarter-step shape buckets kill the
  unique-pad cliff (461k -> 666k on the bad batch); split-size sweep
  (96 MB parts right, part count second-order); micro-gathers at
  <=20 reps are DISPATCH-bound on the tunneled chip (~0.9 ms/call) --
  trust only full-step timings.
  -> `grouping`, `batch`, `split`, `gather`, `regimes`

Usage (real TPU):
    python scripts/postings_probes.py breakdown [--db PATH] [--batch B]
    python scripts/postings_probes.py batch     [--db PATH]
    python scripts/postings_probes.py split     [--db PATH]
    python scripts/postings_probes.py grouping  [--db PATH]
    python scripts/postings_probes.py gather
    python scripts/postings_probes.py regimes   [k10|protein|multigb ...]

Default DB: the bench cache's k=12 / 4000-taxon artifact
(/tmp/rappas_bench_db/large4000_k12.rptpu, built by bench.py or
scripts/scale_check.py).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_DB = "/tmp/rappas_bench_db/large4000_k12.rptpu"


# ------------------------------------------------------------------ #
# shared harness
# ------------------------------------------------------------------ #

def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(jnp.ravel(leaves[-1])[:1]))


def timed(fn, *args, n=20):
    """Mean seconds/call over n back-to-back calls (completion forced by
    one scalar fetch).  NOTE: lone small ops at low n measure the
    tunnel's ~0.9 ms/call dispatch, not device time -- see module
    docstring."""
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = fn(*args)
    _force(outs)
    return (time.perf_counter() - t0) / n


def capture_step(engine, codes_np, mat, lens):
    """Run one engine postings step and capture the REAL jit inputs of
    finalize_postings_v2 so stages can be re-timed in isolation."""
    import rappas_tpu.place.engine as eng
    calls = []
    orig = eng.finalize_postings_v2

    def cap(*a, **kw):
        calls.append((a, kw))
        return orig(*a, **kw)

    eng.finalize_postings_v2 = cap
    try:
        engine._score_postings(codes_np, mat, lens).result()
    finally:
        eng.finalize_postings_v2 = orig
    return calls[-1], orig


def reads_for(db, B, L, seed=1):
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    return mat, np.full(B, L, np.int32)


def load_db(path):
    from rappas_tpu.db import PhyloKmerDB
    p = Path(path)
    if not p.exists():
        sys.exit(f"DB not found: {p} -- run bench.py or "
                 "scripts/scale_check.py first")
    return PhyloKmerDB.load(p)


def make_engine(db):
    from rappas_tpu.place.engine import PlacementEngine
    return PlacementEngine(db, table="postings")


def captured(db, B, seed=4):
    eng = make_engine(db)
    mat, lens = reads_for(db, B, 150, seed=seed)
    codes = eng.encode_batch(mat)
    (args, kw), orig = capture_step(eng, codes, mat, lens)
    return eng, args, kw, orig


# ------------------------------------------------------------------ #
# subcommands
# ------------------------------------------------------------------ #

def cmd_breakdown(ns):
    """Stage attribution of the captured device step."""
    db = load_db(ns.db)
    B = ns.batch
    eng, args, kw, orig = captured(db, B)
    light_parts, lrows, uniq = args[0], args[1], args[2]
    parts = eng.light_parts
    W = np.asarray(lrows).shape[1]
    P = parts[0].shape[1] // 2
    sk = kw.get("sort_keep")
    us = None if uniq is None else \
        ([int(np.asarray(u).shape[0]) for u in uniq]
         if isinstance(uniq, tuple) else int(np.asarray(uniq).shape[0]))
    print(f"B={B} W={W} P={P} sort_keep={sk} parts={len(parts)} "
          f"uniq_pads={us}")
    dt = timed(lambda: orig(*args, **kw))
    print(f"full step: {dt * 1e3:.2f} ms ({B / dt / 1e3:.0f}k r/s)")

    if isinstance(uniq, tuple):
        @jax.jit
        def g2(us_, lr):
            compact = jnp.concatenate(
                [p[u] for p, u in zip(parts, us_)], axis=0)
            return compact[lr]
        t = timed(lambda: g2(uniq, lrows))
        print(f"  two-stage gather: {t * 1e3:.2f} ms")
        g = g2(uniq, lrows)
    else:
        from rappas_tpu.place.engine import light_gather

        @jax.jit
        def g1(lr):
            return light_gather(parts, lr)
        t = timed(lambda: g1(lrows))
        print(f"  direct window gather: {t * 1e3:.2f} ms")
        g = g1(lrows)

    @jax.jit
    def sort_stage(g):
        e = g[:, :, :P].reshape(B, W * P)
        d = jax.lax.bitcast_convert_type(
            g[:, :, P:], jnp.float32).reshape(B, W * P)
        return jax.lax.sort((e, d), num_keys=1)
    t = timed(lambda: sort_stage(g))
    print(f"  reshape+bitcast+sort width {W * P}: {t * 1e3:.2f} ms")
    e_s, d_s = sort_stage(g)
    keep = sk or W * P

    @jax.jit
    def scans(e_s, d_s):
        e_s = e_s[:, :keep]
        d_s = d_s[:, :keep]
        cs = jnp.cumsum(d_s, axis=1)
        nxt = jnp.concatenate(
            [e_s[:, 1:], jnp.full((B, 1), -1, e_s.dtype)], axis=1)
        is_end = e_s != nxt
        is_start = jnp.concatenate(
            [jnp.ones((B, 1), bool), e_s[:, 1:] != e_s[:, :-1]], axis=1)
        prev = jnp.concatenate(
            [jnp.zeros((B, 1), cs.dtype), cs[:, :-1]], axis=1)
        start_cs = jax.lax.cummax(
            jnp.where(is_start, prev, -jnp.inf), axis=1)
        seg = cs - start_cs
        return jax.lax.top_k(jnp.where(is_end, seg, -jnp.inf), 7)
    t = timed(lambda: scans(e_s, d_s))
    print(f"  scans+topk width {keep}: {t * 1e3:.2f} ms")


def cmd_batch(ns):
    """Full-step throughput vs batch size (round 4: peak at 8192)."""
    db = load_db(ns.db)
    for B in (4096, 8192, 16384, 32768):
        eng, args, kw, orig = captured(db, B)
        dt = timed(lambda: orig(*args, **kw))
        print(f"B={B:6d}: {dt * 1e3:6.2f} ms ({B / dt / 1e3:5.0f}k r/s)",
              flush=True)


def cmd_split(ns):
    """Full-step throughput vs light-table part size."""
    from rappas_tpu.place.engine import PlacementEngine
    db = load_db(ns.db)
    B = ns.batch
    mat, lens = reads_for(db, B, 150, seed=4)
    default = PlacementEngine.LIGHT_SPLIT_BYTES
    try:
        for split_mb in (96, 256, 33, 17):
            PlacementEngine.LIGHT_SPLIT_BYTES = split_mb << 20
            eng = make_engine(db)
            codes = eng.encode_batch(mat)
            (args, kw), orig = capture_step(eng, codes, mat, lens)
            dt = timed(lambda: orig(*args, **kw))
            print(f"split target {split_mb:3d}MB -> "
                  f"{len(eng.light_parts)} parts: {dt * 1e3:6.2f} ms "
                  f"({B / dt / 1e3:.0f}k r/s)", flush=True)
            del eng
    finally:
        PlacementEngine.LIGHT_SPLIT_BYTES = default


def cmd_grouping(ns):
    """The refuted round-4 hypothesis, kept reproducible: sort cost vs
    row count at fixed width.  If the per-group rows ever start to
    matter (new toolchain), grouping becomes worth revisiting."""
    rng = np.random.default_rng(0)
    for rows, width in ((256, 128), (1817, 128), (4096, 128),
                        (4096, 256), (8192, 256)):
        e = jnp.asarray(rng.integers(0, 8000, (rows, width), np.int32))
        d = jnp.asarray(rng.random((rows, width), np.float32))

        @jax.jit
        def srt(e, d):
            return jax.lax.sort((e, d), num_keys=1)
        t = timed(lambda: srt(e, d))
        print(f"lax.sort [{rows:5d}, {width:3d}]: {t * 1e3:6.2f} ms",
              flush=True)


def cmd_gather(ns):
    """Gather rate vs table size -- chained inside ONE jit so the
    tunnel's per-call dispatch cost cannot pollute the number."""
    rng = np.random.default_rng(0)
    for mb in (13, 64, 129):
        H = mb * (1 << 20) // 64
        part = jnp.asarray(rng.integers(0, 2 ** 30, (H, 16), np.int32))
        idx = jnp.asarray(rng.integers(0, H, 163840).astype(np.int32))

        @jax.jit
        def chain(p, i):
            acc = jnp.int32(0)
            for k in range(10):
                acc = acc + p[(i + k) % H].sum()
            return acc
        t = timed(lambda: chain(part, idx), n=5) / 10
        print(f"{mb:4d}MB table, 163840-row gather: {t * 1e3:6.2f} ms "
              f"({t / 163840 * 1e9:4.1f} ns/row)", flush=True)
        del part


def cmd_regimes(ns):
    """Device rate of the non-headline BASELINE regimes (what bench.py
    records per round, runnable standalone)."""
    which = ns.names or ["k10", "protein", "multigb"]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    payload = {}
    fns = {"k10": bench.bench_k10, "protein": bench.bench_protein,
           "multigb": bench.bench_k12_multigb,
           "k12": bench.bench_k12_postings}
    for name in which:
        fns[name](payload)
        print({k: v for k, v in payload.items() if k.startswith(
            name.replace("multigb", "k12_multigb"))}, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("breakdown", cmd_breakdown), ("batch", cmd_batch),
                     ("split", cmd_split), ("grouping", cmd_grouping),
                     ("gather", cmd_gather), ("regimes", cmd_regimes)):
        p = sub.add_parser(name)
        p.set_defaults(fn=fn)
        if name in ("breakdown", "batch", "split", "grouping"):
            p.add_argument("--db", default=DEFAULT_DB)
            p.add_argument("--batch", type=int, default=8192)
        if name == "regimes":
            p.add_argument("names", nargs="*")
    ns = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)
    ns.fn(ns)


if __name__ == "__main__":
    main()
