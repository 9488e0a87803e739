"""Stage-by-stage cost attribution for the postings-mode placement step.

VERDICT round 2: postings mode runs ~9x above its own gather floor
(111k reads/s at k=12/4000 taxa vs ~1 us/read of pure light gathers).
This probe decomposes `finalize_postings_local` into its pipeline
stages and times each cumulative prefix on the real chip, so the
optimization attacks the measured bottleneck instead of a guessed one.

Timing uses the scalar-fetch sync trick from scripts/gather_probe.py
(the tunneled backend's block_until_ready returns early).

Run on the real TPU: `python scripts/postings_probe.py [B]`.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(jnp.ravel(leaves[-1])[:1]))


def timed(fn, *args, n=20):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = fn(*args)
    _force(outs)
    return (time.perf_counter() - t0) / n


def main():
    from scale_check import build_large_db
    from rappas_tpu.place.engine import (PlacementEngine, gather_rows,
                                         kmer_rows)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    L = 150
    print(f"device: {jax.devices()[0]}  B={B}", flush=True)

    t0 = time.time()
    db = build_large_db()
    engine = PlacementEngine(db, table="postings")
    print(f"DB: {db.n_kmers} kmers, {db.nnz} postings, E={db.n_edge_slots}"
          f" ({time.time() - t0:.1f}s)", flush=True)

    rng = np.random.default_rng(1)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    lens = np.full(B, L, np.int32)
    codes_np = engine.encode_batch(mat)
    codes = jnp.asarray(codes_np)
    lens_dev = jnp.asarray(lens)
    hh = engine._heavy_hits(codes_np, lens)
    n_src = 0 if hh is None else int(hh[0].shape[0])
    print(f"heavy hit slots: {n_src}", flush=True)
    if hh is None:
        hh = (jnp.zeros(256, jnp.int32), jnp.zeros(256, jnp.int32))

    k = db.k
    nl = engine._nl
    space = 4 ** k
    light_pairs = engine.light_pairs
    D = engine.D
    thr = jnp.float32(db.thr_log10)
    E = D.shape[1]
    P = light_pairs.shape[1] // 2
    K = 7

    # -------- stage prefixes of finalize_postings_local -------------- #
    def rows_of(codes):
        kidx32 = kmer_rows(codes, k, 4, space + 1)
        return jnp.minimum(gather_rows(engine.rof_dev, kidx32), nl)

    @jax.jit
    def s0_rows(codes):
        return rows_of(codes)

    @jax.jit
    def s1_gather(codes):
        g = light_pairs[rows_of(codes)]
        return g.sum()

    @jax.jit
    def s2_sort(codes):
        lrows = rows_of(codes)
        g = light_pairs[lrows]
        Q = lrows.shape[1]
        e = g[:, :, :P].reshape(B, Q * P)
        d = jax.lax.bitcast_convert_type(
            g[:, :, P:], jnp.float32).reshape(B, Q * P)
        e_s, d_s = jax.lax.sort((e, d), num_keys=1)
        return e_s.sum() + d_s.sum()

    def seg_parts(codes):
        lrows = rows_of(codes)
        g = light_pairs[lrows]
        Q = lrows.shape[1]
        e = g[:, :, :P].reshape(B, Q * P)
        d = jax.lax.bitcast_convert_type(
            g[:, :, P:], jnp.float32).reshape(B, Q * P)
        e_s, d_s = jax.lax.sort((e, d), num_keys=1)
        cs = jnp.cumsum(d_s, axis=1)
        nxt = jnp.concatenate(
            [e_s[:, 1:], jnp.full((B, 1), -1, e_s.dtype)], axis=1)
        is_end = e_s != nxt
        is_start = jnp.concatenate(
            [jnp.ones((B, 1), bool), e_s[:, 1:] != e_s[:, :-1]], axis=1)
        prev_cs = jnp.concatenate(
            [jnp.zeros((B, 1), cs.dtype), cs[:, :-1]], axis=1)
        start_cs = jax.lax.cummax(
            jnp.where(is_start, prev_cs, -jnp.inf), axis=1)
        seg = cs - start_cs
        cnt = jnp.cumsum((d_s > 0).astype(jnp.float32), axis=1)
        prev_cnt = jnp.concatenate(
            [jnp.zeros((B, 1), cnt.dtype), cnt[:, :-1]], axis=1)
        start_cnt = jax.lax.cummax(
            jnp.where(is_start, prev_cnt, -jnp.inf), axis=1)
        light_valid = is_end & (cnt - start_cnt > 0)
        return e_s, seg, light_valid

    @jax.jit
    def s3_segsum(codes):
        e_s, seg, light_valid = seg_parts(codes)
        return seg.sum() + light_valid.sum()

    @jax.jit
    def s4_dense_at(codes, hrows, hreads):
        e_s, seg, light_valid = seg_parts(codes)
        dense_rows = gather_rows(D, hrows)
        e_loc = jnp.clip(e_s, 0, E - 1)
        e_sel = e_loc[hreads]
        vals = jnp.take_along_axis(dense_rows, e_sel, axis=1)
        dense_at = jnp.zeros(e_s.shape, jnp.float32).at[hreads].add(vals)
        return (seg + dense_at).sum() + light_valid.sum()

    @jax.jit
    def s5_topk_light(codes, hrows, hreads):
        e_s, seg, light_valid = seg_parts(codes)
        dense_rows = gather_rows(D, hrows)
        e_loc = jnp.clip(e_s, 0, E - 1)
        e_sel = e_loc[hreads]
        vals = jnp.take_along_axis(dense_rows, e_sel, axis=1)
        dense_at = jnp.zeros(e_s.shape, jnp.float32).at[hreads].add(vals)
        light_total = seg + dense_at
        l_scores, li = jax.lax.top_k(
            jnp.where(light_valid, light_total, -jnp.inf), K)
        l_edges = jnp.take_along_axis(e_s, li, axis=1)
        return l_scores.sum() + l_edges.sum()

    @jax.jit
    def s6_dense_acc_topk(hrows, hreads):
        dense_rows = gather_rows(D, hrows)
        dense_acc = jnp.zeros((B, E), jnp.float32).at[hreads].add(
            dense_rows)
        h_scores, h_edges = jax.lax.top_k(
            jnp.where(dense_acc > 0, dense_acc, -jnp.inf), K)
        return h_scores.sum() + h_edges.sum()

    from rappas_tpu.place.engine import finalize_postings

    @jax.jit
    def full(codes, hrows, hreads):
        lrows = rows_of(codes)
        dense_rows = gather_rows(D, hrows)
        return finalize_postings(light_pairs, lrows, dense_rows, hreads,
                                 lens_dev, thr, k, K, True)

    stages = [
        ("s0 kmer_rows + rof lookup", s0_rows, (codes,)),
        ("s1 + light_pairs gather", s1_gather, (codes,)),
        ("s2 + lax.sort pairs [B,QP]", s2_sort, (codes,)),
        ("s3 + cumsum/cummax segsum", s3_segsum, (codes,)),
        ("s4 + dense_at (lowrank)", s4_dense_at, (codes, hh[0], hh[1])),
        ("s5 + top_k light [B,QP]", s5_topk_light, (codes, hh[0], hh[1])),
        ("s6 dense_acc+topk [B,E] ALONE", s6_dense_acc_topk,
         (hh[0], hh[1])),
        ("full finalize_postings", full, (codes, hh[0], hh[1])),
    ]
    for name, fn, args in stages:
        dt = timed(fn, *args)
        print(f"{name:34s} {dt * 1e3:8.2f} ms   "
              f"{B / dt / 1e3:7.0f}k reads/s", flush=True)

    # -------- isolated alternatives ---------------------------------- #
    print("\n-- isolated pieces --", flush=True)
    QP = (L - k + 1) * P
    e_in = jnp.asarray(rng.integers(0, E, (B, QP)).astype(np.int32))
    d_in = jnp.asarray(rng.random((B, QP), np.float32))

    @jax.jit
    def sort_pair(e, d):
        e_s, d_s = jax.lax.sort((e, d), num_keys=1)
        return e_s.sum() + d_s.sum()

    @jax.jit
    def sort_single(e):
        return jax.lax.sort(e).sum()

    @jax.jit
    def topk_wide(x):
        s, i = jax.lax.top_k(x, K)
        return s.sum() + i.sum()

    dt = timed(sort_pair, e_in, d_in)
    print(f"lax.sort (int32 key + f32 payload) [B,{QP}]: "
          f"{dt * 1e3:.2f} ms", flush=True)
    dt = timed(sort_single, e_in)
    print(f"lax.sort (int32 only) [B,{QP}]: {dt * 1e3:.2f} ms",
          flush=True)
    for W in (256, 512, 1024):
        ew = e_in[:, :W]
        dw = d_in[:, :W]
        dt = timed(sort_pair, ew, dw)
        print(f"lax.sort pair [B,{W}]: {dt * 1e3:.2f} ms", flush=True)
    x_wide = jnp.asarray(rng.random((B, E), np.float32))
    dt = timed(topk_wide, x_wide)
    print(f"top_k(7) [B,{E}]: {dt * 1e3:.2f} ms", flush=True)
    x_qp = jnp.asarray(rng.random((B, QP), np.float32))
    dt = timed(topk_wide, x_qp)
    print(f"top_k(7) [B,{QP}]: {dt * 1e3:.2f} ms", flush=True)

    @jax.jit
    def cumsum_only(d):
        return jnp.cumsum(d, axis=1).sum()

    dt = timed(cumsum_only, d_in)
    print(f"cumsum [B,{QP}]: {dt * 1e3:.2f} ms", flush=True)

    @jax.jit
    def argsort_take(e, d):
        e_s, d_s = jax.lax.sort((e, d), num_keys=1)
        return d_s.sum()

    @jax.jit
    def scatter_acc(hrows, hreads):
        dense_rows = gather_rows(D, hrows)
        acc = jnp.zeros((B, E), jnp.float32).at[hreads].add(dense_rows)
        return acc.sum()

    dt = timed(scatter_acc, hh[0], hh[1])
    print(f"dense_acc scatter [B,{E}] + sum: {dt * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
