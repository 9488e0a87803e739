"""Follow-up probes for the postings-mode redesign.

probe 1 established (B=4096, k=12, 2M light kmers, E=7999):
  s0 kmer_rows + rof gather   8.8 ms   (host already computes this!)
  light_pairs gather         15.7 ms   (27 ns/row at 2M-row table)
  lax.sort pairs              3.1 ms
  cumsum/segsum machinery    ~0
Open questions this probe answers:
  1. gather ns/row vs table HEIGHT (is there a fast path <= 65k rows?)
  2. two-stage dedup gather: big-table gather of U unique rows into a
     compact table, then window gather from the compact table
  3. top_k(7) over [B, E] and [B, QP]; dense_acc scatter; dense_at
  4. full finalize_postings at B = 4096 / 8192 / 16384
"""

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
    rng = np.random.default_rng(0)
    B, Q, P = 4096, 139, 8
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- 1. height sweep: [H, 16] int32 table, gather B*Q rows ------ #
    print("\n-- gather ns/row vs table height (16-int32 rows) --",
          flush=True)

    @jax.jit
    def gsum(T, rows):
        return T[rows].sum()

    for H in (16_384, 65_536, 131_072, 262_144, 524_288, 1_048_576,
              2_097_152, 4_194_304):
        T = jnp.asarray(rng.integers(0, 100, (H, 16)).astype(np.int32))
        rows = jnp.asarray(rng.integers(0, H, (B, Q)).astype(np.int32))
        dt = timed(gsum, T, rows)
        print(f"H={H:8d}: {dt * 1e3:7.2f} ms  "
              f"{dt / (B * Q) * 1e9:6.2f} ns/row", flush=True)

    # ---- 2. two-stage dedup gather ---------------------------------- #
    print("\n-- two-stage: gather U rows from 2M table -> compact, then "
          "[B,Q] from compact --", flush=True)
    H = 2_097_152
    T = jnp.asarray(rng.integers(0, 100, (H, 16)).astype(np.int32))
    for U in (32_768, 65_536, 131_072, 262_144, 524_288):
        urows = jnp.asarray(rng.integers(0, H, (U,)).astype(np.int32))
        inv = jnp.asarray(rng.integers(0, U, (B, Q)).astype(np.int32))

        @jax.jit
        def two_stage(T, urows, inv):
            compact = T[urows]            # [U, 16]
            return compact[inv].sum()

        dt = timed(two_stage, T, urows, inv)
        print(f"U={U:7d}: {dt * 1e3:7.2f} ms  (vs direct "
              f"{(B * Q) * 27e-9 * 1e3:.2f} ms at 27 ns/row)", flush=True)

    # ---- 3. dense-side pieces --------------------------------------- #
    print("\n-- dense-side pieces (E=7999) --", flush=True)
    E, K = 7999, 7
    n_src = 512
    QP = Q * P

    x_wide = jnp.asarray(rng.random((B, E), np.float32))

    @jax.jit
    def topk_wide(x):
        s, i = jax.lax.top_k(x, K)
        return s.sum() + i.sum()

    dt = timed(topk_wide, x_wide)
    print(f"top_k(7) [B,{E}]: {dt * 1e3:.2f} ms", flush=True)

    x_qp = jnp.asarray(rng.random((B, QP), np.float32))
    dt = timed(topk_wide, x_qp)
    print(f"top_k(7) [B,{QP}]: {dt * 1e3:.2f} ms", flush=True)

    dense_rows = jnp.asarray(rng.random((n_src, E), np.float32))
    dense_reads = jnp.asarray(np.sort(rng.integers(0, B, n_src))
                              .astype(np.int32))

    @jax.jit
    def scatter_acc(dr, di):
        return jnp.zeros((B, E), jnp.float32).at[di].add(dr).sum()

    dt = timed(scatter_acc, dense_rows, dense_reads)
    print(f"dense_acc scatter [{n_src}]->[B,{E}] + sum: {dt * 1e3:.2f} ms",
          flush=True)

    e_s = jnp.asarray(rng.integers(0, E, (B, QP)).astype(np.int32))

    @jax.jit
    def dense_at_lowrank(dr, di, e_s):
        e_sel = e_s[di]                               # [n_src, QP]
        vals = jnp.take_along_axis(dr, e_sel, axis=1)
        return jnp.zeros(e_s.shape, jnp.float32).at[di].add(vals).sum()

    dt = timed(dense_at_lowrank, dense_rows, dense_reads, e_s)
    print(f"dense_at lowrank ({n_src} x {QP} scalar gathers): "
          f"{dt * 1e3:.2f} ms", flush=True)

    # sort width sweep
    print("\n-- pair-sort width sweep --", flush=True)
    d_in = jnp.asarray(rng.random((B, QP), np.float32))

    @jax.jit
    def sort_pair(e, d):
        e_s, d_s = jax.lax.sort((e, d), num_keys=1)
        return e_s.sum() + d_s.sum()

    for W in (256, 512, 768, QP):
        dt = timed(sort_pair, e_s[:, :W], d_in[:, :W])
        print(f"W={W:5d}: {dt * 1e3:7.2f} ms", flush=True)

    # ---- 4. full step B scaling ------------------------------------- #
    print("\n-- full finalize_postings B scaling --", flush=True)
    from scale_check import build_large_db
    from rappas_tpu.place.engine import (PlacementEngine, finalize_postings,
                                         gather_rows)

    db = build_large_db()
    engine = PlacementEngine(db, table="postings")
    letters = np.frombuffer(b"ACGT", np.uint8)
    for Bx in (4096, 8192, 16384):
        mat = letters[rng.integers(0, 4, (Bx, 150))]
        lens = np.full(Bx, 150, np.int32)
        codes_np = engine.encode_batch(mat)
        hh = engine._heavy_hits(codes_np, lens)
        if hh is None:
            hh = (jnp.zeros(256, jnp.int32), jnp.zeros(256, jnp.int32))
        kidx = engine._host_kmer_indices(codes_np, lens)
        space = 4 ** db.k
        rof = engine._rof_np[np.where(kidx >= 0, kidx, space)]
        lrows_np = np.minimum(rof, engine._nl).astype(np.int32)
        lrows = jnp.asarray(lrows_np)
        lens_dev = jnp.asarray(lens)

        @jax.jit
        def step(light_pairs, D, lrows, lengths, hrows, hreads):
            dense_rows = gather_rows(D, hrows)
            return finalize_postings(light_pairs, lrows, dense_rows,
                                     hreads, lengths,
                                     jnp.float32(db.thr_log10),
                                     db.k, 7, True)

        dt = timed(step, engine.light_pairs, engine.D, lrows, lens_dev,
                   hh[0], hh[1], n=10)
        print(f"B={Bx:6d}: {dt * 1e3:7.2f} ms  "
              f"{Bx / dt / 1e3:6.0f}k reads/s (host-lrows variant)",
              flush=True)


if __name__ == "__main__":
    main()
