"""Probe the two risky pieces of the postings-engine redesign.

1. 48 B packed light rows (u16 edge pairs + f32 deltas as 12 int32
   lanes): does the 2M-row table drop under the ~128 MB VMEM-staging
   cliff and gather at ~6 ns/row?
2. dense_at via one-hot f32 MXU matmul instead of n_src*QP scalar
   gathers: is it bit-exact vs take_along_axis, and how fast?
3. dense-side compaction: scatter+top_k over [n_dense, E] instead of
   [B, E].
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
    E = 7999
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- 1. packed 48B rows ----------------------------------------- #
    print("\n-- 48B packed rows (4 int32 edge-pairs + 8 f32 deltas) --",
          flush=True)
    H = 2_097_152
    edges = rng.integers(0, E, (H, P)).astype(np.uint32)
    deltas = rng.random((H, P), np.float32)
    ep = (edges[:, 0::2] | (edges[:, 1::2] << 16)).astype(np.uint32)
    packed = np.concatenate([ep.view(np.int32),
                             deltas.view(np.int32)], axis=1)  # [H, 12]
    print(f"table: {packed.nbytes / 1e6:.1f} MB", flush=True)
    Tp = jnp.asarray(packed)
    rows = jnp.asarray(rng.integers(0, H, (B, Q)).astype(np.int32))

    @jax.jit
    def gather_packed(Tp, rows):
        g = Tp[rows]                                   # [B, Q, 12]
        ep = g[:, :, :4]
        lo = ep & 0xFFFF
        hi = (ep >> 16) & 0xFFFF
        e = jnp.stack([lo, hi], axis=-1).reshape(B, Q, P)
        d = jax.lax.bitcast_convert_type(g[:, :, 4:], jnp.float32)
        return e.sum() + d.sum()

    dt = timed(gather_packed, Tp, rows)
    print(f"packed gather+unpack: {dt * 1e3:7.2f} ms  "
          f"{dt / (B * Q) * 1e9:5.2f} ns/row", flush=True)

    # correctness of the unpack
    g = np.asarray(Tp[rows[:2, :3]])
    ep2 = g[:, :, :4].view(np.uint32)
    e_lo = ep2 & 0xFFFF
    e_hi = ep2 >> 16
    e_chk = np.stack([e_lo, e_hi], axis=-1).reshape(2, 3, P)
    r = np.asarray(rows[:2, :3])
    assert (e_chk == edges[r]).all()
    assert (g[:, :, 4:].view(np.float32) == deltas[r]).all()
    print("unpack exact: ok", flush=True)

    # 64B baseline for the same workload
    T64 = jnp.asarray(np.concatenate(
        [edges.astype(np.int32), deltas.view(np.int32)], axis=1))

    @jax.jit
    def gather64(T, rows):
        g = T[rows]
        return g.sum()

    dt = timed(gather64, T64, rows)
    print(f"64B-row gather      : {dt * 1e3:7.2f} ms  "
          f"{dt / (B * Q) * 1e9:5.2f} ns/row  "
          f"({T64.nbytes / 1e6:.0f} MB)", flush=True)

    # ---- 2. one-hot matmul dense_at --------------------------------- #
    print("\n-- dense_at: one-hot f32 matmul vs take_along_axis --",
          flush=True)
    n_src = 512
    QP = Q * P
    dense_rows = jnp.asarray((rng.random((n_src, E), np.float32) *
                              7.3).astype(np.float32))
    e_sel = jnp.asarray(rng.integers(0, E, (n_src, QP)).astype(np.int32))

    @jax.jit
    def taa(dr, es):
        return jnp.take_along_axis(dr, es, axis=1)

    @jax.jit
    def onehot_mm(dr, es):
        # [n_src, QP] out; contract over E in blocks to bound VMEM
        oh = jax.nn.one_hot(es, E, dtype=jnp.float32)   # [n_src, QP, E]
        return jnp.einsum("sje,se->sj", oh, dr,
                          preferred_element_type=jnp.float32)

    v1 = np.asarray(taa(dense_rows, e_sel))
    v2 = np.asarray(onehot_mm(dense_rows, e_sel))
    exact = (v1 == v2).all()
    print(f"one-hot matmul bit-exact vs take_along: {exact} "
          f"(max |diff| {np.abs(v1 - v2).max():.2e})", flush=True)
    dt = timed(taa, dense_rows, e_sel)
    print(f"take_along_axis [{n_src},{QP}]: {dt * 1e3:7.2f} ms",
          flush=True)
    dt = timed(onehot_mm, dense_rows, e_sel)
    print(f"one-hot matmul  [{n_src},{QP}]: {dt * 1e3:7.2f} ms",
          flush=True)

    # ---- 3. compact dense side -------------------------------------- #
    print("\n-- dense side: compact [n_dense, E] vs full [B, E] --",
          flush=True)
    K = 7
    dense_reads = jnp.asarray(np.sort(rng.integers(0, B, n_src))
                              .astype(np.int32))

    @jax.jit
    def full_side(dr, di):
        acc = jnp.zeros((B, E), jnp.float32).at[di].add(dr)
        s, i = jax.lax.top_k(jnp.where(acc > 0, acc, -jnp.inf), K)
        return s.sum() + i.sum()

    @jax.jit
    def compact_side(dr, slot):
        # slot[i] in [0, n_src): compact read slot per source row
        acc = jnp.zeros((n_src, E), jnp.float32).at[slot].add(dr)
        s, i = jax.lax.top_k(jnp.where(acc > 0, acc, -jnp.inf), K)
        return s.sum() + i.sum()

    slots = jnp.asarray(np.arange(n_src, dtype=np.int32))
    dt = timed(full_side, dense_rows, dense_reads)
    print(f"full [B={B},E]: {dt * 1e3:7.2f} ms", flush=True)
    dt = timed(compact_side, dense_rows, slots)
    print(f"compact [{n_src},E]: {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
