"""Stage breakdown of the round-3 postings device step (634k reads/s).

Captures the REAL jit inputs of finalize_postings_v2 from the
scale_check workload (k=12, 2.01M k-mers, 9.1M postings, E=7999,
B=4096), then times stage-ablated variants to find where the 6.46 ms
goes: gather, sort, segment cumsums, dense_at, top-k+dedup.

Run on the real chip: `python scripts/postings_probe4.py`.
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
    from scale_check import build_large_db

    import rappas_tpu.place.engine as eng
    from rappas_tpu.place.engine import PlacementEngine, light_gather

    db = build_large_db()
    engine = PlacementEngine(db, table="auto")
    print(f"device: {jax.devices()[0]}, table={engine.table}", flush=True)

    B, L = 4096, 150
    rng = np.random.default_rng(1)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    lens = np.full(B, L, np.int32)
    codes_np = engine.encode_batch(mat)

    calls = []
    orig = eng.finalize_postings_v2

    def capture(*a, **kw):
        calls.append((a, kw))
        return orig(*a, **kw)

    eng.finalize_postings_v2 = capture
    try:
        engine._score_postings(codes_np, mat, lens).result()
    finally:
        eng.finalize_postings_v2 = orig
    (a, kw) = calls[-1]
    import inspect
    fn = getattr(orig, "__wrapped__", orig)
    bound = inspect.signature(fn).bind(*a, **kw)
    bound.apply_defaults()
    d = bound.arguments
    light_parts, lrows, uniq_rows = (d["light_parts"], d["lrows"],
                                     d["uniq_rows"])
    dense_rows, dense_reads = d["dense_rows"], d["dense_reads"]
    dense_slots, slot_read = d["dense_slots"], d["slot_read"]
    lengths, thr = d["lengths"], d["thr"]
    k, keep_at_most = d["k"], d["keep_at_most"]
    print(f"shapes: lrows={lrows.shape} uniq={None if uniq_rows is None else uniq_rows.shape} "
          f"dense_rows={dense_rows.shape} parts={[p.shape for p in light_parts]}",
          flush=True)

    Bq, Q = lrows.shape
    P = light_parts[0].shape[1] // 2
    E = dense_rows.shape[1]

    # ---- full step (reference point) -------------------------------- #
    def full():
        return orig(light_parts, lrows, uniq_rows, dense_rows,
                    dense_reads, dense_slots, slot_read, lengths, thr,
                    k, keep_at_most)
    dt_full = timed(full)
    print(f"full step           : {dt_full * 1e3:7.2f} ms  "
          f"{Bq / dt_full / 1e3:5.0f}k reads/s", flush=True)

    # ---- stage A: gather, materialized ------------------------------- #
    @jax.jit
    def gather_mat(light_parts, lrows, uniq_rows):
        if uniq_rows is not None:
            compact = light_gather(light_parts, uniq_rows)
            return compact[lrows]
        return light_gather(light_parts, lrows)
    g_dev = gather_mat(light_parts, lrows, uniq_rows)
    dt_g = timed(gather_mat, light_parts, lrows, uniq_rows)
    print(f"A gather (materialized [B,{Q},{2 * P}]): {dt_g * 1e3:7.2f} ms",
          flush=True)

    # ---- downstream stages, g as input -------------------------------- #
    def unpack(g):
        e = g[:, :, :P].reshape(Bq, Q * P)
        d = jax.lax.bitcast_convert_type(
            g[:, :, P:], jnp.float32).reshape(Bq, Q * P)
        return e, d

    def segments(e_s, d_s):
        cs = jnp.cumsum(d_s, axis=1)
        nxt = jnp.concatenate(
            [e_s[:, 1:], jnp.full((Bq, 1), -1, e_s.dtype)], axis=1)
        is_end = e_s != nxt
        is_start = jnp.concatenate(
            [jnp.ones((Bq, 1), bool), e_s[:, 1:] != e_s[:, :-1]], axis=1)
        prev_cs = jnp.concatenate(
            [jnp.zeros((Bq, 1), cs.dtype), cs[:, :-1]], axis=1)
        start_cs = jax.lax.cummax(
            jnp.where(is_start, prev_cs, -jnp.inf), axis=1)
        seg = cs - start_cs
        cnt = jnp.cumsum((d_s > 0).astype(jnp.float32), axis=1)
        prev_cnt = jnp.concatenate(
            [jnp.zeros((Bq, 1), cnt.dtype), cnt[:, :-1]], axis=1)
        start_cnt = jax.lax.cummax(
            jnp.where(is_start, prev_cnt, -jnp.inf), axis=1)
        light_valid = is_end & (cnt - start_cnt > 0)
        return seg, light_valid

    @jax.jit
    def down_sort(g):
        e, d = unpack(g)
        e_s, d_s = jax.lax.sort((e, d), num_keys=1)
        return e_s.sum() + d_s.sum()
    dt = timed(down_sort, g_dev)
    print(f"B unpack+sort only                  : {dt * 1e3:7.2f} ms",
          flush=True)

    @jax.jit
    def down_segments(g):
        e, d = unpack(g)
        e_s, d_s = jax.lax.sort((e, d), num_keys=1)
        seg, lv = segments(e_s, d_s)
        return seg.sum() + lv.sum()
    dt = timed(down_segments, g_dev)
    print(f"C unpack+sort+segments              : {dt * 1e3:7.2f} ms",
          flush=True)

    n_slots = slot_read.shape[0]

    @jax.jit
    def dense_side_only(dense_rows, dense_reads, dense_slots, slot_read,
                        e_s):
        K = keep_at_most
        acc_c = jnp.zeros((n_slots + 1, E), jnp.float32).at[
            dense_slots].add(dense_rows)
        e_sel = jnp.clip(e_s, 0, E - 1)[dense_reads]
        vals = jnp.take_along_axis(dense_rows, e_sel, axis=1)
        dense_at = jnp.zeros(e_s.shape, jnp.float32).at[
            dense_reads].add(vals)
        hs, he = jax.lax.top_k(
            jnp.where(acc_c[:n_slots] > 0, acc_c[:n_slots], -jnp.inf), K)
        return dense_at.sum() + hs.sum() + he.sum()

    @jax.jit
    def sorted_e(g):
        e, d = unpack(g)
        e_s, _ = jax.lax.sort((e, d), num_keys=1)
        return e_s
    e_s_dev = sorted_e(g_dev)
    dt = timed(dense_side_only, dense_rows, dense_reads, dense_slots,
               slot_read, e_s_dev)
    print(f"D dense side (acc_c+dense_at+top-k) : {dt * 1e3:7.2f} ms",
          flush=True)

    @jax.jit
    def dense_at_only(dense_rows, dense_reads, e_s):
        e_sel = jnp.clip(e_s, 0, E - 1)[dense_reads]
        vals = jnp.take_along_axis(dense_rows, e_sel, axis=1)
        return jnp.zeros(e_s.shape, jnp.float32).at[
            dense_reads].add(vals).sum()
    dt = timed(dense_at_only, dense_rows, dense_reads, e_s_dev)
    print(f"D1  dense_at (take_along+scatter)   : {dt * 1e3:7.2f} ms",
          flush=True)

    @jax.jit
    def topk_c_only(dense_rows, dense_slots):
        K = keep_at_most
        acc_c = jnp.zeros((n_slots + 1, E), jnp.float32).at[
            dense_slots].add(dense_rows)
        hs, he = jax.lax.top_k(
            jnp.where(acc_c[:n_slots] > 0, acc_c[:n_slots], -jnp.inf), K)
        return hs.sum() + he.sum()
    dt = timed(topk_c_only, dense_rows, dense_slots)
    print(f"D2  acc_c scatter + top-k           : {dt * 1e3:7.2f} ms",
          flush=True)

    # light top-k + candidate merge + LWR tail, approximated: full
    # downstream minus the pieces above
    @jax.jit
    def downstream_full(g, dense_rows, dense_reads, dense_slots,
                        slot_read, lengths):
        from rappas_tpu.place.engine import finalize_postings_local
        return finalize_postings_local(
            None, jnp.zeros((Bq, 1), jnp.int32), dense_rows, dense_reads,
            lengths, thr, jnp.int32(0), k, keep_at_most, True,
            light_parts=(g.reshape(-1, 2 * P),), uniq_rows=None,
            dense_slots=dense_slots, slot_read=slot_read)
    # (not directly comparable; skip)

    # ---- why is the split gather at ~23 ns/row? ----------------------- #
    print(f"arg residency: lrows={type(lrows).__name__} "
          f"parts0={type(light_parts[0]).__name__}", flush=True)

    @jax.jit
    def nop(lrows):
        return lrows[0, 0]
    dt = timed(nop, lrows, n=50)
    print(f"dispatch floor (no-op jit)          : {dt * 1e3:7.2f} ms",
          flush=True)

    T1 = light_parts[0]
    H1 = T1.shape[0]
    lr_clip = jnp.asarray(np.minimum(np.asarray(lrows), H1 - 1))

    @jax.jit
    def one_part(T1, lr):
        return T1[lr]
    dt = timed(one_part, T1, lr_clip, n=50)
    print(f"single-part gather [1M,16] x 131k   : {dt * 1e3:7.2f} ms  "
          f"({dt / lr_clip.size * 1e9:5.1f} ns/row)", flush=True)

    @jax.jit
    def one_part_4s(T1, lr):
        h = Bq // 4
        return tuple(T1[lr[i * h:(i + 1) * h]] for i in range(4))
    dt = timed(one_part_4s, T1, lr_clip, n=50)
    print(f"single-part gather, 4 streams       : {dt * 1e3:7.2f} ms",
          flush=True)

    # unsplit table at full height (what the split replaced)
    T_full = jnp.concatenate([light_parts[0], light_parts[1]], axis=0)

    @jax.jit
    def unsplit(Tf, lr):
        return Tf[lr]
    dt = timed(unsplit, T_full, lrows, n=50)
    print(f"unsplit gather [2M,16] x 131k       : {dt * 1e3:7.2f} ms  "
          f"({dt / lrows.size * 1e9:5.1f} ns/row)", flush=True)

    # split without the select: two clipped gathers, add (wrong result,
    # isolates the where() cost)
    T2 = light_parts[1]

    @jax.jit
    def split_no_select(T1, T2, lr):
        g1 = T1[jnp.minimum(lr, H1 - 1)]
        g2 = T2[jnp.clip(lr - H1, 0, T2.shape[0] - 1)]
        return g1, g2
    dt = timed(split_no_select, T1, T2, lrows, n=50)
    print(f"split, no select (2 gathers)        : {dt * 1e3:7.2f} ms",
          flush=True)

    dt = timed(gather_mat, light_parts, lrows, uniq_rows, n=50)
    print(f"split + select (light_gather), n=50 : {dt * 1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
