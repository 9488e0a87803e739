"""Microbenchmarks for candidate device scoring primitives (run on the
real chip).  Not part of the test suite -- a design tool for picking the
placement kernel formulation (see docs/PERF.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, Q, E = 16384, 144, 304
P = 8
N_ROWS = 65537
J = Q * P

rng = np.random.default_rng(0)
rows_np = rng.integers(0, N_ROWS, (B, Q)).astype(np.int32)


# Timing on the tunneled dev chip is subtle: block_until_ready returns
# before execution finishes on this platform, while np.asarray of a full
# output rides a ~30 MB/s link.  So: dispatch n executions (each call is
# enqueued on the device), then synchronise by fetching a 4-byte scalar
# derived from the last output; the one ~140 ms fetch overhead is
# amortised over n and subtracted via the measured null-loop cost.
_scalar = jax.jit(
    lambda o: sum(x.ravel()[:1].astype(jnp.float32).sum()
                  for x in jax.tree_util.tree_leaves(o)))

_null_dt = None


def _measure(fn, *args, n=30):
    out = fn(*args)
    np.float32(_scalar(out))  # warmup: compile + first-fetch handshake
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.float32(_scalar(out))
    return (time.time() - t0) / n


def timeit(name, fn, *args, n=30):
    global _null_dt
    if _null_dt is None:
        ident = jax.jit(lambda x: x)
        _null_dt = _measure(ident, jnp.zeros(8, jnp.float32), n=n)
    dt = max(_measure(fn, *args, n=n) - _null_dt, 1e-9)
    print(f"{name:42s} {dt*1e3:8.2f} ms  {B/dt/1e6:8.2f} M reads/s",
          flush=True)
    return dt


# 1. current: dense f32 row gather + sum
D = jax.device_put(rng.random((N_ROWS, E), np.float32))
rows = jax.device_put(rows_np)


@jax.jit
def dense_f32(D, rows):
    def step(acc, r):
        return acc + D[r].sum(axis=1), None
    rt = rows.reshape(B, Q // 16, 16).transpose(1, 0, 2)
    acc, _ = jax.lax.scan(step, jnp.zeros((B, E), jnp.float32), rt)
    return acc


timeit("dense f32 gather+sum (current)", dense_f32, D, rows)

# 2. u16 packed as int32 (half the row bytes), unpack + sum
D32 = jax.device_put(
    rng.integers(0, 2**31 - 1, (N_ROWS, E // 2)).astype(np.int32))


@jax.jit
def dense_u16_packed(D32, rows):
    def step(acc, r):
        g = D32[r]                     # [B, 16, E/2] int32
        lo = (g & 0xFFFF).astype(jnp.float32)
        hi = ((g >> 16) & 0xFFFF).astype(jnp.float32)
        return acc + jnp.concatenate([lo, hi], -1).sum(axis=1), None
    rt = rows.reshape(B, Q // 16, 16).transpose(1, 0, 2)
    acc, _ = jax.lax.scan(step, jnp.zeros((B, E), jnp.float32), rt)
    return acc


timeit("dense u16-in-int32 gather+sum", dense_u16_packed, D32, rows)

# 3. postings gather [N_ROWS, P] int32
POST = jax.device_put(
    rng.integers(0, 2**31 - 1, (N_ROWS, P)).astype(np.int32))


@jax.jit
def postings_gather(POST, rows):
    return POST[rows].reshape(B, J)


timeit("postings gather (32B rows)", postings_gather, POST, rows)

# 4. per-read sort of [B, J] int32
flat = jax.device_put(rng.integers(0, 2**31 - 1, (B, J)).astype(np.int32))


@jax.jit
def sort_rows(x):
    return jax.lax.sort(x, dimension=-1)


timeit("sort [B, 1152] int32", sort_rows, flat)

# 5. cumsum + boundary + top_k over [B, J]
vals = jax.device_put(rng.random((B, J), np.float32))
edges = jax.device_put(np.sort(rng.integers(0, E, (B, J)), -1)
                       .astype(np.int32))


@jax.jit
def segsum_topk(edges, vals):
    cs = jnp.cumsum(vals, axis=-1)
    nxt = jnp.concatenate([edges[:, 1:], jnp.full((B, 1), -1, jnp.int32)],
                          -1)
    is_end = edges != nxt
    prev_cs = jnp.concatenate([jnp.zeros((B, 1)), cs[:, :-1]], -1)
    # segment sum at end positions = cs - cs at previous segment end;
    # propagate previous-end cs via another cummax trick
    seg_start_cs = jnp.where(
        jnp.concatenate([jnp.ones((B, 1), bool),
                         edges[:, 1:] != edges[:, :-1]], -1),
        prev_cs, -jnp.inf)
    seg_start_cs = jax.lax.cummax(seg_start_cs, axis=1)
    seg = jnp.where(is_end, cs - seg_start_cs, -jnp.inf)
    return jax.lax.top_k(seg, 7)


timeit("cumsum+boundaries+top7 [B, 1152]", segsum_topk, edges, vals)

# 6. full postings pipeline: gather packed -> sort -> unpack -> segsum
@jax.jit
def postings_full(POST, rows):
    packed = POST[rows].reshape(B, J)
    s = jax.lax.sort(packed, dimension=-1)
    e = (s >> 16) & 0x7FFF
    v = (s & 0xFFFF).astype(jnp.float32) * np.float32(1e-4)
    cs = jnp.cumsum(v, axis=-1)
    nxt = jnp.concatenate([e[:, 1:], jnp.full((B, 1), -1, jnp.int32)], -1)
    is_end = e != nxt
    prev_cs = jnp.concatenate([jnp.zeros((B, 1)), cs[:, :-1]], -1)
    seg_start_cs = jnp.where(
        jnp.concatenate([jnp.ones((B, 1), bool), e[:, 1:] != e[:, :-1]],
                        -1), prev_cs, -jnp.inf)
    seg_start_cs = jax.lax.cummax(seg_start_cs, axis=1)
    seg = jnp.where(is_end, cs - seg_start_cs, -jnp.inf)
    return jax.lax.top_k(seg, 7)


timeit("postings gather+sort+segsum+top7", postings_full, POST, rows)

# 7. top_k over dense [B, E] (current finalize cost, for reference)
acc = jax.device_put(rng.random((B, E), np.float32))
timeit("top7 over dense [B, 304]",
       jax.jit(lambda a: jax.lax.top_k(a, 7)), acc)
