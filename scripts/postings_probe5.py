"""Candidate redesigns of the split-light-table gather (postings mode).

probe4 findings (k=12, 2.01M k-mers, B=4096, hit-compacted to 32
windows/read = 131k fetches):

* single 64 MB part alone gathers at ~3 ns/row (fast path),
* the unsplit 128 MB table at ~23 ns/row (slow path, 3.8 ms),
* but the CURRENT split design (gather BOTH parts + select) measures
  5.2 ms -- alternating two parts in one program defeats whatever
  staging makes a lone part fast, so the split is now a pessimization
  under hit compaction.

Candidates measured here on the same captured workload:

  V1 current: both-parts gather + select
  V2 part-routed two-stage: host unique (sorted) -> prefix split at H1,
     compact = concat(T1[u1], T2[u2 - H1]); windows re-gather compact
  V3 unsplit two-stage: T_full[uniq] at the slow rate, windows
     re-gather compact
  V4 unsplit direct (reference cell)

Run on the real chip: `python scripts/postings_probe5.py`.
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


def timed(fn, *args, n=50):
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
    from rappas_tpu.place.engine import (PlacementEngine,
                                         _fast_unique_inverse, _pow2,
                                         light_gather)

    db = build_large_db()
    engine = PlacementEngine(db, table="auto")
    print(f"device: {jax.devices()[0]}", flush=True)

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
    import inspect
    fn0 = getattr(orig, "__wrapped__", orig)
    bound = inspect.signature(fn0).bind(*calls[-1][0], **calls[-1][1])
    bound.apply_defaults()
    d = bound.arguments
    light_parts, lrows = d["light_parts"], d["lrows"]
    T1, T2 = light_parts
    H1 = T1.shape[0]
    lrows_np = np.asarray(lrows)
    print(f"windows {lrows_np.shape}, H1={H1}", flush=True)

    # host prep for the two-stage variants (this cost runs on the host
    # pipeline, overlapped with the device; report it separately)
    t0 = time.perf_counter()
    uniq, inv = _fast_unique_inverse(lrows_np.ravel())
    n1 = int(np.searchsorted(uniq, H1))
    U1, U2 = _pow2(max(n1, 1)), _pow2(max(uniq.size - n1, 1))
    u1 = np.zeros(U1, np.int32)
    u1[:n1] = uniq[:n1]
    u2 = np.zeros(U2, np.int32)
    u2[:uniq.size - n1] = uniq[n1:] - H1
    inv_routed = np.where(inv < n1, inv, U1 + (inv - n1)) \
        .reshape(lrows_np.shape).astype(np.int32)
    t_host = time.perf_counter() - t0
    print(f"uniq={uniq.size} (part0 {n1}), host prep {t_host * 1e3:.1f} ms",
          flush=True)

    u1_d = jnp.asarray(u1)
    u2_d = jnp.asarray(u2)
    inv_d = jnp.asarray(inv_routed)
    uniq_pad = np.zeros(_pow2(uniq.size), np.int32)
    uniq_pad[:uniq.size] = uniq
    uniq_d = jnp.asarray(uniq_pad)
    inv_plain = jnp.asarray(inv.reshape(lrows_np.shape).astype(np.int32))

    # V1 current
    @jax.jit
    def v1(T1, T2, lr):
        return light_gather((T1, T2), lr)
    g_ref = np.asarray(v1(T1, T2, lrows))
    dt = timed(v1, T1, T2, lrows)
    print(f"V1 both-parts + select      : {dt * 1e3:7.2f} ms", flush=True)

    # V2 part-routed two-stage
    @jax.jit
    def v2(T1, T2, u1, u2, inv):
        compact = jnp.concatenate([T1[u1], T2[u2]], axis=0)
        return compact[inv]
    g2 = np.asarray(v2(T1, T2, u1_d, u2_d, inv_d))
    print(f"V2 exact == V1: {(g2 == g_ref).all()}", flush=True)
    dt = timed(v2, T1, T2, u1_d, u2_d, inv_d)
    print(f"V2 part-routed two-stage    : {dt * 1e3:7.2f} ms", flush=True)

    # V3 unsplit two-stage
    T_full = jnp.concatenate([T1, T2], axis=0)

    @jax.jit
    def v3(Tf, u, inv):
        compact = Tf[u]
        return compact[inv]
    g3 = np.asarray(v3(T_full, uniq_d, inv_plain))
    print(f"V3 exact == V1: {(g3 == g_ref).all()}", flush=True)
    dt = timed(v3, T_full, uniq_d, inv_plain)
    print(f"V3 unsplit two-stage        : {dt * 1e3:7.2f} ms", flush=True)

    # V4 unsplit direct
    @jax.jit
    def v4(Tf, lr):
        return Tf[lr]
    dt = timed(v4, T_full, lrows)
    print(f"V4 unsplit direct           : {dt * 1e3:7.2f} ms", flush=True)

    # V2b: how does the compact re-gather alone cost?
    compact_d = v2(T1, T2, u1_d, u2_d, inv_d * 0)  # warm shapes

    @jax.jit
    def stage2_only(compact, inv):
        return compact[inv]
    comp = jnp.concatenate([T1[u1_d], T2[u2_d]], axis=0)
    dt = timed(stage2_only, comp, inv_d)
    print(f"  stage 2 alone (compact[inv]) : {dt * 1e3:7.2f} ms",
          flush=True)

    @jax.jit
    def stage1_only(T1, T2, u1, u2):
        return jnp.concatenate([T1[u1], T2[u2]], axis=0)
    dt = timed(stage1_only, T1, T2, u1_d, u2_d)
    print(f"  stage 1 alone (unique fetch) : {dt * 1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
