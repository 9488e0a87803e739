"""A/B the FULL postings device step: part-routed two-stage gather vs
the round-3 both-parts+select design, in ONE process (same tunnel
state), on the captured real workload.

probe5 showed the two-stage gather alone is 1.7x faster (3.06 vs
5.21 ms), but scale_check measured the full step SLOWER (8.2 vs
6.5 ms) -- either tunnel drift or the two-stage's serial dependency
(stage 2 needs stage 1) breaking the gather/compute overlap XLA had.

Run on the real chip: `python scripts/postings_probe6.py`.
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


def timed(fn, *args, n=40):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = fn(*args)
    _force(outs)
    return (time.perf_counter() - t0) / n


def capture_step(engine, codes_np, mat, lens):
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


def main():
    from scale_check import build_large_db

    from rappas_tpu.place.engine import PlacementEngine

    db = build_large_db()
    print(f"device: {jax.devices()[0]}", flush=True)

    B, L = 4096, 150
    rng = np.random.default_rng(1)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    lens = np.full(B, L, np.int32)

    # engine A: current code (part-routed two-stage engages)
    eng_a = PlacementEngine(db, table="postings")
    codes_np = eng_a.encode_batch(mat)
    (a_args, a_kw), orig = capture_step(eng_a, codes_np, mat, lens)
    uniq = a_args[2] if len(a_args) > 2 else a_kw.get("uniq_rows")
    print(f"A two-stage engaged: {uniq is not None} "
          f"(tuple: {isinstance(uniq, tuple)})", flush=True)

    def run_a():
        return orig(*a_args, **a_kw)
    res_a = run_a()

    # engine B: two-stage disabled -> both-parts + select
    PlacementEngine.TWO_STAGE_MAX_UNIQUE = 0
    eng_b = PlacementEngine(db, table="postings")
    (b_args, b_kw), _ = capture_step(eng_b, codes_np, mat, lens)
    uniq_b = b_args[2] if len(b_args) > 2 else b_kw.get("uniq_rows")
    print(f"B two-stage engaged: {uniq_b is not None}", flush=True)

    def run_b():
        return orig(*b_args, **b_kw)
    res_b = run_b()

    for x, y in zip(res_a, res_b):
        assert np.array_equal(np.asarray(x), np.asarray(y)), "mismatch!"
    print("A == B bit-exact", flush=True)

    # interleaved timing, 3 rounds each, report per round (exposes
    # tunnel drift)
    for r in range(3):
        da = timed(run_a)
        db_ = timed(run_b)
        print(f"round {r}: A two-stage {da * 1e3:6.2f} ms "
              f"({B / da / 1e3:4.0f}k r/s)   "
              f"B both-parts {db_ * 1e3:6.2f} ms "
              f"({B / db_ / 1e3:4.0f}k r/s)", flush=True)


if __name__ == "__main__":
    main()
