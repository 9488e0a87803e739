"""Round-4 probe D2: where does the multi-GB k=12 step spend its time?

The build_scale DB covers ~97% of the 4^12 space, so ~every window of
every read hits (~139 hit windows x ~4.4 postings = ~600 real postings
per read) -- no hit compaction, sort width W*P = 1112.  Breakdown of the
captured finalize at B=4096 + the effect of sort_keep and the two-stage
unique gather.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import jax, jax.numpy as jnp, numpy as np
from round4_probe import capture_step, reads_for, timed

def main():
    from rappas_tpu.db import PhyloKmerDB
    from rappas_tpu.place.engine import PlacementEngine
    print("device:", jax.devices()[0], flush=True)
    db = PhyloKmerDB.load("/tmp/rappas_scale_db/DB_k12.rptpu")
    eng = PlacementEngine(db, table="postings")
    B, L = 4096, 150
    mat, lens = reads_for(db, B, L)
    codes = eng.encode_batch(mat)
    t0 = time.perf_counter()
    (args, kw), orig = capture_step(eng, codes, mat, lens)
    host_dt = time.perf_counter() - t0
    lrows = np.asarray(args[1])
    uniq = args[2]
    W = lrows.shape[1]
    print(f"W={W} two-stage={uniq is not None} sort_keep={kw.get('sort_keep')} "
          f"host prep {host_dt*1e3:.0f} ms", flush=True)
    dt = timed(lambda: orig(*args, **kw), n=10)
    print(f"full step: {dt*1e3:.2f} ms ({B/dt/1e3:.0f}k r/s)", flush=True)

    # pieces
    parts = eng.light_parts
    P = parts[0].shape[1] // 2
    if uniq is not None and isinstance(uniq, tuple):
        @jax.jit
        def g_uniq(us, lr):
            compact = jnp.concatenate([p[u] for p, u in zip(parts, us)], axis=0)
            return compact[lr]
        t = timed(lambda: g_uniq(uniq, args[1]), n=10)
        print(f"  two-stage gather (uniq {sum(int(np.asarray(u).shape[0]) for u in uniq)} rows + {B}x{W} re-gather): {t*1e3:.2f} ms", flush=True)
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.integers(0, 8000, (B, W*P), np.int32))
    d = jnp.asarray(rng.random((B, W*P), np.float32))
    @jax.jit
    def srt(e, d):
        return jax.lax.sort((e, d), num_keys=1)
    t = timed(lambda: srt(e, d), n=10)
    print(f"  lax.sort width {W*P}: {t*1e3:.2f} ms", flush=True)
    sk = kw.get("sort_keep") or W*P
    dd = jnp.asarray(rng.random((B, sk), np.float32))
    @jax.jit
    def scans(d_s):
        cs = jnp.cumsum(d_s, axis=1)
        m = jax.lax.cummax(cs, axis=1)
        return cs, m
    t = timed(lambda: scans(dd), n=10)
    print(f"  cumsum+cummax width {sk}: {t*1e3:.2f} ms", flush=True)
    # throughput at other batch sizes
    for B2 in (2048, 8192):
        m2, l2 = reads_for(db, B2, L, seed=3)
        c2 = eng.encode_batch(m2)
        (a2, k2), o2 = capture_step(eng, c2, m2, l2)
        dt = timed(lambda: o2(*a2, **k2), n=8)
        print(f"  full step B={B2}: {dt*1e3:.2f} ms ({B2/dt/1e3:.0f}k r/s)", flush=True)

if __name__ == "__main__":
    main()
