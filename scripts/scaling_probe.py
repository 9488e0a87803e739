"""Scaling-efficiency measurements (VERDICT r01 item 7).

Placement data parallelism needs ZERO device collectives: reads are
independent, per-shard jplace rows are merged on host (append-only), so
the only dp scaling losses are (a) per-chip batch shrinking below the
throughput knee and (b) sharding/dispatch overhead.  This probe
measures both, plus the mp (DB-sharded) communication overhead:

``--device`` (run on the real TPU, exclusive):
    device-sustained reads/s vs per-chip batch size B -- the dp
    scaling model is reads/s(B_total/N) * N, so the B sweep IS the
    strong-scaling curve; the weak-scaling (fixed per-chip batch)
    efficiency is 100% by construction (no collectives).

``--mesh`` (CPU, 8 virtual devices):
    fixed TOTAL work on fixed physical cores while dp varies 1->8:
    any wall-time growth is pure sharding overhead (partition +
    dispatch + host merge), the only non-scalable dp term.  Also runs
    the mp=2/4/8 kmer-sharded engine (psum[B,E] per step) and
    edge-sharded postings engine for result-equality + overhead.

Results recorded in BASELINE.md ("Measured scaling").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def device_batch_sweep():
    import jax
    import jax.numpy as jnp

    from bench import make_reads, synthetic_db
    from rappas_tpu.place.engine import (accumulate, finalize,
                                         kmer_rows_packed, pack_reads)
    from rappas_tpu.utils import enable_compile_cache

    enable_compile_cache()
    db = synthetic_db()
    k = db.k
    D = jax.device_put(db.dense_matrix(pad_rows=1))
    n_rows = D.shape[0]
    thr = jnp.float32(db.thr_log10)
    L = 150

    @jax.jit
    def step(D, packed, lengths):
        rows = kmer_rows_packed(packed, lengths, k, 4, n_rows, L)
        acc = accumulate(D, rows)
        return finalize(acc, lengths, thr, k, 7)

    print(f"device: {jax.devices()[0]}", flush=True)
    rows = []
    for B in (1024, 2048, 4096, 8192, 16384, 32768):
        codes_np, lens_np = make_reads(B * 2, L)
        packed = jnp.asarray(pack_reads(codes_np).reshape(2, B, -1))
        lens = jnp.asarray(lens_np.reshape(2, B))

        def window(n_steps):
            out = None
            t0 = time.time()
            for i in range(n_steps):
                out = step(D, packed[i % 2], lens[i % 2])
            np.asarray(jax.device_get(out[0][:1, :1]))
            return n_steps * B / (time.time() - t0)

        n_steps = max(8, (1 << 20) // B)      # ~1M reads per window
        window(max(2, n_steps // 8))          # warm (compile + fetch)
        rate = sorted(window(n_steps) for _ in range(3))[1]
        rows.append({"per_chip_batch": B, "reads_per_s": round(rate)})
        print(f"B={B:6d}: {rate / 1e3:8.1f} k reads/s", flush=True)
    peak = max(r["reads_per_s"] for r in rows)
    for r in rows:
        r["vs_peak"] = round(r["reads_per_s"] / peak, 3)
    return rows


def mesh_overhead():
    # must run in a fresh process with CPU pinned (see conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import make_reads, synthetic_db
    from rappas_tpu.parallel.engine import ShardedEngine
    from rappas_tpu.parallel.kmer_sharded import KmerShardedPlacement
    from rappas_tpu.parallel.mesh import make_mesh
    from rappas_tpu.place.engine import PlacementEngine

    db = synthetic_db(k=8, n_edges=160)
    B_total, L = 2048, 150
    mat_codes, lens = make_reads(B_total, L)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[mat_codes]

    def timeit(engine, reps=3):
        res = engine.score(mat, lens)          # warm/compile
        t0 = time.time()
        for _ in range(reps):
            res = engine.score(mat, lens)
        return (time.time() - t0) / reps, res

    single = PlacementEngine(db)
    codes = single.encode_batch(mat)

    def same_results(a, b):
        """Edge-set + score equality per read (tie order may differ)."""
        if not np.array_equal(a.n_matched, b.n_matched):
            return False
        for i in range(a.top_edges.shape[0]):
            av, bv = a.top_edges[i] >= 0, b.top_edges[i] >= 0
            if (sorted(a.top_edges[i][av].tolist()) !=
                    sorted(b.top_edges[i][bv].tolist())):
                return False
            if not np.allclose(sorted(a.top_scores[i][av]),
                               sorted(b.top_scores[i][bv]), atol=1e-5):
                return False
        return True

    t_ref, ref = timeit(single)
    out = {"total_reads": B_total,
           "single_device_s": round(t_ref, 4), "dp": [], "mp": []}
    print(f"single device: {t_ref * 1e3:.1f} ms "
          f"(B={B_total}, fixed 2 physical cores)", flush=True)

    for dp in (2, 4, 8):
        mesh = make_mesh(jax.devices()[:dp], dp=dp, mp=1)
        t, res = timeit(ShardedEngine(db, mesh))
        same = same_results(res, ref)
        ovh = max(0.0, t / t_ref - 1.0)
        out["dp"].append({"dp": dp, "time_s": round(t, 4),
                          "overhead_vs_single": round(ovh, 3),
                          "results_equal": bool(same)})
        print(f"dp={dp}: {t * 1e3:7.1f} ms  overhead {ovh * 100:5.1f}%  "
              f"equal={same}", flush=True)

    for mp in (2, 4, 8):
        mesh = make_mesh(jax.devices()[:mp], dp=1, mp=mp)
        eng = KmerShardedPlacement(db, mesh)
        res = eng.score(codes, lens)           # warm/compile
        t0 = time.time()
        for _ in range(3):
            res = eng.score(codes, lens)
        t = (time.time() - t0) / 3
        same = same_results(res, ref)
        # psum volume per step: [B, E] f32 all-reduce
        psum_mb = B_total * db.n_edge_slots * 4 / 1e6
        out["mp"].append({"mp": mp, "time_s": round(t, 4),
                          "psum_mb_per_step": round(psum_mb, 1),
                          "results_equal": bool(same)})
        print(f"mp={mp}: {t * 1e3:7.1f} ms  psum {psum_mb:.1f} MB/step  "
              f"equal={same}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="real-TPU per-chip batch sweep")
    ap.add_argument("--mesh", action="store_true",
                    help="virtual 8-device CPU dp/mp overhead")
    args = ap.parse_args()
    result = {}
    if args.device:
        result["device_batch_sweep"] = device_batch_sweep()
    if args.mesh:
        result["mesh_overhead"] = mesh_overhead()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
