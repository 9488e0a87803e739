"""Round-4 device probes, one process (the tunnel handshake is paid once):

A. postings step breakdown at k=12/4000 taxa: where do the 6.5 ms go
   (gather vs sort vs rest), and what would per-read-group sort tiling
   (bucketing reads by hit count so the lax.sort width follows the
   bucket max, not the batch max) save?
B. config-2 regime (k=10 DNA): direct dense table (1.3 GB, past the
   VMEM-staging cliff) vs postings mode on the same DB.
C. config-4 regime (protein k=8): compact table with the new host-side
   int64 lookup vs postings mode.
D. config-3 regime: the real multi-GB k=12 light table (N-part split)
   -- device placement rate + HBM footprint.

Usage: python scripts/round4_probe.py [A B C D]  (default: all)
Results land in docs/PERF.md.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(jnp.ravel(leaves[-1])[:1]))


def timed(fn, *args, n=30):
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


def reads_for(db, B, L, seed=1):
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    lens = np.full(B, L, np.int32)
    return mat, lens


# ------------------------------------------------------------------ #
def probe_a():
    from scale_check import build_large_db

    from rappas_tpu.place.engine import PlacementEngine

    print("== A: postings breakdown + grouping simulation ==", flush=True)
    db = build_large_db()
    engine = PlacementEngine(db, table="postings")
    B, L = 4096, 150
    mat, lens = reads_for(db, B, L)
    codes_np = engine.encode_batch(mat)

    (a_args, a_kw), orig = capture_step(engine, codes_np, mat, lens)
    light_parts, lrows, uniq = a_args[0], a_args[1], a_args[2]
    W = np.asarray(lrows).shape[1]
    print(f"captured: lrows {np.asarray(lrows).shape}, "
          f"two-stage={uniq is not None}", flush=True)

    def full():
        return orig(*a_args, **a_kw)
    dt = timed(full)
    print(f"full step: {dt * 1e3:.2f} ms ({B / dt / 1e3:.0f}k r/s)",
          flush=True)

    # sort cost alone at the captured width, and at smaller widths
    P = 8
    rng = np.random.default_rng(0)
    for w in (8, 16, 32, W):
        e = jnp.asarray(rng.integers(0, 8000, (B, w * P), np.int32))
        d = jnp.asarray(rng.random((B, w * P), np.float32))

        @jax.jit
        def srt(e, d):
            return jax.lax.sort((e, d), num_keys=1)
        t = timed(srt, e, d)
        print(f"  lax.sort width {w * P:5d}: {t * 1e3:6.2f} ms", flush=True)

    # cumsum/segment machinery alone at captured width
    e = jnp.asarray(rng.integers(0, 8000, (B, W * P), np.int32))
    d = jnp.asarray(rng.random((B, W * P), np.float32))

    @jax.jit
    def segsum(e_s, d_s):
        cs = jnp.cumsum(d_s, axis=1)
        nxt = jnp.concatenate([e_s[:, 1:],
                               jnp.full((B, 1), -1, e_s.dtype)], axis=1)
        is_end = e_s != nxt
        is_start = jnp.concatenate(
            [jnp.ones((B, 1), bool), e_s[:, 1:] != e_s[:, :-1]], axis=1)
        prev = jnp.concatenate(
            [jnp.zeros((B, 1), cs.dtype), cs[:, :-1]], axis=1)
        start_cs = jax.lax.cummax(
            jnp.where(is_start, prev, -jnp.inf), axis=1)
        return cs - start_cs, is_end
    t = timed(segsum, e, d)
    print(f"  cumsum/segment width {W * P}: {t * 1e3:6.2f} ms", flush=True)

    # light gather alone
    def lg(lr):
        if isinstance(uniq, tuple):
            compact = jnp.concatenate(
                [p[u] for p, u in zip(light_parts, uniq)], axis=0)
            return compact[lr]
        return light_parts[0][lr]
    t = timed(jax.jit(lg), lrows)
    print(f"  light gather: {t * 1e3:6.2f} ms", flush=True)

    # per-read hit-count distribution -> what grouping would save
    rof = engine._host_rows(engine._host_kmer_indices(codes_np, lens))
    hits = (rof < engine._nl).sum(axis=1)
    print(f"  hits/read: avg {hits.mean():.1f}, p50 "
          f"{np.percentile(hits, 50):.0f}, p90 "
          f"{np.percentile(hits, 90):.0f}, max {hits.max()}", flush=True)
    # simulated grouping: order reads by hits, bucket widths pow2
    order = np.argsort(hits)
    srt_hits = hits[order]
    total = 0.0
    groups = []
    lo = 0
    while lo < B:
        # group of reads whose max hits fits the next pow2 width
        wmax = max(8, 1 << int(np.ceil(np.log2(max(srt_hits[lo], 1)))))
        hi = int(np.searchsorted(srt_hits, wmax, side="right"))
        hi = max(hi, lo + 256)                    # min group rows
        hi = min(hi, B)
        wg = max(8, 1 << int(np.ceil(np.log2(max(srt_hits[hi - 1], 1)))))
        groups.append((hi - lo, wg))
        lo = hi
    print(f"  simulated groups (rows, width): {groups}", flush=True)
    for rows, wg in groups:
        rr = max(256, rows)
        e = jnp.asarray(rng.integers(0, 8000, (rr, wg * P), np.int32))
        d = jnp.asarray(rng.random((rr, wg * P), np.float32))

        @jax.jit
        def srt2(e, d):
            return jax.lax.sort((e, d), num_keys=1)
        t = timed(srt2, e, d, n=20)
        total += t
        print(f"    group rows={rows} width={wg * P}: sort "
              f"{t * 1e3:6.2f} ms", flush=True)
    print(f"  grouped sort total: {total * 1e3:.2f} ms", flush=True)


# ------------------------------------------------------------------ #
def synth_db(k, n_edges, n_keys, mean_post, seed=0, amino=False):
    from rappas_tpu.alphabet import AA, DNA
    from rappas_tpu.db import PhyloKmerDB, build_csr
    from rappas_tpu.tree import parse_newick

    alpha = AA if amino else DNA
    S = alpha.n_states
    rng = np.random.default_rng(seed)
    labels = ",".join(f"L{i}:0.1" for i in range(n_edges - 1))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, S)
    space = S ** k
    # choice(replace=False) materialises a permutation of the space --
    # fine for 4^10, ruinous for 20^8; big spaces sample-and-unique
    keys = rng.choice(space, size=n_keys, replace=False).astype(np.int64) \
        if space < 1 << 24 else \
        np.unique(rng.integers(0, space, int(n_keys * 1.2)))[:n_keys]
    codes = np.repeat(keys, mean_post)
    edges = rng.integers(1, n_edges, codes.shape[0]).astype(np.int32)
    scores = (thr + 0.01 + rng.random(codes.shape[0]) * 2.5
              ).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes, edges, scores, thr)
    return PhyloKmerDB(k=k, omega=1.5, alphabet=alpha, thr_log10=thr,
                       tree=tree, keys=keys, offsets=offsets, edges=e,
                       deltas=deltas)


def engine_rate(engine, mat, lens, n=20):
    """Device-sustained rate of the engine's scoring step (inputs
    prepared once, completion forced by a scalar fetch)."""
    codes = engine.encode_batch(mat)
    if engine.table == "postings":
        (args, kw), orig = capture_step(engine, codes, mat, lens)

        def step():
            return orig(*args, **kw)
    else:
        from rappas_tpu.place.engine import (accumulate, compact_rows,
                                             finalize, kmer_indices64,
                                             kmer_rows, searchsorted_rows)
        if engine.table == "direct":
            rows_h = None
        elif engine._host_lookup:
            kidx = engine._host_kmer_indices(codes, lens)
            rows_h = jnp.asarray(searchsorted_rows(engine.db.keys, kidx))
        c_dev = jnp.asarray(codes)
        l_dev = jnp.asarray(lens)

        def step():
            if engine.table == "direct":
                rows = kmer_rows(c_dev, engine.k,
                                 engine.alphabet.n_states, engine.n_rows)
            elif engine._host_lookup:
                rows = rows_h
            else:
                idx = kmer_indices64(c_dev, engine.k,
                                     engine.alphabet.n_states)
                rows = compact_rows(engine.keys_dev, idx)
            acc = accumulate(engine.D, rows) * engine.scale
            return finalize(acc, l_dev, engine.thr, engine.k,
                            engine.keep_at_most)
    dt = timed(step, n=n)
    B = mat.shape[0]
    return dt, B / dt


def probe_b():
    from rappas_tpu.place.engine import PlacementEngine

    print("== B: k=10 DNA (config 2) ==", flush=True)
    # ~40% of the 4^10 space present, ~5 postings each (150-taxon-like)
    db = synth_db(10, 300, int(4 ** 10 * 0.4), 5)
    print(f"DB: {db.n_kmers} kmers, {db.nnz} postings, "
          f"E={db.n_edge_slots}", flush=True)
    B, L = 16384, 150
    mat, lens = reads_for(db, B, L)
    for table in ("direct", "compact", "postings"):
        eng = PlacementEngine(db, table=table)
        if table == "postings":
            dev_b = sum(p.nbytes for p in eng.light_parts) + eng.D.nbytes
            extra = f", light parts {[p.shape[0] for p in eng.light_parts]}"
        else:
            dev_b = eng.D.nbytes
            extra = ""
        dt, rate = engine_rate(eng, mat, lens)
        print(f"  {table:8s}: {dt * 1e3:7.2f} ms -> {rate / 1e3:6.0f}k "
              f"r/s ({dev_b / 1e9:.2f} GB device{extra})", flush=True)


def probe_c():
    from rappas_tpu.place.engine import PlacementEngine

    print("== C: protein k=8 (config 4) ==", flush=True)
    db = synth_db(8, 300, 2_000_000, 4, amino=True)
    print(f"DB: {db.n_kmers} kmers, {db.nnz} postings, "
          f"E={db.n_edge_slots}", flush=True)
    B, L = 16384, 100
    rng = np.random.default_rng(2)
    letters = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    mat = letters[rng.integers(0, 20, (B, L))]
    lens = np.full(B, L, np.int32)
    for table in ("compact", "postings"):
        eng = PlacementEngine(db, table=table)
        dt, rate = engine_rate(eng, mat, lens)
        print(f"  {table:8s}: {dt * 1e3:7.2f} ms -> {rate / 1e3:6.0f}k "
              f"r/s", flush=True)
    # the host-side int64 lookup cost (overlaps the device in the
    # pipeline, but bounds the sustainable rate)
    eng = PlacementEngine(db, table="compact")
    codes = eng.encode_batch(mat)
    from rappas_tpu.place.engine import searchsorted_rows
    t0 = time.perf_counter()
    for _ in range(5):
        kidx = eng._host_kmer_indices(codes, lens)
        rows = searchsorted_rows(db.keys, kidx)
    t_host = (time.perf_counter() - t0) / 5
    print(f"  host kidx+searchsorted: {t_host * 1e3:.1f} ms/batch "
          f"({B / t_host / 1e3:.0f}k r/s host ceiling)", flush=True)
    # k=7 (int32 device lookup) for comparison
    db7 = synth_db(7, 300, 2_000_000, 4, amino=True)
    eng7 = PlacementEngine(db7, table="compact")
    mat7, lens7 = mat, lens
    dt, rate = engine_rate(eng7, mat7, lens7)
    print(f"  k=7 compact (device int32 lookup): {dt * 1e3:7.2f} ms -> "
          f"{rate / 1e3:6.0f}k r/s", flush=True)


def probe_d():
    print("== D: config 3, multi-GB k=12 light table ==", flush=True)
    from rappas_tpu.place.engine import PlacementEngine

    from build_scale import build_multigb_db
    t0 = time.time()
    db = build_multigb_db()
    if time.time() - t0 > 5:
        print(f"built k=12 DB in {time.time() - t0:.0f}s", flush=True)
    print(f"DB: {db.n_kmers} kmers, {db.nnz} postings, "
          f"E={db.n_edge_slots}", flush=True)

    eng = PlacementEngine(db, table="auto")
    dev_b = (sum(p.nbytes for p in eng.light_parts) + eng.D.nbytes +
             (eng._rof_np.nbytes if eng._rof_np is not None else 0))
    print(f"table={eng.table}, light parts="
          f"{[p.shape[0] for p in eng.light_parts]}, device "
          f"{dev_b / 1e9:.2f} GB", flush=True)
    B, L = 16384, 150
    mat, lens = reads_for(db, B, L)
    # oracle spot-check on this real-shaped DB
    from rappas_tpu.place import oracle
    res = eng.score(mat[:256].copy(), lens[:256])
    for i in (0, 3, 77):
        seq = mat[i].tobytes().decode()
        rows_o, n_o = oracle.place_read(db, seq)
        assert n_o == int(res.n_matched[i]), (i, n_o, res.n_matched[i])
        if n_o:
            assert abs(float(res.top_scores[i, 0]) - rows_o[0][1]) < 2e-3
    print("oracle spot-check ok", flush=True)
    dt, rate = engine_rate(eng, mat, lens)
    print(f"  device step B={B}: {dt * 1e3:.2f} ms -> "
          f"{rate / 1e3:.0f}k r/s", flush=True)
    mat4, lens4 = reads_for(db, 4096, L, seed=9)
    dt, rate = engine_rate(eng, mat4, lens4)
    print(f"  device step B=4096: {dt * 1e3:.2f} ms -> "
          f"{rate / 1e3:.0f}k r/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B", "C", "D"]
    print(f"device: {jax.devices()[0]}", flush=True)
    for w in which:
        {"A": probe_a, "B": probe_b, "C": probe_c, "D": probe_d}[w.upper()]()
