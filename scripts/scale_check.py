"""Large-tree regime validation (BASELINE.json configs 3 & 5 scale):
k=12, ~4000-taxon tree (E ~ 8000 score slots), millions of k-mers.

At this scale a dense row per k-mer costs E*4 = 32 KB -- a 2M-k-mer
compact table would be 64 GB.  The postings mode stores 8 B per posting
slot plus a small dense matrix for the heavy tail, and its per-read
gather traffic is ~Q*P*8 B instead of ~Q*E*4 B.

Run on the real chip: builds the synthetic DB, places a few batches,
spot-checks against the serial oracle, and prints device throughput.
"""

import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def build_large_db(k=12, n_taxa=4000, n_light=2_000_000, n_heavy=10_000,
                   seed=0):
    from rappas_tpu.alphabet import DNA
    from rappas_tpu.db import PhyloKmerDB, build_csr
    from rappas_tpu.tree import parse_newick

    rng = np.random.default_rng(seed)
    # star tree stands in for topology; only the id space size matters
    labels = ",".join(f"T{i}:0.1" for i in range(2 * n_taxa - 2))
    tree = parse_newick(f"({labels})root;")
    tree.reset_jplace_edge_ids()
    E = 2 * n_taxa - 1
    thr = PhyloKmerDB.threshold(k, 1.5, 4)

    keys = rng.choice(4 ** k, size=n_light + n_heavy, replace=False)
    lens = np.concatenate([
        rng.integers(1, 8, n_light),          # light: 1-7 postings
        rng.integers(32, 200, n_heavy),       # heavy tail: conserved
    ])
    codes = np.repeat(keys, lens)
    edges = rng.integers(1, E, codes.shape[0]).astype(np.int32)
    scores = (thr + 0.01 + rng.random(codes.shape[0]) * 2.5
              ).astype(np.float32)
    keys, offsets, e, deltas = build_csr(codes.astype(np.int64), edges,
                                         scores, thr)
    return PhyloKmerDB(k=k, omega=1.5, alphabet=DNA, thr_log10=thr,
                       tree=tree, keys=keys, offsets=offsets,
                       edges=e, deltas=deltas)


def main():
    import jax
    import jax.numpy as jnp

    from rappas_tpu.place import oracle
    from rappas_tpu.place.engine import PlacementEngine

    t0 = time.time()
    db = build_large_db()
    print(f"DB: {db.n_kmers} kmers, {db.nnz} postings, "
          f"E={db.n_edge_slots} ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    engine = PlacementEngine(db, table="auto")
    pt_bytes = (sum(p.nbytes for p in engine.light_parts) +
                engine.D.nbytes)
    print(f"table={engine.table}, light parts="
          f"{[p.shape[0] for p in engine.light_parts]}, "
          f"device bytes={pt_bytes / 1e9:.2f} GB "
          f"(dense-compact equivalent: "
          f"{(db.n_kmers + 1) * db.n_edge_slots * 4 / 1e9:.0f} GB) "
          f"({time.time() - t0:.1f}s)", flush=True)
    assert engine.table == "postings"

    B, L = 4096, 150
    rng = np.random.default_rng(1)
    letters = np.frombuffer(b"ACGT", np.uint8)
    mat = letters[rng.integers(0, 4, (B, L))]
    lens = np.full(B, L, np.int32)

    res = engine.score(mat.copy(), lens)  # compile + handshake
    # oracle spot check
    for i in (0, 1, 33):
        seq = mat[i].tobytes().decode()
        rows_o, n_o = oracle.place_read(db, seq)
        assert n_o == int(res.n_matched[i]), \
            f"read {i}: |L| {n_o} vs {int(res.n_matched[i])}"
        if n_o:
            assert int(res.top_edges[i, 0]) == rows_o[0][0] or abs(
                float(res.top_scores[i, 0]) - rows_o[0][1]) < 1e-3
            assert abs(float(res.top_scores[i, 0]) - rows_o[0][1]) < 2e-3
    print("oracle spot-check ok", flush=True)

    # host prep cost (the whole lookup pipeline runs host-side now)
    codes_np = engine.encode_batch(mat)
    t0 = time.time()
    n_rep = 5
    for _ in range(n_rep):
        kidx = engine._host_kmer_indices(codes_np, lens)
        rof = engine._host_rows(kidx)
    t_host = (time.time() - t0) / n_rep
    n_light = int((rof < engine._nl).sum())
    n_heavy = int((rof > engine._nl).sum())
    print(f"host kidx+rows: {t_host * 1e3:.1f} ms/batch "
          f"({n_light} light hits, {n_heavy} heavy hits of "
          f"{rof.size} windows)", flush=True)

    # end-to-end engine throughput (host prep + device, pipelined off)
    res = engine.score(mat.copy(), lens)
    n = 10
    t0 = time.time()
    for _ in range(n):
        res = engine.score(mat.copy(), lens)
    dt_e2e = (time.time() - t0) / n
    print(f"engine.score e2e: {dt_e2e * 1e3:.2f} ms -> "
          f"{B / dt_e2e / 1e3:.0f}k reads/s", flush=True)

    # device-sustained: host inputs prepared once, jitted step timed
    # with the scalar-fetch sync (block_until_ready returns early on
    # the tunneled backend)
    pend = engine._score_postings(codes_np, mat, lens)
    scalar = jax.jit(lambda o: o.ravel()[:1].astype(jnp.float32).sum())

    import rappas_tpu.place.engine as eng

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
    out = orig(*a, **kw)
    np.float32(scalar(out[1]))
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = orig(*a, **kw)
    np.float32(scalar(out[1]))
    dt = (time.time() - t0) / n
    print(f"device step: {dt * 1e3:.2f} ms -> "
          f"{B / dt / 1e3:.0f}k reads/s "
          f"(dense-over-E equivalent traffic would be "
          f"{(L - db.k + 1) * db.n_edge_slots * 4 * B / 1e9:.1f} GB/batch)",
          flush=True)


if __name__ == "__main__":
    main()
