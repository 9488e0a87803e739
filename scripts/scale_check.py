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
    pt_bytes = (engine.light_pairs.nbytes + engine.D.nbytes +
                (engine.rof_dev.nbytes if engine.rof_dev is not None
                 else 0))
    print(f"table={engine.table}, device bytes={pt_bytes / 1e9:.2f} GB "
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

    # device throughput (scalar-fetch sync, transfers excluded)
    from rappas_tpu.place.engine import (finalize_postings, gather_rows,
                                         kmer_rows)

    codes_np = engine.encode_batch(mat)
    codes_dev = jnp.asarray(codes_np)
    lens_dev = jnp.asarray(lens)

    t0 = time.time()
    hh = engine._heavy_hits(codes_np, lens)
    t_host = time.time() - t0
    n_hit_slots = 0 if hh is None else int(hh[0].shape[0])
    print(f"host heavy-hit extraction: {t_host * 1e3:.1f} ms, "
          f"{n_hit_slots} hit slots", flush=True)

    nl = engine._nl
    space = 4 ** db.k

    @jax.jit
    def step(light_pairs, rof, D, codes, lengths, hrows, hreads):
        kidx32 = kmer_rows(codes, db.k, 4, space + 1)
        lrows = jnp.minimum(gather_rows(rof, kidx32), nl)
        dense_rows = gather_rows(D, hrows)
        return finalize_postings(light_pairs, lrows, dense_rows, hreads,
                                 lengths, jnp.float32(db.thr_log10),
                                 db.k, 7, True)

    if hh is None:
        hh = (jnp.zeros(256, jnp.int32), jnp.zeros(256, jnp.int32))
    args = (engine.light_pairs, engine.rof_dev, engine.D,
            codes_dev, lens_dev, hh[0], hh[1])
    scalar = jax.jit(lambda o: sum(x.ravel()[:1].astype(jnp.float32).sum()
                                   for x in o))
    out = step(*args)
    np.float32(scalar(out))
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = step(*args)
    np.float32(scalar(out))
    dt = (time.time() - t0) / n
    print(f"device step: {dt * 1e3:.2f} ms -> "
          f"{B / dt / 1e3:.0f}k reads/s "
          f"(dense-over-E equivalent traffic would be "
          f"{(L - db.k + 1) * db.n_edge_slots * 4 * B / 1e9:.1f} GB/batch)",
          flush=True)


if __name__ == "__main__":
    main()
