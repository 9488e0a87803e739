"""Large-tree DB-build scaling proof (BASELINE configs 3/5 regime).

The reference's pain point: k>=10 builds need 8-16 GB of JVM heap and
hours (``/root/reference/README.md:222-225``).  This script actually
*builds* a k=12 DB for a large simulated tree through the production
``generate_kmers`` path (frontier explorer, per-node dedup, bounded-
memory merge) and reports wall time, peak RSS and DB size.

AR posteriors are synthesized (peaked per-site distributions shaped
like real ancestral reconstructions) because the external AR program is
not the subject: the k-mer enumeration + merge is.

Usage: python scripts/build_scale.py [--taxa 1000] [--k 12] [--sites 1500]
Results are recorded in docs/PERF.md.
"""

from __future__ import annotations

import argparse
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def synth_posteriors(extended, n_sites, rng, uncertain_frac=0.08):
    """Per-site posteriors for every ghost internal node, shaped like
    real ancestral reconstructions: most sites near-certain (dominant
    state 0.97-0.999), a minority uncertain (0.5-0.9) -- the uncertain
    sites drive the k-mer branching, giving a realistic handful of
    words per start position at k=12."""
    n_ids = max(n.id for n in extended.nodes) + 1
    probas = np.full((n_ids, n_sites, 4), np.nan, np.float32)
    ghost_ids = [n.id for n in extended.nodes
                 if not n.is_leaf and n.is_fake]
    for nid in ghost_ids:
        dom = rng.integers(0, 4, n_sites)
        uncertain = rng.random(n_sites) < uncertain_frac
        p_dom = np.where(uncertain,
                         rng.uniform(0.7, 0.9, n_sites),
                         rng.uniform(0.97, 0.999, n_sites))
        rest = 1.0 - p_dom
        # second state takes most of the remainder
        split = np.stack([rest * 0.8, rest * 0.15, rest * 0.05], axis=1)
        P = np.empty((n_sites, 4), np.float32)
        for s in range(4):
            P[:, s] = np.where(dom == s, p_dom, np.nan)
        order = np.argsort(np.where(np.isnan(P), 1.0, 2.0), axis=1)
        for j in range(3):
            P[np.arange(n_sites), order[:, j]] = split[:, j]
        probas[nid] = np.log10(P, dtype=np.float32)
    return probas, ghost_ids


def build_multigb_db(cache=Path("/tmp/rappas_scale_db/DB_k12.rptpu")):
    """Build (or load) the BASELINE config-3 artifact: a multi-GB k=12
    DB (100 taxa x 500 sites -> 72.4M postings, 16.3M k-mers) through
    the production ``generate_kmers`` path.  ~3 min cold on the 2-core
    dev host; cached on disk afterwards.  Shared by bench.py's config-3
    row and scripts/round4_probe.py D."""
    import simulate
    from rappas_tpu.alignment import Alignment
    from rappas_tpu.alphabet import DNA
    from rappas_tpu.ar.results import ARResults
    from rappas_tpu.build.pipeline import BuildConfig, generate_kmers
    from rappas_tpu.db import PhyloKmerDB
    from rappas_tpu.extend import extend_tree
    from rappas_tpu.tree import parse_newick

    cache = Path(cache)
    if cache.exists():
        return PhyloKmerDB.load(cache)
    rng = np.random.default_rng(7)
    taxa, sites = 100, 500
    nwk = simulate.random_tree(taxa, rng)
    original = parse_newick(nwk)
    original.reset_jplace_edge_ids()
    extended = extend_tree(original, n_ghosts=1)
    seqs = {n.label: rng.integers(0, 4, sites)
            for n in original.leaves}
    align = Alignment.from_records(
        DNA, [(lb, simulate.BASES[s].tobytes().decode())
              for lb, s in sorted(seqs.items())])
    ext_align = align.add_gap_rows(
        [n.label for n in extended.fake_leaves])
    probas, _ = synth_posteriors(extended, sites, rng)
    ar = ARResults(ar_tree=extended, probas=probas,
                   ar_to_extended={n.id: n.id for n in extended.nodes})
    db = generate_kmers(ar, extended, ext_align, original, DNA,
                        BuildConfig(k=12, omega=1.5), gap_jumps=False)
    cache.parent.mkdir(parents=True, exist_ok=True)
    db.save(cache)
    return db


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--taxa", type=int, default=1000)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--sites", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="/tmp/build_scale")
    args = ap.parse_args()

    import simulate
    from rappas_tpu.alignment import Alignment
    from rappas_tpu.alphabet import DNA
    from rappas_tpu.ar.results import ARResults
    from rappas_tpu.build.pipeline import BuildConfig, generate_kmers
    from rappas_tpu.extend import extend_tree
    from rappas_tpu.tree import parse_newick

    rng = np.random.default_rng(args.seed)
    t_all = time.time()
    nwk = simulate.random_tree(args.taxa, rng)
    original = parse_newick(nwk)
    original.reset_jplace_edge_ids()
    extended = extend_tree(original, n_ghosts=1)
    print(f"tree: {args.taxa} taxa, extended nodes: "
          f"{len(extended.nodes)}")

    seqs = {n.label: rng.integers(0, 4, args.sites)
            for n in original.leaves}
    align = Alignment.from_records(
        DNA, [(lb, simulate.BASES[s].tobytes().decode())
              for lb, s in sorted(seqs.items())])
    ext_align = align.add_gap_rows([n.label for n in
                                    extended.fake_leaves])

    t0 = time.time()
    probas, ghosts = synth_posteriors(extended, args.sites, rng)
    print(f"posteriors: {len(ghosts)} ghost nodes x {args.sites} sites "
          f"({time.time() - t0:.1f}s, {probas.nbytes / 1e9:.2f} GB)")

    ar = ARResults(ar_tree=extended, probas=probas,
                   ar_to_extended={n.id: n.id for n in extended.nodes})
    cfg = BuildConfig(k=args.k, omega=1.5)
    t0 = time.time()
    db = generate_kmers(ar, extended, ext_align, original, DNA, cfg,
                        gap_jumps=False)
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    db.save(out / f"DB_k{args.k}.rptpu")
    save_s = time.time() - t0
    size_mb = (out / f"DB_k{args.k}.rptpu").stat().st_size / 1e6

    print(f"\n=== k={args.k}, {args.taxa} taxa, {args.sites} sites ===")
    print(f"kmer generation: {dt:.1f}s wall "
          f"({len(ghosts)} nodes, {db.nnz} postings, {db.n_kmers} kmers)")
    print(f"peak RSS: {rss:.2f} GB")
    print(f"DB save: {save_s:.1f}s, {size_mb:.0f} MB on disk")
    print(f"total: {time.time() - t_all:.1f}s")


if __name__ == "__main__":
    main()
