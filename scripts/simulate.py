"""Simulate a reference dataset: random tree + JC69 sequence evolution.

Produces alignment/tree/reads for integration tests and benchmarks at the
BASELINE.json "config 1" scale (~150-taxon 16S-like, 1.5 kb).  Purely
synthetic but statistically shaped like the real thing (clock-ish tree,
~20% divergence, reads sampled from leaves with sequencing errors).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASES = np.frombuffer(b"ACGT", np.uint8)


def random_tree(n_taxa: int, rng) -> str:
    """Random coalescent-ish binary tree newick with branch lengths."""
    nodes = [f"T{i}" for i in range(n_taxa)]
    heights = [0.0] * n_taxa
    while len(nodes) > 2:
        i, j = sorted(rng.choice(len(nodes), 2, replace=False))
        h = max(heights[i], heights[j]) + float(rng.exponential(0.02))
        ni = f"({nodes[i]}:{h - heights[i]:.6f},{nodes[j]}:{h - heights[j]:.6f})"
        nodes[i] = ni
        heights[i] = h
        del nodes[j]
        del heights[j]
    h = max(heights) + float(rng.exponential(0.02))
    return (f"({nodes[0]}:{h - heights[0]:.6f},"
            f"{nodes[1]}:{h - heights[1]:.6f})root;")


def evolve(tree_newick: str, length: int, rng):
    """JC69 evolution along the tree -> {leaf: sequence codes}."""
    from rappas_tpu.tree import parse_newick

    t = parse_newick(tree_newick)
    root_seq = rng.integers(0, 4, length)
    seqs = {}

    def walk(node, seq):
        for c in node.children:
            bl = float(c.branch_len)
            # JC69: P(change) = 3/4 (1 - exp(-4/3 bl))
            p = 0.75 * (1.0 - np.exp(-4.0 / 3.0 * bl))
            mask = rng.random(length) < p
            s2 = seq.copy()
            if mask.any():
                s2[mask] = (s2[mask] + rng.integers(1, 4, mask.sum())) % 4
            if c.is_leaf:
                seqs[c.label] = s2
            else:
                walk(c, s2)

    walk(t.root, root_seq)
    return seqs


def make_reads(seqs: dict, n_reads: int, read_len: int, err: float, rng):
    taxa = sorted(seqs)
    out = []
    for i in range(n_reads):
        taxon = taxa[int(rng.integers(0, len(taxa)))]
        s = seqs[taxon]
        start = int(rng.integers(0, max(1, len(s) - read_len)))
        r = s[start:start + read_len].copy()
        mask = rng.random(r.shape[0]) < err
        if mask.any():
            r[mask] = (r[mask] + rng.integers(1, 4, mask.sum())) % 4
        out.append((f"r{i} src={taxon} pos={start}", r))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--taxa", type=int, default=150)
    ap.add_argument("--length", type=int, default=1500)
    ap.add_argument("--reads", type=int, default=10000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--error", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="/tmp/sim16s")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    nwk = random_tree(args.taxa, rng)
    (out / "ref.tree").write_text(nwk + "\n")
    seqs = evolve(nwk, args.length, rng)
    with open(out / "ref_align.fasta", "w") as f:
        for taxon in sorted(seqs):
            f.write(f">{taxon}\n{BASES[seqs[taxon]].tobytes().decode()}\n")
    reads = make_reads(seqs, args.reads, args.read_len, args.error, rng)
    with open(out / "reads.fasta", "w") as f:
        for h, r in reads:
            f.write(f">{h}\n{BASES[r].tobytes().decode()}\n")
    print(f"wrote {args.taxa} taxa x {args.length} bp + "
          f"{args.reads} reads to {out}")


if __name__ == "__main__":
    main()
