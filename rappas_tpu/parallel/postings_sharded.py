"""Edge-range sharding of the postings tables: the large-tree multi-chip
mode (BASELINE.json config 5: ~4000-taxon trees, k=12, >= 2 hosts).

The single-chip postings layout (``rappas_tpu.place.engine``, table
``postings``) already keeps the large-tree DB small; this module
partitions it by **edge range** over the ``mp`` mesh axis:

* every posting (edge, delta) lives on exactly one chip -- the one
  owning its edge's range -- so each chip's light segment sums and heavy
  accumulators are *complete* for its edges;
* each chip runs the full postings pipeline on the (replicated-over-mp)
  read stream and produces its top-k candidates;
* the exact global top-k is the top-k of the all-gathered ``mp * K``
  candidates (edges are partitioned, so per-edge scores never need a
  cross-chip sum -- no psum over ``[B, E]`` tensors, only a tiny
  ``[B, mp*K]`` all-gather over ICI);
* the candidate-list size |L| is the psum of per-shard match counts.

Edge-range sharding also *shrinks* posting lists per chip (a k-mer's
postings split across ranges), pushing more k-mers under the light
width -- the opposite of k-mer-range sharding, which keeps lists whole.

Reads stay data-parallel over ``dp`` as everywhere else.  IUPAC
ambiguity windows (host-expanded by the engine,
``PlacementProcess.java:1129-1236``) are routed as additional per-shard
dense sources: every shard computes each window's contribution over its
own edge range from its local light/heavy tables, exactly like the
single-chip postings path does over the full range.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from rappas_tpu.db import (DELTA_TINY, LIGHT_PAD_EDGE, PhyloKmerDB,
                           build_csr)
from rappas_tpu.place.engine import (BatchResult, finalize_postings_local,
                                     gather_rows, host_kmer_indices,
                                     kmer_rows, searchsorted_rows as
                                     _searchsorted_rows)


def shard_db_by_edge(db: PhyloKmerDB, mp: int, width: int = 8):
    """Partition the DB's postings into ``mp`` contiguous edge ranges and
    build per-shard postings tables, padded to common shapes.

    Returns (bounds int64[mp+1], stacked dict of arrays with leading mp
    axis): light_pairs [mp, max_nl+1, 2P], rof [mp, space+1] (direct
    k-mer -> row tables, per-shard nl encoding), nl int32[mp],
    heavy_dense [mp, max_nh+1, W] with W = max range width.
    """
    E = db.n_edge_slots
    space = db.alphabet.n_states ** db.k
    if space * 4 > 1 << 30:
        raise ValueError("postings_sharded needs the direct row table "
                         f"(S^k = {space} too large)")
    bounds = np.linspace(0, E, mp + 1).astype(np.int64)
    codes_full = np.repeat(db.keys, np.diff(db.offsets))
    # float64 round trip: build_csr recomputes delta = (score - thr) as
    # f32; with f64 scores the recovered deltas are bit-identical to the
    # originals (an f32 intermediate would perturb ~half by 1 ulp and
    # break cross-mode equality on near-tie candidates)
    scores_full = (np.where(db.deltas <= DELTA_TINY,
                            np.float32(0.0), db.deltas).astype(np.float64)
                   + np.float64(db.thr_log10))

    shards = []
    for i in range(mp):
        sel = (db.edges >= bounds[i]) & (db.edges < bounds[i + 1])
        keys, offsets, edges, deltas = build_csr(
            codes_full[sel], db.edges[sel],
            scores_full[sel], db.thr_log10)
        sub = PhyloKmerDB(k=db.k, omega=db.omega, alphabet=db.alphabet,
                          thr_log10=db.thr_log10, tree=db.tree,
                          keys=keys, offsets=offsets, edges=edges,
                          deltas=deltas)
        sub._arrays = db.arrays  # reuse; only n_edge_slots is read
        shards.append(sub.postings_tables(width))

    max_nl = max(pt.light_keys.shape[0] for pt in shards)
    max_nh = max(pt.heavy_keys.shape[0] for pt in shards)
    widths = np.diff(bounds)
    W = int(widths.max())
    Ptw = 2 * width

    light_pairs = np.zeros((mp, max_nl + 1, Ptw), np.int32)
    # edge halves default to the pad sentinel (sorts past every real
    # edge; presence = edge != sentinel, rappas_tpu.db.LIGHT_PAD_EDGE)
    light_pairs[:, :, :width] = LIGHT_PAD_EDGE
    rof = np.zeros((mp, space + 1), np.int32)
    nl_arr = np.zeros(mp, np.int32)
    heavy_dense = np.zeros((mp, max_nh + 1, W), np.float32)
    heavy_keys = []
    light_keys = []
    for i, pt in enumerate(shards):
        nl = pt.light_keys.shape[0]
        nh = pt.heavy_keys.shape[0]
        nl_arr[i] = nl
        pairs = np.concatenate(
            [pt.light_edges, pt.light_deltas.view(np.int32)], axis=1)
        # rows beyond nl keep sentinel edges / zero deltas; row nl is
        # the miss row and pad rows past it are never addressed
        # (lrows = min(rof, nl))
        light_pairs[i, :nl] = pairs[:nl]
        r = np.full(space + 1, nl, np.int32)
        r[pt.light_keys] = np.arange(nl, dtype=np.int32)
        r[pt.heavy_keys] = nl + 1 + np.arange(nh, dtype=np.int32)
        rof[i] = r
        # heavy columns are local to the shard's edge range
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        heavy_dense[i, :nh, :hi - lo] = pt.heavy_dense[:nh, lo:hi]
        heavy_keys.append(pt.heavy_keys)
        light_keys.append(pt.light_keys)
    return bounds, dict(light_pairs=light_pairs, rof=rof, nl=nl_arr,
                        heavy_dense=heavy_dense, heavy_keys=heavy_keys,
                        light_keys=light_keys)


class PostingsShardedPlacement:
    """Large-tree placement over a (dp, mp) mesh: reads data-parallel,
    postings edge-range-sharded, exact top-k via candidate all-gather."""

    def __init__(self, db: PhyloKmerDB, mesh: Mesh, keep_at_most: int = 7,
                 postings_width: int = 8):
        self.db = db
        self.mesh = mesh
        self.k = db.k
        self.keep_at_most = keep_at_most
        thr = jnp.float32(db.thr_log10)
        mp = mesh.shape["mp"]
        S = db.alphabet.n_states
        space = S ** db.k

        bounds, t = shard_db_by_edge(db, mp, postings_width)
        self._bounds = bounds
        self._heavy_keys = t["heavy_keys"]      # per-shard, host side
        self._nl = t["nl"]
        sh = lambda *spec: jax.sharding.NamedSharding(mesh, P(*spec))
        self.light_pairs = jax.device_put(t["light_pairs"],
                                          sh("mp", None, None))
        self.rof = jax.device_put(t["rof"], sh("mp", None))
        self.nl_dev = jax.device_put(t["nl"], sh("mp"))
        self.H = jax.device_put(t["heavy_dense"], sh("mp", None, None))
        self.offs_dev = jax.device_put(bounds[:-1].astype(np.int32),
                                       sh("mp"))

        k, K = db.k, keep_at_most
        self._light_keys = t["light_keys"]       # per-shard, host side

        def shard_body(light_pairs, rof, nl, H, offs, codes, lengths,
                       hrows, hreads, amb):
            # leading shard axes of size 1 from the in_specs
            B_loc = codes.shape[0]
            W = H.shape[2]
            kidx = kmer_rows(codes, k, S, space + 1)
            lrows = jnp.minimum(gather_rows(rof[0], kidx), nl[0])
            dense_rows = gather_rows(H[0], hrows[0, 0])
            dense_reads = hreads[0, 0]
            if amb is not None:
                # ambiguity windows as extra dense sources, local to
                # this shard's edge range (engine.ambiguous_contrib
                # semantics, PlacementProcess.java:1129-1236)
                (alt_lrows, alt_hrows, alt_win, win_read,
                 win_inv_w, win_is_mean) = amb
                g = light_pairs[0][alt_lrows[0]]          # [n_alt, 2P]
                Pw = g.shape[1] // 2
                e_loc = jnp.clip(g[:, :Pw] - offs[0], 0, W - 1)
                d = jax.lax.bitcast_convert_type(g[:, Pw:], jnp.float32)
                rows_f = H[0][alt_hrows[0]].at[
                    jnp.arange(e_loc.shape[0])[:, None], e_loc].add(d)
                from rappas_tpu.place.engine import ambiguous_contrib
                contrib = ambiguous_contrib(rows_f, alt_win, win_inv_w,
                                            win_is_mean)  # [n_win, W]
                dpi = jax.lax.axis_index("dp")
                lr = win_read - dpi * B_loc
                mine = (lr >= 0) & (lr < B_loc)
                contrib = jnp.where(mine[:, None], contrib, 0.0)
                dense_rows = jnp.concatenate([dense_rows, contrib], 0)
                dense_reads = jnp.concatenate(
                    [dense_reads, jnp.where(mine, lr, B_loc - 1)], 0)
            te, ts, _, nm = finalize_postings_local(
                light_pairs[0], lrows, dense_rows, dense_reads, lengths,
                thr, offs[0], k, K,
                dense_rows.shape[0] <= B_loc // 2)
            # exact |L|: edges are partitioned across shards
            nm_tot = jax.lax.psum(nm, "mp")
            # exact global top-k over the gathered mp*K candidates;
            # each shard contributes min(K, local width) columns, so
            # clamp for tiny trees where that is below keep_at_most
            te_all = jax.lax.all_gather(te, "mp", axis=1, tiled=True)
            ts_all = jax.lax.all_gather(ts, "mp", axis=1, tiled=True)
            top_s, ti = jax.lax.top_k(ts_all, min(K, ts_all.shape[1]))
            top_e = jnp.take_along_axis(te_all, ti, axis=1)
            valid = jnp.isfinite(top_s)
            w = jnp.where(valid, jnp.exp2(
                (top_s - top_s[:, :1]) * np.float32(np.log2(10.0))), 0.0)
            lwr = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-30)
            return (jnp.where(valid, top_e, -1).astype(jnp.int32),
                    top_s, lwr, nm_tot)

        table_specs = (P("mp", None, None), P("mp", None), P("mp"),
                       P("mp", None, None), P("mp"))
        batch_specs = (P("dp", None), P("dp"),
                       P("dp", "mp", None), P("dp", "mp", None))
        out_specs = (P("dp", None), P("dp", None), P("dp", None),
                     P("dp"))
        # outputs are mp-replicated by construction (all_gather /
        # psum over "mp"), but the static vma checker can't infer
        # replication through the tiled all_gather
        self._step = jax.jit(shard_map(
            lambda *a: shard_body(*a, None), mesh=mesh,
            in_specs=table_specs + batch_specs,
            out_specs=out_specs, check_vma=False))
        amb_specs = (P("mp", None), P("mp", None), P(None), P(None),
                     P(None), P(None))
        self._step_amb = jax.jit(shard_map(
            lambda *a: shard_body(*a[:-6], a[-6:]), mesh=mesh,
            in_specs=table_specs + batch_specs + amb_specs,
            out_specs=out_specs, check_vma=False))

    # ---------------------------------------------------------------- #
    def _heavy_hits(self, codes: np.ndarray, lengths: np.ndarray):
        """Heavy hit compaction (host), organised per (dp, mp) device:
        rows int32[dp, mp, n_pad], reads int32[dp, mp, n_pad] with read
        ids local to the dp shard (each device sees only its slice of
        the batch inside shard_map)."""
        B, L = codes.shape
        dp = self.mesh.shape["dp"]
        B_loc = B // dp
        idx = host_kmer_indices(codes, lengths, self.k,
                                self.db.alphabet.n_states)

        mp = len(self._heavy_keys)
        per = {}
        n_max = 1
        for j, hk in enumerate(self._heavy_keys):
            nh = hk.shape[0]
            if nh == 0:
                continue
            pos = np.searchsorted(hk, idx)
            posc = np.minimum(pos, nh - 1)
            hit = (idx >= 0) & (pos < nh) & (hk[posc] == idx)
            b_ids, _ = np.nonzero(hit)
            r_ids = posc[hit].astype(np.int32)
            d_of = b_ids // B_loc
            for d in range(dp):
                sel = d_of == d
                per[d, j] = (r_ids[sel],
                             (b_ids[sel] - d * B_loc).astype(np.int32))
                n_max = max(n_max, int(sel.sum()))
        n_pad = max(64, 1 << int(np.ceil(np.log2(n_max))))
        rows = np.empty((dp, mp, n_pad), np.int32)
        reads = np.full((dp, mp, n_pad), B_loc - 1, np.int32)
        for j, hk in enumerate(self._heavy_keys):
            rows[:, j] = hk.shape[0]       # pad -> shard's zero miss row
        for (d, j), (r, b) in per.items():
            rows[d, j, :r.shape[0]] = r
            reads[d, j, :b.shape[0]] = b
        return rows, reads

    # ---------------------------------------------------------------- #
    def _map_amb(self, amb_host):
        """Host ambiguity spec (raw k-mer indices + window metadata,
        engine._expand_ambiguities_host) -> padded per-shard device
        inputs for ``_step_amb``."""
        kidx, alt_win, win_read, win_inv_w, is_mean = amb_host
        mp = len(self._light_keys)
        n_alt = kidx.shape[0]
        n_win = win_read.shape[0]
        na = max(8, 1 << int(np.ceil(np.log2(max(n_alt, 1)))))
        nw = max(8, 1 << int(np.ceil(np.log2(max(n_win + 1, 1)))))
        lrows = np.empty((mp, na), np.int32)
        hrows = np.empty((mp, na), np.int32)
        for j in range(mp):
            lk, hk = self._light_keys[j], self._heavy_keys[j]
            lrows[j] = lk.shape[0]            # pad -> shard miss row
            hrows[j] = hk.shape[0]
            lrows[j, :n_alt] = _searchsorted_rows(lk, kidx)
            hrows[j, :n_alt] = _searchsorted_rows(hk, kidx)
        aw = np.full(na, nw - 1, np.int32)    # pad alts -> pad window
        aw[:n_alt] = alt_win
        wr = np.zeros(nw, np.int32)
        wr[:n_win] = win_read
        wi = np.ones(nw, np.float32)
        wi[:n_win] = win_inv_w
        wm = np.ones(nw, bool)
        wm[:n_win] = is_mean
        sh = lambda *spec: jax.sharding.NamedSharding(self.mesh, P(*spec))
        return (jax.device_put(lrows, sh("mp", None)),
                jax.device_put(hrows, sh("mp", None)),
                jax.device_put(aw, sh()), jax.device_put(wr, sh()),
                jax.device_put(wi, sh()), jax.device_put(wm, sh()))

    def score_async(self, codes: np.ndarray, lengths: np.ndarray,
                    amb_host=None):
        """codes int8[B, L] (B divisible by dp); ``amb_host`` is the
        engine's host-side ambiguity expansion (or None)."""
        rows, reads = self._heavy_hits(codes, lengths)
        sh = lambda *spec: jax.sharding.NamedSharding(self.mesh, P(*spec))
        args = (self.light_pairs, self.rof, self.nl_dev, self.H,
                self.offs_dev,
                jax.device_put(codes, sh("dp", None)),
                jax.device_put(lengths, sh("dp")),
                jax.device_put(rows, sh("dp", "mp", None)),
                jax.device_put(reads, sh("dp", "mp", None)))
        if amb_host is None:
            return self._step(*args)
        return self._step_amb(*args, *self._map_amb(amb_host))

    def score(self, codes: np.ndarray, lengths: np.ndarray,
              amb_host=None) -> BatchResult:
        te, ts, lwr, nm = self.score_async(codes, lengths, amb_host)
        return BatchResult(np.asarray(te), np.asarray(ts),
                           np.asarray(lwr), np.asarray(nm))
