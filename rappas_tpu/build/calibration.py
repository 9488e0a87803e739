"""Score calibration: a noise floor from random sequences.

The reference ships this feature broken: ``processCalibration`` ends in
``throw new UnsupportedOperationException()``
(``/root/reference/src/core/algos/PlacementProcess.java:354``, dead since
the Guava Quantiles removal) and is off by default.  This is a working
implementation of the intent: score a large sample of random reads
(gaussian length around the mean read length, seed 1, mirroring
``RandomSeqGenerator.java:43-53``) against the DB and take a high
quantile of their best scores as a lower bound -- placements scoring
below it are indistinguishable from noise and filtered like ``--nsbound``
(``PlacementProcess.java:937``).

The scoring runs through the batched TPU engine, so 10^5-10^6 random
reads take seconds, where the reference's design (1M serial lookups) was
a multi-minute step.
"""

from __future__ import annotations

import numpy as np

from rappas_tpu.db import PhyloKmerDB

#: reference protocol (Main_DBBUILD_3.java:174-181): 1M samples, 99th of
#: 100-quantiles; amino runs 10x the samples at length/3
DEFAULT_SAMPLES = 1_000_000
DEFAULT_MEAN_LEN = 150
DEFAULT_QUANTILE = 0.99


def calibrate(db: PhyloKmerDB, n_samples: int | None = None,
              mean_length: int | None = None,
              quantile: float = DEFAULT_QUANTILE, seed: int = 1,
              batch_size: int = 8192, engine=None) -> float:
    """Return the calibrated best-score noise bound (also stored in
    ``db.meta['calibration_ns_bound']``).

    Defaults follow the reference protocol exactly
    (``Main_DBBUILD_3.java:174-181``): 1M random reads of mean length
    150 for DNA; 10M reads of mean length 50 for amino.  Tests pass a
    small ``n_samples`` explicitly.
    """
    from rappas_tpu.place.engine import PlacementEngine

    if n_samples is None:
        n_samples = DEFAULT_SAMPLES if db.alphabet.name == "nucl" \
            else DEFAULT_SAMPLES * 10
    if mean_length is None:
        mean_length = DEFAULT_MEAN_LEN if db.alphabet.name == "nucl" \
            else DEFAULT_MEAN_LEN // 3
    engine = engine or PlacementEngine(db, treat_ambiguities=False)
    rng = np.random.default_rng(seed)
    sd = mean_length * 0.1
    letters = np.frombuffer(db.alphabet.letters.encode(), np.uint8)
    best: list[np.ndarray] = []
    n_done = 0
    L_max = int(mean_length + 5 * sd)
    while n_done < n_samples:
        b = min(batch_size, n_samples - n_done)
        lens = np.clip(np.rint(rng.normal(mean_length, sd, b)),
                       db.k, L_max).astype(np.int32)
        mat = letters[rng.integers(0, db.alphabet.n_states,
                                   (b, L_max))].astype(np.uint8)
        res = engine.score(mat, lens)
        placed = res.n_matched > 0
        if placed.any():
            best.append(res.top_scores[placed, 0])
        n_done += b
    if not best:
        bound = float("-inf")
    else:
        bound = float(np.quantile(np.concatenate(best), quantile))
    db.meta["calibration_ns_bound"] = bound
    return bound
