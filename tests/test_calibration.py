import numpy as np

from rappas_tpu.build.calibration import calibrate
from tests.test_engine import synthetic_db


def test_calibration_bound():
    db = synthetic_db(seed=4, k=5, n_edges=8, n_kmers=500)
    bound = calibrate(db, n_samples=2000, mean_length=40,
                      batch_size=512)
    assert np.isfinite(bound)
    assert db.meta["calibration_ns_bound"] == bound
    # bound should sit in the range of plausible scores: above the
    # all-miss floor Q*thr for typical lengths
    q = 40 - db.k + 1
    assert bound > q * float(db.thr_log10)


def test_calibration_deterministic():
    db = synthetic_db(seed=4, k=5, n_edges=8, n_kmers=500)
    b1 = calibrate(db, n_samples=1000, mean_length=30, batch_size=256)
    b2 = calibrate(db, n_samples=1000, mean_length=30, batch_size=256)
    assert b1 == b2
