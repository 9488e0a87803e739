"""On-device smoke tests (opt-in): run one batch of every table mode on
the REAL backend so backend-specific numerics (subnormal flush-to-zero,
sub-32-bit gather paths) are exercised before the benchmark is
(VERDICT round 1, weak #6 / next #10).

The main suite pins the CPU backend (tests/conftest.py); these tests
run only when RAPPAS_TPU_DEVICE_TESTS=1 is set, in a SEPARATE pytest
invocation (the CPU pin is process-wide):

    RAPPAS_TPU_DEVICE_TESTS=1 python -m pytest tests/test_device_smoke.py -q -p no:cacheprovider

Keep it to one process at a time: the tunneled TPU is exclusive and
pays a one-off handshake on the first device->host fetch.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RAPPAS_TPU_DEVICE_TESTS") != "1",
    reason="set RAPPAS_TPU_DEVICE_TESTS=1 to run on the real device")


@pytest.fixture(scope="module")
def real_device():
    import jax
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        pytest.skip("no accelerator attached")
    return dev


@pytest.fixture(scope="module")
def db():
    from tests.test_engine import synthetic_db
    return synthetic_db(seed=5, k=5, n_edges=10, n_kmers=700)


@pytest.mark.parametrize("table", ["direct", "compact", "postings"])
def test_table_mode_matches_oracle_on_device(db, real_device, table):
    from rappas_tpu.place.engine import PlacementEngine
    from tests.test_engine import compare, random_reads
    engine = PlacementEngine(db, table=table)
    rng = np.random.default_rng(77)
    compare(db, engine, random_reads(12, rng, with_amb=0.5))


def test_threshold_grade_delta_survives_ftz(real_device):
    """Regression for the round-1 subnormal bug: a posting stored at
    exactly the threshold (delta == DELTA_TINY) must stay matched on a
    flush-to-zero backend in every table mode."""
    from rappas_tpu.alphabet import DNA
    from rappas_tpu.db import DELTA_TINY, PhyloKmerDB, build_csr
    from rappas_tpu.place.engine import PlacementEngine
    from rappas_tpu.tree import parse_newick
    import jax.numpy as jnp

    # DELTA_TINY itself must not flush on this backend
    assert float(jnp.float32(DELTA_TINY) + jnp.float32(0.0)) > 0.0

    k = 4
    tree = parse_newick("(A:0.1,B:0.2,C:0.3)root;")
    tree.reset_jplace_edge_ids()
    thr = PhyloKmerDB.threshold(k, 1.5, 4)
    codes = np.array([7, 7], np.int64)
    edges = np.array([1, 2], np.int32)
    scores = np.array([thr, thr + 1.0], np.float32)  # edge 1: threshold
    keys, offsets, e, d = build_csr(codes, edges, scores, thr)
    db = PhyloKmerDB(k=k, omega=1.5, alphabet=DNA, thr_log10=thr,
                     tree=tree, keys=keys, offsets=offsets, edges=e,
                     deltas=d)
    word = DNA.kmer_to_string(7, k)
    mat = np.frombuffer(word.encode(), np.uint8)[None, :].copy()
    lens = np.array([k], np.int32)
    for table in ("direct", "compact", "postings"):
        res = PlacementEngine(db, table=table).score(mat, lens)
        assert res.n_matched[0] == 2, f"{table}: threshold match dropped"
        got = sorted(int(x) for x in res.top_edges[0] if x >= 0)
        assert got == [1, 2], table
