"""SemDeDup (operators/dedup.semdedup, Abbas et al. 2023): cluster
embeddings with the deterministic ivf_build Lloyd, remove every vector with
cosine ≥ threshold against a lower-id cluster-mate. Pinned against a numpy
replay of the exact same algorithm (same init, same tie-breaks), plus
structural invariants: kept ∪ removed partitions the input, anchors are
lower ids, and planted duplicates die while their anchors survive.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators.dedup import semdedup

N, DIM, CELLS, T = 80, 8, 2, 0.999


def _mk_vectors():
    X = np.random.default_rng(123).standard_normal((N, DIM))
    # plant near-dups: 70+i is a tiny perturbation of i (i = 0..4) —
    # cosine ≈ 1, far above T, and (being higher-id) must be the one removed
    for i in range(5):
        X[70 + i] = X[i] + 1e-6
    return X


@pytest.fixture(scope="module")
def emb(spark):
    X = _mk_vectors()
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_dups_removed_anchors_kept(spark, emb):
    kept, removed = semdedup(emb, n_cells=CELLS, iters=2, threshold=T,
                             seed=5, id_col="vec_id")
    rem = {r["vec_id"]: r["anchor_id"] for r in removed.collect()}
    kept_ids = {r["vec_id"] for r in kept.collect()}
    for i in range(5):
        assert 70 + i in rem and rem[70 + i] == i   # clone dies, original is anchor
        assert i in kept_ids
    # partition invariant
    assert kept_ids | set(rem) == set(range(N))
    assert kept_ids.isdisjoint(rem)


def test_anchor_is_always_lower_id(spark, emb):
    _, removed = semdedup(emb, n_cells=CELLS, iters=2, threshold=0.5,
                          seed=5, id_col="vec_id")
    for r in removed.collect():
        assert r["anchor_id"] < r["vec_id"]
        assert r["cos"] >= 0.5


def test_threshold_one_plus_removes_nothing(spark, emb):
    kept, removed = semdedup(emb, n_cells=CELLS, iters=2, threshold=1.01,
                             seed=5, id_col="vec_id")
    assert removed.count() == 0 and kept.count() == N


def test_matches_numpy_replay(spark, emb):
    """Full-algorithm identity: same md5-ordered sample init, same Lloyd,
    same within-cell lower-id rule."""
    import hashlib

    from patapsco_spark.operators.ann import ivf_sample_size

    X = _mk_vectors()
    ids = np.arange(N)
    order = np.argsort([hashlib.md5(str(i).encode()).hexdigest()
                        for i in ids])
    S = min(ivf_sample_size(CELLS), N)
    sample = X[order[:S]]
    rng = np.random.default_rng(5)
    cents = sample[rng.choice(len(sample), size=CELLS, replace=False)]
    for _ in range(2):
        d2 = ((X[:, None, :] - cents[None]) ** 2).sum(-1)
        cell = d2.argmin(1)
        for c in range(CELLS):
            m = cell == c
            if m.any():
                cents[c] = X[m].mean(0)
    cell = ((X[:, None, :] - cents[None]) ** 2).sum(-1).argmin(1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = set()
    for c in range(CELLS):
        m = np.where(cell == c)[0]
        G = Xn[m] @ Xn[m].T
        for j in range(1, len(m)):
            if G[j, :j].max() >= 0.6:
                want.add(int(m[j]))
    _, removed = semdedup(emb, n_cells=CELLS, iters=2, threshold=0.6,
                          seed=5, id_col="vec_id")
    got = {r["vec_id"] for r in removed.collect()}
    assert got == want
