"""Federated multi-index search (operators/federate.py): combined-stats
scoring must equal a single merged index bit-for-bit, local-stats scoring
must NOT (the bug class the operator exists to prevent), and the guard
rails must reject what the override cannot score."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.federate import (combined_stats,
                                               search_federated_texts)
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

# 'alpha' is common in the a-half, rare in the b-half: local idf would
# score the two halves inconsistently — the signature federation bug
DOCS_A = [
    ("a1", "alpha beta pad pad pad pad"),
    ("a2", "alpha pad pad pad"),
    ("a3", "alpha gamma pad pad pad pad pad"),
    ("a4", "beta pad pad pad pad"),
]
DOCS_B = [
    ("b1", "alpha beta pad pad pad"),
    ("b2", "gamma pad pad pad pad pad"),
    ("b3", "beta gamma pad pad"),
    ("b4", "delta pad pad pad pad pad pad"),
]
QUERIES = [("q1", "alpha beta"), ("q2", "gamma delta")]


def _build(spark, path, docs, shards):
    df = spark.createDataFrame([(i, t, "eng") for i, t in docs],
                               "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=shards))
    return path


@pytest.fixture(scope="module")
def idxs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fed")
    return {
        "a": _build(spark, str(root / "a"), DOCS_A, 2),
        "b": _build(spark, str(root / "b"), DOCS_B, 2),
        "all": _build(spark, str(root / "all"), DOCS_A + DOCS_B, 3),
    }


@pytest.mark.parametrize("scorer", ["bm25", "qld"])
def test_federated_equals_merged_index(spark, idxs, scorer):
    cfg = RetrieveConfig(name=scorer, k=8)
    fed = search_federated_texts(spark, [idxs["a"], idxs["b"]], QUERIES,
                                 cfg, text_cfg=RAW).collect()
    one = search_texts(spark, idxs["all"], QUERIES, cfg,
                       text_cfg=RAW).collect()
    fm = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"]) for r in fed}
    om = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"]) for r in one}
    assert fm.keys() == om.keys()
    for key, (rank, score) in fm.items():
        assert rank == om[key][0], key
        assert score == om[key][1], key  # bit-equal: same kernel, same stats


def test_local_stats_would_differ(spark, idxs):
    """Sanity that the test can detect the bug: naive per-index scoring
    (local stats) disagrees with the merged index on these corpora."""
    cfg = RetrieveConfig(k=8)
    local = {}
    for p in (idxs["a"], idxs["b"]):
        for r in search_texts(spark, p, QUERIES, cfg, text_cfg=RAW).collect():
            local[(r["query_id"], r["doc_id"])] = r["score"]
    one = {(r["query_id"], r["doc_id"]): r["score"]
           for r in search_texts(spark, idxs["all"], QUERIES, cfg,
                                 text_cfg=RAW).collect()}
    assert any(not math.isclose(local[k], one[k], rel_tol=1e-9)
               for k in one)


def test_combined_stats_values(spark, idxs):
    st = combined_stats(spark, [idxs["a"], idxs["b"]], ["alpha", "delta"])
    assert st["num_docs"] == 8
    assert st["df_map"]["alpha"] == (4, 4)
    assert st["df_map"]["delta"] == (1, 1)


def test_multiterm_rejected_under_override(spark, idxs):
    from patapsco_spark.operators.retrieve import process_queries, search
    plans = process_queries([("q1", "alp*")], RAW, mode="boolean")
    st = combined_stats(spark, [idxs["a"], idxs["b"]], [])
    with pytest.raises(ValueError, match="multiterm"):
        search(spark, idxs["a"], plans, RetrieveConfig(k=5),
               stats_override=st)
