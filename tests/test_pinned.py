"""Pinned query (operators/retrieve.py:search_pinned): pin order beats
organic order, organic dedup, unknown-pin absence, per-query pin maps,
and the no-pins passthrough."""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import (process_queries,
                                               search_pinned, search_texts)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "apple apple apple"),
    ("d2", "apple apple pad"),
    ("d3", "apple pad pad"),
    ("d4", "pad pad pad"),     # no organic match
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pin") / "idx")
    df = spark.createDataFrame([(d, t, "eng") for d, t in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


def _plans(q="apple"):
    return process_queries([("q1", q)], RAW)


def test_pin_order_then_organic(spark, idx):
    res = search_pinned(spark, idx, _plans(), {"q1": ["d4", "d3"]},
                        RetrieveConfig(k=10)).collect()
    order = [r["doc_id"] for r in res]
    # d4 (no organic match!) first, d3 second in PIN order, then organic
    # d1, d2 with d3 deduplicated out of the organic tail
    assert order == ["d4", "d3", "d1", "d2"]
    assert res[0]["score"] > res[1]["score"] > res[2]["score"]
    organic = {r["doc_id"]: r["score"] for r in search_texts(
        spark, idx, [("q1", "apple")], RetrieveConfig(k=10),
        text_cfg=RAW).collect()}
    assert res[2]["score"] == organic["d1"]  # organic scores untouched


def test_unknown_pin_absent_and_no_pins_passthrough(spark, idx):
    res = search_pinned(spark, idx, _plans(), {"q1": ["nope", "d2"]},
                        RetrieveConfig(k=10)).collect()
    assert [r["doc_id"] for r in res] == ["d2", "d1", "d3"]
    plain = search_pinned(spark, idx, _plans(), {}, RetrieveConfig(k=10))
    base = search_texts(spark, idx, [("q1", "apple")],
                        RetrieveConfig(k=10), text_cfg=RAW)
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, base.collect()))


def test_pins_are_per_query(spark, idx):
    plans = process_queries([("q1", "apple"), ("q2", "apple")], RAW)
    res = search_pinned(spark, idx, plans, {"q2": ["d4"]},
                        RetrieveConfig(k=10))
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert by_q["q1"] == ["d1", "d2", "d3"]          # untouched
    assert by_q["q2"] == ["d4", "d1", "d2", "d3"]    # pinned only here
