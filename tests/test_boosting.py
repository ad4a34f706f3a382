"""Boosting query and constant_score (operators/retrieve.py): demotion
reorders but never excludes, negative scores are discarded, boost=0 edge,
constant-score tie order, and validation."""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import (process_queries,
                                               search_boosting,
                                               search_constant_score,
                                               search_texts)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "apple apple apple spam"),   # best text match, but spammy
    ("d2", "apple apple pad pad"),
    ("d3", "apple pad pad pad"),
    ("d4", "pad pad pad pad"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("boost") / "idx")
    df = spark.createDataFrame([(d, t, "eng") for d, t in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


def _plans(q):
    return process_queries([("q1", q)], RAW)


def test_demotes_but_never_excludes(spark, idx):
    base = {r["doc_id"]: r["score"] for r in search_texts(
        spark, idx, [("q1", "apple")], RetrieveConfig(k=10),
        text_cfg=RAW).collect()}
    res = search_boosting(spark, idx, _plans("apple"), _plans("spam"),
                          RetrieveConfig(k=10), negative_boost=0.1)
    rows = {r["doc_id"]: (r["rank"], r["score"]) for r in res.collect()}
    assert set(rows) == {"d1", "d2", "d3"}       # d1 demoted, not dropped
    assert rows["d1"][1] == pytest.approx(base["d1"] * 0.1)
    assert rows["d2"][1] == base["d2"]           # non-matching untouched
    assert [d for d, v in sorted(rows.items(), key=lambda kv: kv[1][0])] \
        == ["d2", "d3", "d1"]                    # demotion reordered


def test_negative_boost_zero_keeps_doc_at_zero(spark, idx):
    res = search_boosting(spark, idx, _plans("apple"), _plans("spam"),
                          RetrieveConfig(k=10), negative_boost=0.0)
    rows = {r["doc_id"]: r["score"] for r in res.collect()}
    assert rows["d1"] == 0.0 and len(rows) == 3


def test_negative_boost_validation(spark, idx):
    with pytest.raises(ValueError, match="negative_boost"):
        search_boosting(spark, idx, _plans("apple"), _plans("spam"),
                        negative_boost=1.0)


def test_constant_score_tie_order_and_k(spark, idx):
    res = search_constant_score(spark, idx, _plans("apple"),
                                RetrieveConfig(k=2), boost=2.5)
    rows = res.collect()
    assert [(r["doc_id"], r["rank"], r["score"]) for r in rows] == [
        ("d1", 0, 2.5), ("d2", 1, 2.5)]  # docid asc (external-id order), k cut
