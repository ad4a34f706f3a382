"""Filter-context search (operators/retrieve.py:search_filtered): scores
stay corpus-statistics (unchanged vs unfiltered run), filter-then-top-k
order surfaces docs ranked below k unfiltered, and docs missing from the
fields table are excluded."""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import (process_queries,
                                               search_filtered, search_texts)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "apple apple apple", "fruit"),
    ("d2", "apple apple pad", "fruit"),
    ("d3", "apple pad pad", "veg"),
    ("d4", "apple pad pad pad", "veg"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("filt") / "idx")
    df = spark.createDataFrame([(d, t, "eng") for d, t, _ in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


@pytest.fixture(scope="module")
def fields(spark):
    return spark.createDataFrame([(d, c) for d, _, c in DOCS],
                                 "doc_id string, cat string")


def test_scores_unchanged_and_below_k_surfaces(spark, idx, fields):
    plans = process_queries([("q1", "apple")], RAW)
    # unfiltered k=2 keeps d1, d2 only; the veg filter must surface d3/d4
    res = search_filtered(spark, idx, plans, fields, "cat = 'veg'",
                          RetrieveConfig(k=2))
    rows = {r["doc_id"]: (r["rank"], r["score"]) for r in res.collect()}
    assert set(rows) == {"d3", "d4"}
    full = search_texts(spark, idx, [("q1", "apple")],
                        RetrieveConfig(k=10), text_cfg=RAW)
    unfiltered = {r["doc_id"]: r["score"] for r in full.collect()}
    for d, (_, s) in rows.items():
        assert s == unfiltered[d]  # filter never touches the score
    assert rows["d3"][0] == 0 and rows["d4"][0] == 1


def test_missing_from_fields_excluded(spark, idx, fields):
    plans = process_queries([("q1", "apple")], RAW)
    partial = fields.where(F.col("doc_id") != "d1")
    res = search_filtered(spark, idx, plans, partial, "cat = 'fruit'",
                          RetrieveConfig(k=10))
    assert [r["doc_id"] for r in res.collect()] == ["d2"]


def test_column_predicate_accepted(spark, idx, fields):
    plans = process_queries([("q1", "apple")], RAW)
    res = search_filtered(spark, idx, plans, fields,
                          F.col("cat") == "fruit", RetrieveConfig(k=10))
    assert {r["doc_id"] for r in res.collect()} == {"d1", "d2"}
