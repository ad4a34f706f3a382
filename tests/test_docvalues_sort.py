"""Doc-values sort (operators/facets.py sort_values_topk): kernel-level
top-k by a numeric per-shard float64 blob — the scale path of
aggs.sort_by_field (Lucene Sort over NumericDocValues). Checked against a
hand-computable corpus and against the exact full-match-set sort."""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.facets import (build_value_sidecar,
                                             sort_values_topk)
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import parse_query

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("v1", "alpha beta pad", "eng"),
    ("v2", "alpha pad pad", "eng"),
    ("v3", "alpha beta gamma", "eng"),
    ("v4", "beta pad pad", "eng"),
    ("v5", "gamma pad pad", "eng"),
    ("v6", "alpha gamma pad", "eng"),   # no value row -> excluded
]
VALS = [("v1", 30.0), ("v2", 10.0), ("v3", 20.0), ("v4", 40.0),
        ("v5", 20.0)]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dv") / "idx")
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    vals = spark.createDataFrame(VALS, "id string, v double")
    build_value_sidecar(spark, path, vals, "recency",
                        id_col="id", value_col="v")
    return path


def _sorted(spark, idx, q, **kw):
    plan = parse_query("q", q, mode="boolean")
    res = sort_values_topk(spark, idx, [plan], "recency", **kw)
    return [(r["doc_id"], r["rank"], r["value"]) for r in res.collect()]


def test_desc_sort_and_missing_excluded(spark, idx):
    # alpha matches v1, v2, v3, v6; v6 has no value -> excluded
    got = _sorted(spark, idx, "alpha", k=10)
    assert got == [("v1", 0, 30.0), ("v3", 1, 20.0), ("v2", 2, 10.0)]


def test_asc_sort(spark, idx):
    got = _sorted(spark, idx, "alpha", k=10, ascending=True)
    assert got == [("v2", 0, 10.0), ("v3", 1, 20.0), ("v1", 2, 30.0)]


def test_k_cut_is_global_not_per_shard(spark, idx):
    got = _sorted(spark, idx, "alpha beta gamma", k=2)
    # full match set v1-v6; best two by value desc: v4 (40), v1 (30)
    assert got == [("v4", 0, 40.0), ("v1", 1, 30.0)]


def test_tie_breaks_on_docid(spark, idx):
    # v3 and v5 tie at 20.0 -> external-id (docid) order
    got = _sorted(spark, idx, "gamma", k=10)
    assert got == [("v3", 0, 20.0), ("v5", 1, 20.0)]


def test_boolean_semantics(spark, idx):
    got = _sorted(spark, idx, "alpha NOT beta", k=10)
    assert got == [("v2", 0, 10.0)]   # v6 matches but has no value


def test_matches_exact_full_sort(spark, idx):
    from patapsco_spark.operators.aggs import match_set, sort_by_field
    plan = parse_query("q", "alpha beta", mode="boolean")
    matches = match_set(spark.sparkContext and spark, idx, [plan])
    vals = spark.createDataFrame(VALS, "doc_id string, v double")
    exact = [(r["doc_id"], r["rank"])
             for r in sort_by_field(matches, vals, "v", k=3,
                                    id_col="doc_id").collect()]
    fast = [(d, r) for d, r, _v in _sorted(spark, idx, "alpha beta", k=3)]
    assert fast == exact


def test_span_first_refused(spark, idx):
    from patapsco_spark.operators.queryparse import span_first_plan
    with pytest.raises(ValueError, match="span_first"):
        sort_values_topk(spark, idx,
                         [span_first_plan("q", [("alpha", 2)])], "recency")
