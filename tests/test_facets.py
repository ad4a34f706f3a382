"""Distributed facet counts (operators/facets.py) — Lucene facets-module
semantics over the FULL matching set: build-time dictionary-encoded
per-shard code blobs (the norms_packed layout), query-time bincount under
the search-semantics candidate mask. Counts are checked against a
hand-computable corpus and against search() itself (the facet total for a
query must equal its count_only total when every doc has an attribute).
"""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.facets import (build_facet_sidecar,
                                             facet_counts_texts)
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("f1", "alpha beta pad pad pad", "eng"),    # site A
    ("f2", "alpha pad pad pad pad", "eng"),     # site A
    ("f3", "alpha beta gamma pad pad", "eng"),  # site B
    ("f4", "beta pad pad pad pad", "eng"),      # site B
    ("f5", "gamma pad pad pad pad", "eng"),     # site C
    ("f6", "alpha gamma pad pad pad", "eng"),   # no attribute row
]
SITES = [("f1", "A"), ("f2", "A"), ("f3", "B"), ("f4", "B"), ("f5", "C")]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("facets") / "idx")
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    keys = spark.createDataFrame(SITES, "id string, site string")
    build_facet_sidecar(spark, path, keys, "site",
                        id_col="id", key_col="site")
    return path


def _counts(spark, idx, q, mode="boolean", **cfg):
    res = facet_counts_texts(spark, idx, [("q", q)], "site",
                             cfg=RetrieveConfig(**cfg) if cfg else None,
                             text_cfg=RAW, mode=mode)
    return {(r["query_id"], r["key"]): r["count"] for r in res.collect()}


def test_or_query_counts_full_match_set(spark, idx):
    # alpha OR beta matches f1-f4 (+f6, uncounted: no attribute)
    got = _counts(spark, idx, "alpha beta")
    assert got == {("q", "A"): 2, ("q", "B"): 2}


def test_must_and_not(spark, idx):
    got = _counts(spark, idx, "alpha AND beta")   # f1, f3
    assert got == {("q", "A"): 1, ("q", "B"): 1}
    got = _counts(spark, idx, "gamma NOT alpha")  # f5 (f3/f6 have alpha)
    assert got == {("q", "C"): 1}


def test_min_should_match_applies(spark, idx):
    got = _counts(spark, idx, "alpha beta gamma", min_should_match=2)
    # ≥2 of the three: f1 (a,b) A, f3 (a,b,g) B; f6 (a,g) has no attribute
    assert got == {("q", "A"): 1, ("q", "B"): 1}


def test_wildcard_expansion_flows_through(spark, idx):
    got = _counts(spark, idx, "alph* OR gamma")
    # alpha|gamma docs: f1,f2 A; f3 B; f5 C (f6 uncounted)
    assert got == {("q", "A"): 2, ("q", "B"): 1, ("q", "C"): 1}


def test_total_equals_count_only_when_fully_keyed(spark, idx):
    # over docs that all carry an attribute, Σ facet counts == total hits
    q = "beta"   # f1, f3, f4 — all keyed
    got = _counts(spark, idx, q)
    total = search_texts(spark, idx, [("q", q)], RetrieveConfig(k=10),
                         text_cfg=RAW, mode="boolean")
    assert sum(got.values()) == total.count()


def test_no_match_returns_empty(spark, idx):
    assert _counts(spark, idx, "zzz") == {}


def test_ordering_count_desc_key_asc(spark, idx):
    res = facet_counts_texts(spark, idx, [("q", "alpha beta gamma")],
                             "site", text_cfg=RAW, mode="boolean")
    rows = [(r["key"], r["count"]) for r in res.collect()]
    assert rows == [("A", 2), ("B", 2), ("C", 1)]


def test_cardinality_cap_raises(spark, idx, tmp_path):
    keys = spark.createDataFrame([(d, f"s{i}") for i, (d, _t, _l)
                                  in enumerate(DOCS)],
                                 "id string, site string")
    with pytest.raises(ValueError, match="distinct"):
        build_facet_sidecar(spark, idx, keys, "toomany",
                            id_col="id", key_col="site", max_cardinality=3)


class TestFilteredFacets:
    """dv_filter on facet_counts (new r5): ES filtered aggregation —
    the counted set is additionally masked by a doc-values range."""

    @pytest.fixture(scope="class")
    def vidx(self, spark, idx):
        from patapsco_spark.operators.facets import build_value_sidecar
        vals = spark.createDataFrame(
            [("f1", 10.0), ("f2", 20.0), ("f3", 30.0), ("f4", 40.0),
             ("f5", 50.0)],  # f6 has no value
            "id string, v double")
        build_value_sidecar(spark, idx, vals, "score_v",
                            id_col="id", value_col="v")
        return idx

    def test_range_restricts_counts(self, spark, vidx):
        from patapsco_spark.operators.facets import facet_counts_texts
        # alpha OR beta matches f1-f4 (+f6 uncounted); v in [15, 35]
        # keeps f2 (A, 20) and f3 (B, 30)
        res = facet_counts_texts(spark, vidx, [("q", "alpha beta")],
                                 "site", text_cfg=RAW, mode="boolean",
                                 dv_filter=("score_v", 15.0, 35.0))
        got = {(r["query_id"], r["key"]): r["count"] for r in res.collect()}
        assert got == {("q", "A"): 1, ("q", "B"): 1}

    def test_open_bound_and_missing_value(self, spark, vidx):
        from patapsco_spark.operators.facets import facet_counts_texts
        # gamma matches f3 (30), f5 (50), f6 (missing value AND no site);
        # v >= 40 keeps f5 only
        res = facet_counts_texts(spark, vidx, [("q", "gamma")],
                                 "site", text_cfg=RAW, mode="boolean",
                                 dv_filter=("score_v", 40.0, None))
        got = {(r["query_id"], r["key"]): r["count"] for r in res.collect()}
        assert got == {("q", "C"): 1}

    def test_unfiltered_unchanged(self, spark, vidx):
        from patapsco_spark.operators.facets import facet_counts_texts
        res = facet_counts_texts(spark, vidx, [("q", "alpha beta")],
                                 "site", text_cfg=RAW, mode="boolean")
        got = {(r["query_id"], r["key"]): r["count"] for r in res.collect()}
        assert got == {("q", "A"): 2, ("q", "B"): 2}
