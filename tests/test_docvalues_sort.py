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


class TestDvFilter:
    """Kernel-level doc-values range filter (search(dv_filter=...)): ES
    bool.filter semantics — membership restricted, scores untouched."""

    @staticmethod
    def _search(spark, idx, q, dv, **cfg):
        from patapsco_spark.operators.retrieve import search
        plan = parse_query("q", q, mode="boolean")
        res = search(spark, idx, [plan], RetrieveConfig(k=10, **cfg),
                     dv_filter=dv)
        return {r["doc_id"]: r["score"] for r in res.collect()}

    def test_range_masks_membership_not_scores(self, spark, idx):
        from patapsco_spark.operators.retrieve import search
        plan = parse_query("q", "alpha", mode="boolean")
        base = {r["doc_id"]: r["score"]
                for r in search(spark, idx, [plan],
                                RetrieveConfig(k=10)).collect()}
        # alpha matches v1(30), v2(10), v3(20), v6(missing)
        got = self._search(spark, idx, "alpha", ("recency", 15.0, 35.0))
        assert set(got) == {"v1", "v3"}
        for d in got:   # scores = unrestricted corpus-stats values
            assert got[d] == base[d]

    def test_open_bounds(self, spark, idx):
        got = self._search(spark, idx, "alpha", ("recency", None, 15.0))
        assert set(got) == {"v2"}
        got = self._search(spark, idx, "alpha", ("recency", 25.0, None))
        assert set(got) == {"v1"}

    def test_missing_value_never_matches(self, spark, idx):
        # unbounded-on-both-ends-but-present is expressed as a huge range:
        # v6 (no value row) must still be excluded
        got = self._search(spark, idx, "alpha", ("recency", -1e18, 1e18))
        assert set(got) == {"v1", "v2", "v3"}

    def test_agrees_with_search_filtered(self, spark, idx):
        from patapsco_spark.operators.retrieve import (search_filtered,
                                                       search)
        plan = parse_query("q", "alpha beta", mode="boolean")
        fields = spark.createDataFrame(VALS, "doc_id string, v double")
        exact = {(r["doc_id"], r["rank"]): r["score"]
                 for r in search_filtered(
                     spark, idx, [plan], fields, "v >= 15.0 AND v <= 35.0",
                     RetrieveConfig(k=10)).collect()}
        fast = {(r["doc_id"], r["rank"]): r["score"]
                for r in search(spark, idx, [plan], RetrieveConfig(k=10),
                                dv_filter=("recency", 15.0, 35.0)).collect()}
        assert fast == exact

    def test_count_only_composes(self, spark, idx):
        from patapsco_spark.operators.retrieve import search
        plan = parse_query("q", "alpha", mode="boolean")
        res = search(spark, idx, [plan], RetrieveConfig(k=10),
                     count_only=True, dv_filter=("recency", 15.0, 35.0))
        assert [(r["query_id"], r["total_hits"])
                for r in res.collect()] == [("q", 2)]

    def test_both_bounds_none_rejected(self, spark, idx):
        with pytest.raises(ValueError, match="at least one bound"):
            self._search(spark, idx, "alpha", ("recency", None, None))


class TestValueHistogram:
    """Kernel-level histogram over doc values (facets.value_histogram):
    ES histogram semantics, counts agree with the exact match-set agg."""

    def test_hand_computed(self, spark, idx):
        from patapsco_spark.operators.facets import value_histogram
        plan = parse_query("q", "alpha beta gamma", mode="boolean")
        res = value_histogram(spark, idx, [plan], "recency", 15.0)
        got = {(r["query_id"], r["bucket"]): r["count"]
               for r in res.collect()}
        # values: v1=30, v2=10, v3=20, v4=40, v5=20 (v6 missing, unbucketed)
        # buckets @15: 10->0, 20->15, 20->15, 30->30, 40->30
        assert got == {("q", 0.0): 1, ("q", 15.0): 2, ("q", 30.0): 2}

    def test_agrees_with_exact_field_histogram(self, spark, idx):
        from patapsco_spark.operators.aggs import (field_histogram,
                                                   match_set)
        from patapsco_spark.operators.facets import value_histogram
        plan = parse_query("q", "alpha", mode="boolean")
        vals = spark.createDataFrame(VALS, "doc_id string, v double")
        exact = {(r["query_id"], r["bucket"]): r["cnt"]
                 for r in field_histogram(
                     match_set(spark, idx, [plan]), vals, "v",
                     12.5, id_col="doc_id").collect()}
        fast = {(r["query_id"], r["bucket"]): r["count"]
                for r in value_histogram(spark, idx, [plan], "recency",
                                         12.5).collect()}
        assert fast == exact

    def test_bad_interval_rejected(self, spark, idx):
        from patapsco_spark.operators.facets import value_histogram
        with pytest.raises(ValueError, match="interval"):
            value_histogram(spark, idx,
                            [parse_query("q", "alpha", mode="boolean")],
                            "recency", 0.0)


def test_sort_composes_with_dv_filter(spark, idx):
    from patapsco_spark.operators.facets import sort_values_topk
    plan = parse_query("q", "alpha beta gamma", mode="boolean")
    # match set v1-v6; filter to recency in [15, 35] -> v1(30), v3(20),
    # v5(20); sort desc: v1, then v3/v5 tie -> docid order
    res = sort_values_topk(spark, idx, [plan], "recency", k=10,
                           dv_filter=("recency", 15.0, 35.0))
    got = [(r["doc_id"], r["value"]) for r in res.collect()]
    assert got == [("v1", 30.0), ("v3", 20.0), ("v5", 20.0)]


def test_histogram_composes_with_dv_filter(spark, idx):
    from patapsco_spark.operators.facets import value_histogram
    plan = parse_query("q", "alpha beta gamma", mode="boolean")
    res = value_histogram(spark, idx, [plan], "recency", 15.0,
                          dv_filter=("recency", 15.0, 35.0))
    got = {r["bucket"]: r["count"] for r in res.collect()}
    assert got == {15.0: 2, 30.0: 1}


class TestDvBoost:
    """Exact kernel-level function_score decay (search(dv_boost=...)):
    factor per candidate, ES decay formulas, missing value = factor 1."""

    @staticmethod
    def _scores(spark, idx, q, boost, **kw):
        from patapsco_spark.operators.retrieve import search
        plan = parse_query("q", q, mode="boolean")
        res = search(spark, idx, [plan], RetrieveConfig(k=10),
                     dv_boost=boost, **kw)
        return {r["doc_id"]: r["score"] for r in res.collect()}

    def test_gauss_multiply_hand_computed(self, spark, idx):
        import math
        from patapsco_spark.operators.retrieve import search
        plan = parse_query("q", "alpha", mode="boolean")
        base = {r["doc_id"]: r["score"]
                for r in search(spark, idx, [plan],
                                RetrieveConfig(k=10)).collect()}
        got = self._scores(spark, idx, "alpha",
                           ("recency", {"origin": 30.0, "scale": 10.0}))
        sigma2 = -(10.0 * 10.0) / (2.0 * math.log(0.5))
        def f(x):
            d = max(abs(x - 30.0), 0.0)
            return math.exp(-(d * d) / (2.0 * sigma2))
        # v1=30 (factor 1), v2=10, v3=20; v6 missing -> factor 1
        vals = {"v1": 30.0, "v2": 10.0, "v3": 20.0}
        for d, x in vals.items():
            assert got[d] == pytest.approx(base[d] * f(x), rel=1e-12)
        assert got["v6"] == pytest.approx(base["v6"], rel=1e-12)

    def test_sum_mode_linear(self, spark, idx):
        from patapsco_spark.operators.retrieve import search
        plan = parse_query("q", "alpha", mode="boolean")
        base = {r["doc_id"]: r["score"]
                for r in search(spark, idx, [plan],
                                RetrieveConfig(k=10)).collect()}
        got = self._scores(spark, idx, "alpha",
                           ("recency", {"origin": 30.0, "scale": 20.0,
                                        "shape": "linear", "mode": "sum",
                                        "weight": 5.0}))
        s = 20.0 / (1.0 - 0.5)   # = 40
        def f(x):
            return max((s - abs(x - 30.0)) / s, 0.0)
        for d, x in (("v1", 30.0), ("v2", 10.0), ("v3", 20.0)):
            assert got[d] == pytest.approx(base[d] + 5.0 * f(x), rel=1e-12)

    def test_agrees_with_rescore_decay_at_full_depth(self, spark, idx):
        from patapsco_spark.operators.retrieve import (search_with_decay,
                                                       search)
        plan = parse_query("q", "alpha beta", mode="boolean")
        fields = spark.createDataFrame(VALS, "doc_id string, v double")
        exact = {(r["doc_id"], r["rank"]): r["score"]
                 for r in search_with_decay(
                     spark, idx, [plan], fields, RetrieveConfig(k=10),
                     origin=30.0, scale=10.0, field_col="v").collect()}
        fast = {(r["doc_id"], r["rank"]): r["score"]
                for r in search(spark, idx, [plan], RetrieveConfig(k=10),
                                dv_boost=("recency",
                                          {"origin": 30.0,
                                           "scale": 10.0})).collect()}
        assert set(fast) == set(exact)
        for key in fast:
            assert fast[key] == pytest.approx(exact[key], rel=1e-12)

    def test_composes_with_dv_filter(self, spark, idx):
        got = self._scores(spark, idx, "alpha",
                           ("recency", {"origin": 30.0, "scale": 10.0}),
                           dv_filter=("recency", 15.0, 35.0))
        assert set(got) == {"v1", "v3"}

    def test_bad_params_rejected(self, spark, idx):
        with pytest.raises(ValueError, match="decay shape"):
            self._scores(spark, idx, "alpha",
                         ("recency", {"origin": 0.0, "scale": 1.0,
                                      "shape": "step"}))
        with pytest.raises(ValueError, match="scale"):
            self._scores(spark, idx, "alpha",
                         ("recency", {"origin": 0.0, "scale": 0.0}))
