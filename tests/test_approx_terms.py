"""approx_top_terms — the ES terms-aggregation estimation contract.

The distributed terms agg is APPROXIMATE by design: each shard reports
only its local top shard_size, so a term popular everywhere-but-nowhere-
top can be undercounted. The contract (ES terms-agg docs) is that
doc_count is never an OVERcount and the true count never exceeds
doc_count + doc_count_error_upper_bound. These tests pin both sides of
that contract plus the exact-when-unsharded degenerate case.
"""
import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators.aggs import approx_top_terms


def _items(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id string, term string")


def _true_counts(items):
    return {r["term"]: r["cnt"] for r in
            items.groupBy("term").agg(F.count("*").alias("cnt")).collect()}


class TestApproxTopTerms:
    def test_exact_when_shard_size_covers_all(self, spark):
        pairs = [(f"d{i}", t) for i in range(30)
                 for t in ("alpha", "beta")] + \
                [(f"d{i}", "gamma") for i in range(10)]
        items = _items(spark, pairs)
        out = approx_top_terms(items, "term", size=3, shard_size=100,
                               n_shards=4).collect()
        got = {r["term"]: (r["doc_count"], r["err_bound"]) for r in out}
        assert got == {"alpha": (30, 0), "beta": (30, 0), "gamma": (10, 0)}

    def test_bound_covers_true_count_under_tight_cut(self, spark):
        # 40 docs; heads h0..h9 in every doc, tail terms only in a few —
        # with shard_size=3 every shard cuts, reported counts undercount,
        # and the contract must still hold for every returned bucket
        pairs = []
        for i in range(40):
            for h in range(10):
                pairs.append((f"d{i}", f"h{h:02d}"))
            pairs.append((f"d{i}", f"t{i % 7}"))
        items = _items(spark, pairs)
        true = _true_counts(items)
        out = approx_top_terms(items, "term", size=5, shard_size=5,
                               n_shards=8).collect()
        assert len(out) == 5
        for r in out:
            assert r["doc_count"] <= true[r["term"]], "never an overcount"
            assert true[r["term"]] <= r["doc_count"] + r["err_bound"], \
                f"bound violated for {r['term']}"

    def test_deterministic_and_ordered(self, spark):
        pairs = [(f"d{i}", f"t{i % 5}") for i in range(50)]
        items = _items(spark, pairs)
        a = approx_top_terms(items, "term", size=3, shard_size=3,
                             n_shards=4).collect()
        b = approx_top_terms(items, "term", size=3, shard_size=3,
                             n_shards=4).collect()
        assert a == b
        counts = [r["doc_count"] for r in a]
        assert counts == sorted(counts, reverse=True)

    def test_validation(self, spark):
        items = _items(spark, [("d1", "a")])
        with pytest.raises(ValueError, match="size must be positive"):
            approx_top_terms(items, "term", size=0)
        with pytest.raises(ValueError, match="must be >= size"):
            approx_top_terms(items, "term", size=10, shard_size=5)

    def test_rare_terms_exact_tail(self, spark):
        from patapsco_spark.operators.aggs import rare_terms
        pairs = [(f"d{i}", "common") for i in range(20)] + \
                [("d0", "once"), ("d1", "twice"), ("d2", "twice")]
        out = rare_terms(_items(spark, pairs), "term",
                         max_doc_count=2).collect()
        assert [(r["term"], r["doc_count"]) for r in out] == \
            [("once", 1), ("twice", 2)]
        with pytest.raises(ValueError, match="max_doc_count"):
            rare_terms(_items(spark, pairs), "term", max_doc_count=0)

    def test_date_histogram_calendar_weeks_with_offset(self, spark):
        from patapsco_spark.operators.aggs import date_histogram
        rows = [  # Sun 23:00 UTC is already Monday in a +120min zone
            ("2024-01-07 23:00:00",), ("2024-01-08 01:00:00",),
            ("2024-01-03 12:00:00",), (None,)]
        f = spark.createDataFrame(rows, "ts string") \
            .select(F.col("ts").cast("timestamp").alias("ts"))
        out = date_histogram(f, "ts", interval="week",
                             offset_minutes=120).collect()
        got = {r["bucket"].strftime("%Y-%m-%d"): r["doc_count"]
               for r in out}
        # the Sunday-23:00 row shifts across the ISO week boundary; the
        # NULL ts row is dropped
        assert got == {"2024-01-01": 1, "2024-01-08": 2}
        with pytest.raises(ValueError, match="calendar interval"):
            date_histogram(f, "ts", interval="fortnight")

    def test_pipeline_aggs(self, spark):
        from patapsco_spark.operators.aggs import (bucket_stats,
                                                   cumulative_sum,
                                                   derivative)
        b = spark.createDataFrame(
            [("w1", 10), ("w2", 15), ("w3", 12)], "week string, n long")
        cs = {r["week"]: r["cum"] for r in
              cumulative_sum(b, "week", "n").collect()}
        assert cs == {"w1": 10, "w2": 25, "w3": 37}
        dv = {r["week"]: r["deriv"] for r in
              derivative(b, "week", "n").collect()}
        # first bucket has no predecessor: NULL, the ES omission, not 0
        assert dv == {"w1": None, "w2": 5, "w3": -3}
        from patapsco_spark.operators.aggs import moving_avg
        mv = {r["week"]: r["mov"] for r in
              moving_avg(b, "week", "n", window=2).collect()}
        # trailing-inclusive window, shrunk at the head (ES moving_fn)
        assert mv == {"w1": 10.0, "w2": 12.5, "w3": 13.5}
        st = bucket_stats(b, "n").collect()[0]
        assert (st["count"], st["min"], st["max"], st["sum"]) == \
            (3, 10, 15, 37)
        assert st["avg"] == pytest.approx(37 / 3)

    def test_default_shard_size_follows_es(self, spark):
        # size·1.5 + 10: with 30 distinct terms and size=10 the default
        # (25) cuts nothing per shard only if a shard holds ≤25 terms;
        # just pin that the default path runs and orders correctly
        pairs = [(f"d{i}", f"t{i % 30}") for i in range(90)]
        out = approx_top_terms(_items(spark, pairs), "term",
                               size=10).collect()
        assert len(out) == 10
        assert all(r["err_bound"] >= 0 for r in out)


class TestPipelineAggsRound5s5:
    def test_serial_diff(self, spark):
        from patapsco_spark.operators.aggs import serial_diff
        b = spark.createDataFrame(
            [("w1", 10), ("w2", 15), ("w3", 12), ("w4", 20)],
            "week string, n long")
        got = {r["week"]: r["diff"] for r in
               serial_diff(b, "week", "n", lag=2).collect()}
        # first `lag` buckets NULL (ES omission); then v - v[-2]
        assert got == {"w1": None, "w2": None, "w3": 2, "w4": 5}
        with pytest.raises(ValueError, match="lag"):
            serial_diff(b, "week", "n", lag=0)

    def test_normalize_methods(self, spark):
        import math as m
        from patapsco_spark.operators.aggs import normalize_buckets
        b = spark.createDataFrame(
            [("w1", 10), ("w2", 15), ("w3", 25)], "week string, n long")
        pct = {r["week"]: r["norm"] for r in
               normalize_buckets(b, "n", "percent_of_sum").collect()}
        assert pct == {"w1": 20.0, "w2": 30.0, "w3": 50.0}
        mm = {r["week"]: r["norm"] for r in
              normalize_buckets(b, "n", "mean").collect()}
        assert mm == {"w1": 0.0, "w2": pytest.approx(1 / 3), "w3": 1.0}
        z = {r["week"]: r["norm"] for r in
             normalize_buckets(b, "n", "z-score").collect()}
        mu = 50 / 3
        var = (100 + 225 + 625) / 3 - mu * mu
        assert z["w1"] == pytest.approx((10 - mu) / m.sqrt(var))
        assert z["w3"] == pytest.approx((25 - mu) / m.sqrt(var))
        with pytest.raises(ValueError, match="unknown normalize"):
            normalize_buckets(b, "n", "softmax")

    def test_bucket_selector_and_sort(self, spark):
        from patapsco_spark.operators.aggs import (bucket_selector,
                                                   bucket_sort)
        b = spark.createDataFrame(
            [("w1", 10), ("w2", 15), ("w3", 12), ("w4", 15)],
            "week string, n long")
        kept = {r["week"] for r in
                bucket_selector(b, "n >= 12").collect()}
        assert kept == {"w2", "w3", "w4"}
        rows = bucket_sort(b, [("n", False), ("week", True)],
                           size=2).collect()
        # n desc, week asc tie-break: w2(15), w4(15)
        assert [(r["week"], r["n"]) for r in rows] == [("w2", 15),
                                                       ("w4", 15)]
        page2 = bucket_sort(b, [("n", False), ("week", True)],
                            size=2, frm=2).collect()
        assert [(r["week"], r["n"]) for r in page2] == [("w3", 12),
                                                        ("w1", 10)]
        with pytest.raises(ValueError, match="at least one sort"):
            bucket_sort(b, [])
