"""composite_buckets — ES composite-aggregation pagination semantics.

The contract: walking pages with the last key tuple of each page as the
next ``after`` enumerates EVERY bucket exactly once, in key order, and
the cursor predicate reaches the scan (later pages skip earlier data,
not just earlier output).
"""
import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators.aggs import composite_buckets


@pytest.fixture()
def frame(spark):
    rows = [(f"d{i}", ["de", "en", "es", "fr"][i % 4],
             f"s{i % 7}", (i % 5) * 10) for i in range(200)]
    return spark.createDataFrame(
        rows, "doc_id string, lang string, source string, n int")


class TestComposite:
    def test_page_walk_enumerates_every_bucket_once(self, frame):
        truth = {(r["lang"], r["source"]): r["cnt"] for r in
                 frame.groupBy("lang", "source")
                 .agg(F.count("*").alias("cnt")).collect()}
        seen, after, pages = {}, None, 0
        while True:
            page = composite_buckets(frame, ["lang", "source"], size=5,
                                     after=after).collect()
            if not page:
                break
            pages += 1
            for r in page:
                key = (r["lang"], r["source"])
                assert key not in seen, f"bucket {key} returned twice"
                seen[key] = r["doc_count"]
            after = (page[-1]["lang"], page[-1]["source"])
            assert pages < 50, "cursor did not advance"
        assert seen == truth
        assert pages == -(-len(truth) // 5)

    def test_key_order_within_page(self, frame):
        page = composite_buckets(frame, ["lang", "source"], size=10).collect()
        keys = [(r["lang"], r["source"]) for r in page]
        assert keys == sorted(keys)

    def test_null_keys_dropped(self, spark):
        f = spark.createDataFrame(
            [("a", "x"), (None, "y"), ("b", None), ("b", "z")],
            "lang string, source string")
        page = composite_buckets(f, ["lang", "source"], size=10).collect()
        assert [(r["lang"], r["source"]) for r in page] == \
            [("a", "x"), ("b", "z")]

    def test_metrics_and_validation(self, frame):
        page = composite_buckets(
            frame, ["lang"], size=2,
            metrics={"avg_n": F.avg("n")}).collect()
        assert page[0]["lang"] == "de" and "avg_n" in page[0].asDict()
        with pytest.raises(ValueError, match="size must be positive"):
            composite_buckets(frame, ["lang"], size=0)
        with pytest.raises(ValueError, match="one value per key"):
            composite_buckets(frame, ["lang", "source"], size=5,
                              after=("en",))

    def test_after_cursor_reaches_the_scan(self, frame, tmp_path):
        # the lexicographic cursor must appear in PushedFilters on a
        # parquet source — pagination that only trims OUTPUT re-reads
        # the whole table every page at 100 TB
        p = str(tmp_path / "docs.parquet")
        frame.write.parquet(p)
        docs = frame.sparkSession.read.parquet(p)
        out = composite_buckets(docs, ["lang", "source"], size=5,
                                after=("en", "s3"))
        plan = out._jdf.queryExecution().explainString(
            frame.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        assert "PushedFilters" in plan
        assert "GreaterThan(lang,en)" in plan
