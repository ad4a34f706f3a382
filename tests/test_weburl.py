"""URL canonicalization / domain rollup / canonical dedup (operators/weburl)
and n-gram test-set contamination (textstats.ngram_contamination) — the
web-corpus ingestion steps in front of the indexer."""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators.textstats import ngram_contamination
from patapsco_spark.operators.weburl import (canonicalize_url,
                                             dedup_by_canonical_url,
                                             domain_stats, host_of,
                                             registered_domain)


def canon(spark, url):
    return spark.range(1).select(
        canonicalize_url(F.lit(url)).alias("c")).collect()[0]["c"]


class TestCanonicalize:
    def test_case_port_fragment(self, spark):
        assert canon(spark, "HTTP://WWW.Example.COM:80/Path/A#frag") == \
            "http://www.example.com/Path/A"
        assert canon(spark, "https://site.org:443/x") == "https://site.org/x"
        # non-default port kept
        assert canon(spark, "http://site.org:8080/x") == "http://site.org:8080/x"

    def test_path_case_preserved(self, spark):
        # only scheme+host lowercase; path is case-significant on most origins
        assert canon(spark, "http://a.com/CaseSensitive") == \
            "http://a.com/CaseSensitive"

    def test_tracking_params_dropped_rest_sorted(self, spark):
        assert canon(spark, "http://a.com/p?utm_source=f&b=2&a=1") == \
            "http://a.com/p?a=1&b=2"
        assert canon(spark, "http://a.com/p?b=2&a=1&fbclid=xyz") == \
            "http://a.com/p?a=1&b=2"
        # all params tracking -> no query at all
        assert canon(spark, "http://a.com/p?utm_campaign=x") == "http://a.com/p"

    def test_trailing_slash(self, spark):
        assert canon(spark, "http://a.com/") == canon(spark, "http://a.com")
        assert canon(spark, "http://a.com/x/") == "http://a.com/x"
        assert canon(spark, "http://a.com/x/?a=1") == "http://a.com/x?a=1"

    def test_permuted_duplicates_merge(self, spark):
        a = canon(spark, "HTTP://A.com/p/?b=2&a=1&utm_medium=m")
        b = canon(spark, "http://a.COM:80/p?a=1&b=2#top")
        assert a == b == "http://a.com/p?a=1&b=2"


class TestDomain:
    def test_host_and_registered(self, spark):
        rows = spark.createDataFrame(
            [("https://news.bbc.co.uk/x",), ("http://a.b.example.com/y",),
             ("http://localhost/z",)], "url string").select(
            host_of("url").alias("h"),
            registered_domain(host_of("url")).alias("d")).collect()
        got = {r["h"]: r["d"] for r in rows}
        assert got["news.bbc.co.uk"] == "bbc.co.uk"     # two-level suffix
        assert got["a.b.example.com"] == "example.com"
        assert got["localhost"] == "localhost"          # single label

    def test_domain_stats(self, spark):
        pages = spark.createDataFrame(
            [("http://A.com/p?b=2&a=1",), ("http://a.com:80/p/?a=1&b=2",),
             ("http://a.com/q",), ("https://b.org/x#f",)], "url string")
        got = {r["domain"]: r for r in domain_stats(pages).collect()}
        assert got["a.com"]["n_pages"] == 3
        assert got["a.com"]["n_canonical"] == 2         # the two /p merge
        assert got["a.com"]["dup_rate"] == pytest.approx(1 - 2 / 3, abs=1e-6)
        assert got["b.org"]["n_pages"] == 1 and got["b.org"]["dup_rate"] == 0.0


class TestDedup:
    def test_one_survivor_per_canonical(self, spark):
        pages = spark.createDataFrame(
            [("http://A.com/p?b=2&a=1", "t1"), ("http://a.com/p/?a=1&b=2", "t2"),
             ("http://a.com/q", "t3")], "url string, text string")
        out = dedup_by_canonical_url(pages).collect()
        assert len(out) == 2
        # survivor = min raw url within the canonical group
        urls = sorted(r["url"] for r in out)
        assert urls == ["http://A.com/p?b=2&a=1", "http://a.com/q"]
        assert "__canonical" not in dedup_by_canonical_url(pages).columns


class TestContamination:
    def test_overlap_counts(self, spark):
        docs = spark.createDataFrame(
            [("d1", "a b c d e f"),     # grams(3): abc bcd cde def
             ("d2", "x y z w"),         # xyz yzw
             ("d3", "a b")],            # too short -> 0 grams
            "doc_id string, text string")
        ev = spark.createDataFrame(
            [("e1", "b c d e q r s")],   # grams: bcd cde deq eqr qrs
            "doc_id string, text string")
        got = {r["doc_id"]: r for r in
               ngram_contamination(docs, ev, n=3).collect()}
        assert got["d1"]["n_grams"] == 4 and got["d1"]["n_hit"] == 2
        assert got["d1"]["contamination"] == pytest.approx(0.5)
        assert got["d2"]["n_hit"] == 0
        assert got["d3"]["n_grams"] == 0 and got["d3"]["contamination"] == 0.0

    def test_distinct_grams_counted_once(self, spark):
        docs = spark.createDataFrame([("d1", "a b c a b c a b c")],
                                     "doc_id string, text string")
        ev = spark.createDataFrame([("e", "a b c")],
                                   "doc_id string, text string")
        r = ngram_contamination(docs, ev, n=3).collect()[0]
        # 7 positions but only 3 distinct grams; 'a b c' hits once
        assert r["n_grams"] == 3 and r["n_hit"] == 1

    def test_all_jvm_side(self, spark):
        """URL canonicalization + domain rollup compile to pure Catalyst
        (no Python UDF stages) so they fuse into the page scan at 100 TB."""
        pages = spark.createDataFrame([("http://a.com/p?x=1",)], "url string")
        plan = domain_stats(pages)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_eval_side_is_broadcast(self, spark):
        docs = spark.createDataFrame([("d1", "a b c d")],
                                     "doc_id string, text string")
        ev = spark.createDataFrame([("e", "a b c")],
                                   "doc_id string, text string")
        plan = ngram_contamination(docs, ev, n=3)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestSurtCdx:
    def test_surt_rules(self, spark):
        cases = [
            ("https://www.Example.com:443/A/b?q=1#f", "com,example)/a/b?q=1"),
            ("http://sub.Host.co.uk:80/", "uk,co,host,sub)"),
            ("https://example.org/Path/?b=2&a=1&utm_source=x",
             "org,example)/path?a=1&b=2"),
            # param sort must be case-insensitive (lowering precedes sort)
            ("https://example.org/p?B=2&a=1", "org,example)/p?a=1&b=2"),
            ("http://www.www.x.com/p", "com,x,www)/p"),  # ONE www stripped
            ("https://example.org", "org,example)"),
        ]
        from patapsco_spark.operators.weburl import surt
        df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
        got = [r[0] for r in df.select(surt("url")).collect()]
        assert got == [e for _, e in cases]

    def test_surt_is_pure_catalyst(self, spark):
        from patapsco_spark.operators.weburl import surt
        df = spark.createDataFrame([("https://a.b/c",)], "url string")
        plan = df.select(surt("url"))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "EvalPython" not in plan

    def test_build_cdx_sorted_with_pointers(self, spark, tmp_path):
        import os
        from patapsco_spark.operators.weburl import build_cdx
        from patapsco_spark.sources.warc import read_warc, records_to_warc_bytes
        from patapsco_spark.sources.webpages import _synth_batch
        import numpy as np
        pdf = _synth_batch(np.arange(12))
        p = os.path.join(str(tmp_path), "s.warc.gz")
        with open(p, "wb") as f:
            f.write(records_to_warc_bytes(pdf))
        cdx = build_cdx(read_warc(spark, p))
        rows = cdx.collect()
        assert len(rows) == 12
        # pointer arithmetic: offsets are cumulative COMPRESSED gzip-member
        # lengths — the CDX contract (seek there + inflate = the record)
        import gzip
        from patapsco_spark.sources.warc import record_bytes
        offs, acc = {}, 0
        for r in pdf.itertuples(index=False):
            offs[r.url] = acc
            acc += len(gzip.compress(
                record_bytes(r.url, r.warc_ts, bytes(r.html)), mtime=0))
        assert {r.url: r.warc_offset for r in rows} == offs
        # each partition is internally sorted by the key
        parts = cdx.rdd.glom().collect()
        for part in parts:
            keys = [(r.surt, r.warc_ts) for r in part]
            assert keys == sorted(keys)


class TestLatestRevision:
    def test_newest_capture_wins(self, spark):
        from patapsco_spark.operators.weburl import latest_revision
        pages = spark.createDataFrame(
            [("http://A.com/p?b=2&a=1", "2020-01-01 00:00:00", "old"),
             ("http://a.com/p/?a=1&b=2", "2021-06-01 00:00:00", "new"),
             ("http://a.com/q", "2019-01-01 00:00:00", "only")],
            "url string, warc_ts string, text string")
        pages = pages.withColumn("warc_ts", pages["warc_ts"].cast("timestamp"))
        out = {r["text"] for r in latest_revision(pages).collect()}
        assert out == {"new", "only"}
        assert "__canonical" not in latest_revision(pages).columns

    def test_tiebreaks_deterministic(self, spark):
        from patapsco_spark.operators.weburl import latest_revision
        # same canonical + same ts: raw-url asc breaks the tie; with
        # identical raw urls, md5(content) asc does
        pages = spark.createDataFrame(
            [("http://a.com/p", "2020-01-01 00:00:00", "zz"),
             ("http://a.com/p", "2020-01-01 00:00:00", "aa"),
             ("http://A.com/p", "2020-01-01 00:00:00", "caps")],
            "url string, warc_ts string, text string")
        pages = pages.withColumn("warc_ts", pages["warc_ts"].cast("timestamp"))
        out = latest_revision(pages, content_col="text").collect()
        assert len(out) == 1
        # raw "http://A.com/p" < "http://a.com/p" (ASCII), so caps wins
        assert out[0]["text"] == "caps"


class TestRevisionStats:
    def test_counts_and_oscillation(self, spark):
        from patapsco_spark.operators.weburl import revision_stats
        rows = [
            # p: A -> B -> A oscillation (3 captures, 2 versions, 2 changes)
            ("http://a.com/p", "2020-01-01 00:00:00", b"A"),
            ("http://A.com/p", "2020-02-01 00:00:00", b"B"),
            ("http://a.com/p/", "2020-03-01 00:00:00", b"A"),
            # q: never changed
            ("http://a.com/q", "2020-01-01 00:00:00", b"X"),
            ("http://a.com/q", "2020-06-01 00:00:00", b"X"),
            # r: single capture
            ("http://a.com/r", "2021-01-01 00:00:00", b"Y"),
        ]
        pages = spark.createDataFrame(
            rows, "url string, warc_ts string, html binary")
        pages = pages.withColumn("warc_ts", pages["warc_ts"].cast("timestamp"))
        got = {r.url: r for r in revision_stats(pages).collect()}
        p = got["http://a.com/p"]
        assert (p.n_captures, p.n_versions, p.n_changes) == (3, 2, 2)
        assert p.first_ts.month == 1 and p.last_ts.month == 3
        q = got["http://a.com/q"]
        assert (q.n_captures, q.n_versions, q.n_changes) == (2, 1, 0)
        r = got["http://a.com/r"]
        assert (r.n_captures, r.n_versions, r.n_changes) == (1, 1, 0)
