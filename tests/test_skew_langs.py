"""Skew handling and language breadth.

The north rule requires explicit skew handling for head terms. Our design
bounds skew structurally: postings shuffle keys on shard (docid ranges), so
a term appearing in EVERY document still produces per-reducer postings no
longer than docs_per_shard — the shard is the salt. These tests build an
adversarially skewed corpus and check the bound, plus a CJK n-gram
index/search roundtrip (language-gated analysis chain).
"""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts


class TestSkew:
    def test_head_term_postings_bounded_by_shard(self, spark, tmp_path):
        # 'the' in every doc; rare terms sparse — Zipf head vs tail
        n, shards = 300, 5
        docs = spark.createDataFrame(
            [(f"d{i:04d}", f"the the the rare{i} mid{i % 10}", "eng")
             for i in range(n)],
            "id string, text string, lang string")
        idx = str(tmp_path / "skew")
        cfg = TextConfig(stem=None, stopwords=None)
        build_index(spark, docs, idx, IndexConfig(text=cfg, num_shards=shards),
                    resume=False)
        posts = spark.read.parquet(f"{idx}/postings")
        # the head term is split across ALL shards, each piece ≤ shard size
        head = posts.where("term = 'the'").select("shard", "df").collect()
        assert len(head) == shards
        per_shard = n // shards + 1
        assert all(r.df <= per_shard for r in head)
        # scoring still exact: every doc matches 'the'
        res = search_texts(spark, idx, [("q", "the")],
                           RetrieveConfig(k=n), text_cfg=cfg)
        assert res.count() == n

    def test_reducer_balance_under_skew(self, spark, tmp_path):
        """Per-shard total postings rows stay within 2x of the mean even
        when one term dominates the corpus."""
        docs = spark.createDataFrame(
            [(f"d{i:04d}", "common " * 20 + f"rare{i}", "eng")
             for i in range(200)],
            "id string, text string, lang string")
        idx = str(tmp_path / "bal")
        build_index(spark, docs, idx,
                    IndexConfig(text=TextConfig(stem=None, stopwords=None),
                                num_shards=4), resume=False)
        sizes = (spark.read.parquet(f"{idx}/postings")
                 .groupBy("shard").agg(F.sum("df").alias("rows")).collect())
        rows = [r["rows"] for r in sizes]
        assert max(rows) <= 2 * (sum(rows) / len(rows))


class TestCjkNgram:
    def test_ngram_index_and_search_zho(self, spark, tmp_path):
        cfg = TextConfig(tokenize="ngram", stem=None, stopwords=None)
        docs = spark.createDataFrame(
            [("z1", "北京大学的学生", "zho"),
             ("z2", "上海交通大学", "zho"),
             ("z3", "天气很好今天", "zho")],
            "id string, text string, lang string")
        idx = str(tmp_path / "zho")
        build_index(spark, docs, idx, IndexConfig(text=cfg, num_shards=1),
                    resume=False)
        # bigrams for zho: query '大学' matches docs containing that bigram
        res = search_texts(spark, idx, [("q", "大学")],
                           RetrieveConfig(k=5), text_cfg=cfg, lang="zho")
        ids = {r.doc_id for r in res.collect()}
        assert ids == {"z1", "z2"}

    def test_ngram_rejects_stemming(self):
        with pytest.raises(Exception, match="not compatible"):
            TextConfig(tokenize="ngram", stem="porter").validate()
