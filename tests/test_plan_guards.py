"""Physical-plan regression guards: the scale properties the engine's
design depends on must be visible in the optimized plans, not just assumed.
If a future change breaks term-predicate pushdown or shard partition
pruning, these fail loudly instead of silently turning a pruned scan into a
full-table read at production scale only."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, TextConfig
from patapsco_spark.operators.indexer import build_index

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "idx")
    docs = spark.createDataFrame(
        [(f"d{i}", f"alpha beta term{i % 7} gamma", "eng") for i in range(40)],
        "id string, text string, lang string")
    build_index(spark, docs, path, IndexConfig(text=RAW, num_shards=3))
    return path


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_postings_scan_pushes_term_filter(spark, idx):
    """The query-terms filter must reach the parquet scan (row-group pruning
    over the term-sorted postings files), not run post-scan only."""
    posts = (spark.read.parquet(f"{idx}/postings")
             .where(F.col("term").isin(["alpha", "beta"]) & (F.col("shard") < 3)))
    plan = _plan(posts)
    assert "PushedFilters" in plan
    assert "In(term" in plan


def test_postings_scan_prunes_shard_partitions(spark, idx):
    posts = (spark.read.parquet(f"{idx}/postings")
             .where(F.col("term").isin(["alpha"]) & (F.col("shard") == 1)))
    plan = _plan(posts)
    # shard is the partition column: the predicate must appear as a
    # PartitionFilter, and the scan must read 1 of 3 shard directories
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters", 1)[1][:200]


def test_norms_packed_is_one_row_per_shard(spark, idx):
    """The query path reads one packed blob per shard — if this table ever
    grows per-doc rows the per-query norms read becomes a columnar scan."""
    packed = spark.read.parquet(f"{idx}/norms_packed")
    assert packed.count() == 3
    assert packed.select("shard").distinct().count() == 3


def test_search_uses_no_python_row_udfs(spark, idx):
    """The retrieval plan must stay Arrow-batched (cogrouped applyInPandas)
    — a BatchEvalPython node would mean a per-row Python UDF crept in."""
    from patapsco_spark.config import RetrieveConfig
    from patapsco_spark.operators.retrieve import search_texts

    res = search_texts(spark, idx, [("q", "alpha beta")],
                       RetrieveConfig(k=5), text_cfg=RAW)
    plan = _plan(res)
    assert "BatchEvalPython" not in plan
    assert "FlatMapCoGroupsInPandas" in plan or "FlatMapCoGroupsInArrow" in plan
