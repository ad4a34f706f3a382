"""Iceberg-gated pages I/O and its parquet fallback (sources/iceberg.py).

This container has no iceberg-spark-runtime jar, so these tests pin the
probe (False here), the loud gates, and the full parquet fallback path —
including the (lang, warc_day) pruning layout both modes share.
"""
from __future__ import annotations

import pytest

from patapsco_spark.sources.iceberg import (
    _is_catalog_identifier, iceberg_available, read_pages, write_pages)
from patapsco_spark.sources.webpages import synthesize_pages


def test_probe_false_in_this_container(spark):
    assert iceberg_available(spark) is False


def test_identifier_heuristic():
    assert _is_catalog_identifier("cc.crawl.pages")
    assert not _is_catalog_identifier("/data/pages")
    assert not _is_catalog_identifier("s3a://bucket/pages")
    assert not _is_catalog_identifier("relative/dir")


def test_roundtrip_and_partition_layout(spark, tmp_path):
    pages = synthesize_pages(spark, 60, partitions=4)
    out = str(tmp_path / "pages")
    assert write_pages(pages, out) == "parquet"
    back = read_pages(spark, out)
    assert back.count() == 60
    assert "warc_day" in back.columns
    # same rows (the fallback adds warc_day but loses nothing)
    assert back.select("url").distinct().count() == 60
    # physical layout: lang=... / warc_day=... directories
    langs = {p.name for p in (tmp_path / "pages").iterdir()
             if p.name.startswith("lang=")}
    assert langs  # at least one language branch
    # partition pruning reaches the scan
    plan = read_pages(spark, out).where("lang = 'eng'") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "lang" in plan and "PartitionFilters" in plan


def test_catalog_identifier_refused_without_runtime(spark):
    pages = synthesize_pages(spark, 5, partitions=1)
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        write_pages(pages, "cc.crawl.pages")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_pages(spark, "cc.crawl.pages")


def test_time_travel_refused_without_runtime(spark, tmp_path):
    pages = synthesize_pages(spark, 5, partitions=1)
    out = str(tmp_path / "p")
    write_pages(pages, out)
    with pytest.raises(RuntimeError, match="snapshot log"):
        read_pages(spark, out, snapshot_id=123)
    with pytest.raises(RuntimeError, match="snapshot log"):
        read_pages(spark, out, as_of="2024-01-01 00:00:00")
