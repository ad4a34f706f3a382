"""scan_width / widen_for_kernel: the 'widen before the Python kernel'
decision must reproduce Spark's file-packing arithmetic — a 64-tiny-file
input packs into ~1 scan partition and MUST be widened (a raw file count
would wrongly call it wide), while a genuinely wide scan is left alone."""

import pandas as pd
import pytest

from patapsco_spark.partitioning import scan_width, widen_for_kernel


def _write_files(spark, path, n_files, rows_per_file=50):
    for i in range(n_files):
        pd.DataFrame({"id": range(i * rows_per_file, (i + 1) * rows_per_file),
                      "text": ["word " * 5] * rows_per_file}).to_parquet(
            f"{path}/part-{i:04d}.parquet", index=False)
    return spark.read.parquet(str(path))


def test_many_tiny_files_pack_narrow(spark, tmp_path):
    df = _write_files(spark, tmp_path, n_files=64)
    w = scan_width(df)
    # 64 × ~2KB files pack into a handful of partitions (openCost-dominated),
    # nowhere near 64 — the raw inputFiles() count would say "wide"
    assert w is not None and w <= 8
    wide = widen_for_kernel(df, 16)
    # the widened frame really scans at the target parallelism
    assert wide.rdd.getNumPartitions() == 16


def test_in_memory_input_widens(spark):
    df = spark.createDataFrame([(i, "x") for i in range(100)], "id long, t string")
    assert scan_width(df) is None
    assert widen_for_kernel(df, 8).rdd.getNumPartitions() == 8


def test_wide_scan_left_alone(spark, tmp_path):
    df = _write_files(spark, tmp_path, n_files=6)
    # target below the estimated width → untouched (same plan object)
    assert widen_for_kernel(df, 1) is df


def test_estimate_tracks_spark_packing(spark, tmp_path):
    """The estimate should be within 2× of Spark's actual scan partitioning
    (same arithmetic modulo bin-packing remainders)."""
    df = _write_files(spark, tmp_path, n_files=32, rows_per_file=200)
    est = scan_width(df)
    actual = df.rdd.getNumPartitions()
    assert est is not None and actual > 0
    assert est <= 2 * actual + 1 and actual <= 2 * est + 1
