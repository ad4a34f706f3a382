"""Driver-side scan-width estimation for "widen before the CPU-heavy
kernel" decisions.

The Python-kernel stages (shingle explode, analysis chain) parallelize per
input partition, so a scan that Spark's file packing collapses into a few
partitions serializes them. ``df.rdd.getNumPartitions()`` answers this
exactly but forces a full physical-plan translation (~2s cold, measured);
raw ``len(inputFiles())`` is cheap but wrong in both directions (64 tiny
files pack into 1-2 partitions; 3 huge files split into many). This module
reproduces Spark's own packing arithmetic (FilePartition.maxSplitBytes:
``min(maxPartitionBytes, max(openCostInBytes, total/defaultParallelism))``,
then bin-packing by size + open cost) from driver-side file metadata.
"""

from __future__ import annotations

import os
from pyspark.sql import DataFrame

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}

# beyond this many files, stat only an evenly-spaced sample and extrapolate
# total bytes: per-file stat calls on a 100k-file table would take seconds,
# but returning the raw file count would reintroduce the tiny-files trap
# (3000 near-empty files can still pack into a handful of partitions)
_FILE_STAT_CAP = 2000


def _parse_bytes(v: str) -> int:
    v = str(v).strip().lower().rstrip("b")
    if v and v[-1] in _UNITS:
        return int(float(v[:-1]) * _UNITS[v[-1]])
    return int(float(v))


def _file_sizes(df: DataFrame, files: list[str]) -> list[int]:
    sizes = []
    jvm = fs = None
    for f in files:
        if f.startswith("file:"):
            sizes.append(os.path.getsize(f[len("file:"):]))
            continue
        if fs is None:
            sc = df.sparkSession.sparkContext
            jvm = sc._jvm
            p0 = jvm.org.apache.hadoop.fs.Path(f)
            fs = p0.getFileSystem(sc._jsc.hadoopConfiguration())
        sizes.append(fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f)).getLen())
    return sizes


def scan_width(df: DataFrame) -> int | None:
    """Estimated scan partition count for a file-backed DataFrame; None for
    in-memory inputs (unknowable without a plan translation)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    mpb = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes",
                                      "134217728"))
    open_cost = _parse_bytes(spark.conf.get("spark.sql.files.openCostInBytes",
                                            "4194304"))
    par = spark.sparkContext.defaultParallelism
    if len(files) > _FILE_STAT_CAP:
        # evenly-spaced sample (parquet writers produce size-correlated runs
        # of part files, so a prefix sample would bias the estimate)
        step = -(-len(files) // _FILE_STAT_CAP)
        sample = files[::step]
        sampled = _file_sizes(df, sample)
        total = int(sum(s + open_cost for s in sampled) * len(files) / len(sample))
    else:
        sizes = _file_sizes(df, files)
        total = sum(s + open_cost for s in sizes)
    max_split = min(mpb, max(open_cost, total // max(1, par)))
    if max_split <= 0:
        return len(files)
    # splittable formats (parquet) chop large files at max_split; packing of
    # the resulting splits is ~total/max_split bins
    return max(1, -(-total // max_split))


def widen_for_kernel(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition iff the scan would run narrower than ``target`` (default
    session parallelism). In-memory inputs always widen: their width is
    unknowable without the expensive plan translation, they are small in
    practice (driver-built), and the extra shuffle of raw rows is trivial
    next to the Python kernel work it parallelizes."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    width = scan_width(df)
    if width is not None and width >= target:
        return df
    return df.repartition(target)
