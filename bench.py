#!/usr/bin/env python
"""Benchmark harness for the PySpark engine.

Headline metric: cold inverted-index build throughput (docs/sec) over the
``documents`` table at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
plus wall-clock for every headline query family (BM25/QLD/PSQ/boolean top-k,
dedup, ANN, text-stats). Prints ONE JSON line:

    {"metric": "index_docs_per_sec", "value": N, "unit": "docs/sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Set SPARK_GRAFT_SCALING=1 to also run the index build at local[N] and
local[4N] cores (N = max(2, cpus//4)) in subprocesses and report throughput
at both plus scaling efficiency — the sandbox stand-in for the N vs 4N
executor criterion in BASELINE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cores: int):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build_cold(spark, sf_dir: str, workdir: str) -> tuple[float, int]:
    """Cold index build; returns (seconds, num_docs)."""
    from pyspark.sql import functions as F
    from patapsco_spark.config import IndexConfig, TextConfig
    from patapsco_spark.operators.indexer import build_index

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text", "lang"))
    n = docs.count()
    idx = os.path.join(workdir, "idx")
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(text=TextConfig(stem=None, stopwords=None, lowercase=True),
                      num_shards=max(4, CPUS // 4))
    t0 = time.perf_counter()
    build_index(spark, docs, idx, cfg, resume=False)
    return time.perf_counter() - t0, n


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry

    times: dict[str, float] = {}
    for name, fn in entry.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def scaling_child(cores: int, sf_dir: str) -> float:
    """Run in a subprocess: cold build at local[cores], print docs/sec."""
    spark = make_spark(cores)
    with tempfile.TemporaryDirectory() as d:
        secs, n = build_cold(spark, sf_dir, d)
    spark.stop()
    return n / secs


def run_scaling(sf_dir: str) -> dict:
    low = max(2, CPUS // 4)
    out = {}
    for cores in (low, CPUS):
        code = (
            "import sys; sys.path.insert(0, %r); import bench; "
            "print('RATE', bench.scaling_child(%d, %r))" % (REPO, cores, sf_dir)
        )
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=1800)
        rate = None
        for line in proc.stdout.splitlines():
            if line.startswith("RATE "):
                rate = float(line.split()[1])
        out[f"local[{cores}]"] = rate
    r_lo, r_hi = out[f"local[{low}]"], out[f"local[{CPUS}]"]
    if r_lo and r_hi:
        out["scaling_efficiency"] = round(r_hi / (r_lo * (CPUS / low)), 3)
    return out


def main() -> None:
    result: dict = {"sf": SF_DIR}
    spark = make_spark(CPUS)
    with tempfile.TemporaryDirectory() as d:
        secs, n = build_cold(spark, SF_DIR, d)
    result["metric"] = "index_docs_per_sec"
    result["value"] = round(n / secs, 2)
    result["unit"] = "docs/sec"
    result["index_build_sec"] = round(secs, 3)
    result["num_docs"] = n
    result["queries"] = run_queries(spark, SF_DIR)
    spark.stop()
    if os.environ.get("SPARK_GRAFT_SCALING"):
        result["scaling"] = run_scaling(SF_DIR)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
