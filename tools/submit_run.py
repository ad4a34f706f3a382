#!/usr/bin/env python
"""spark-submit entry point — the cluster deployment path the reference
reaches via qsub/sbatch scripts (/root/reference/patapsco/job.py:315-481),
rebuilt as the standard Spark submission:

    spark-submit --master <cluster> --py-files patapsco_spark.zip \\
        tools/submit_run.py --pages <table> --index <out> \\
        --query "data stream window" [--synthesize N]

The script only uses the SparkSession handed to it by spark-submit (no
master hardcoding), so the same invocation works on YARN/K8s/standalone.
Prints one JSON line with build stats and top-k results.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="web-pages table path (parquet/iceberg)")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="synthesize N deterministic pages instead of reading")
    ap.add_argument("--index", required=True, help="index output path")
    ap.add_argument("--query", action="append", default=[],
                    help="query text (repeatable)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--shards", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("patapsco-spark-run").getOrCreate()

    from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
    from patapsco_spark.operators.retrieve import search_texts
    from patapsco_spark.sources.webpages import index_webpages, synthesize_pages

    if args.synthesize:
        pages = synthesize_pages(spark, args.synthesize)
    elif args.pages:
        pages = read_pages_table(spark, args.pages)
    else:
        ap.error("one of --pages or --synthesize is required")

    cfg = IndexConfig(text=TextConfig(stem=None, stopwords=None),
                      num_shards=args.shards)
    t0 = time.perf_counter()
    meta = index_webpages(spark, pages, args.index, cfg, resume=True)
    build_s = round(time.perf_counter() - t0, 2)

    out = {"num_docs": meta["num_docs"], "build_sec": build_s, "queries": {}}
    if args.query:
        res = search_texts(spark, args.index,
                           [(f"q{i}", q) for i, q in enumerate(args.query)],
                           RetrieveConfig(k=args.k),
                           text_cfg=cfg.text)
        for r in res.collect():
            out["queries"].setdefault(r.query_id, []).append(
                {"doc_id": r.doc_id, "rank": r["rank"], "score": round(r.score, 5)})
    print(json.dumps(out))
    spark.stop()


def read_pages_table(spark, path: str):
    """Iceberg when the catalog/jars are present, parquet otherwise — the
    BASELINE.json input is 'an Iceberg table of Common-Crawl-style pages';
    this sandbox ships no Iceberg runtime, so parquet is the tested path
    and iceberg is attempted first by format."""
    try:
        return spark.read.format("iceberg").load(path)
    except Exception:
        return spark.read.parquet(path)


if __name__ == "__main__":
    main()
