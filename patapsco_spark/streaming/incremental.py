"""Incremental index maintenance — a Structured Streaming extension beyond
the reference (patapsco is strictly batch; its "streaming" is pull-based
Python iteration, /root/reference/patapsco/pipeline.py:162-177). A web-scale
crawl feed needs continuous ingestion, so we add it as the Spark-native
analogue of Lucene's addIndexes segment appending
(/root/reference/patapsco/index.py:93-103):

- :func:`append_batch` — index a batch of NEW documents as fresh shards
  appended to an existing index: docids start at the next shard boundary
  (global shard = docid // docs_per_shard stays a pure function), postings/
  norms land in new ``shard=K`` directories, term_stats and the root
  manifest are refreshed. Existing shards are never rewritten — appending
  is O(batch), like a Lucene segment flush.
- :func:`stream_index` — wires append_batch into ``writeStream.foreachBatch``
  with exactly-once epoch bookkeeping in the manifest (an epoch already
  recorded is skipped on replay, making the sink idempotent).

Corpus-level statistics (N, avgdl, total cf) move as documents arrive, so
scores of earlier queries are not frozen — the same behavior as reopening a
live Lucene index between searches.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.analyze import analyze_documents
from ..operators.indexer import (
    POSTINGS_SCHEMA,
    _emit_tf,
    _make_postings_kernel,
)
from ..plans import manifest as mf


def append_batch(spark: SparkSession, docs: DataFrame, index_path: str,
                 cfg: IndexConfig | None = None, id_col: str = "id",
                 text_col: str = "text", lang_col: str | None = "lang",
                 epoch_id: int | None = None) -> dict:
    """Append new docs to an existing index as fresh shards. Returns the
    updated root manifest config. Idempotent per epoch_id."""
    cfg = cfg or IndexConfig()
    root = mf.read_manifest(index_path)
    if root is None:
        raise FileNotFoundError(f"no index at {index_path} — build it first")
    meta = root["config"]
    docs_per_shard = int(meta["docs_per_shard"])
    seen = set(meta.get("epochs", []))
    if epoch_id is not None and epoch_id in seen:
        return meta  # replayed micro-batch: already applied

    # docid base at the next shard boundary — the shard function stays
    # shard = docid // docs_per_shard with no rewrite of old shards
    next_docid = int(meta["num_docs_ceil"]) if "num_docs_ceil" in meta else \
        math.ceil(int(meta["num_docs"]) / docs_per_shard) * docs_per_shard
    first_shard = next_docid // docs_per_shard

    analyzed = analyze_documents(docs, cfg.text, id_col=id_col,
                                 text_col=text_col, lang_col=lang_col)
    # batch-local deterministic docids: order by id within the batch
    from pyspark.sql import Window
    w = Window.orderBy("id")
    docided = (analyzed
               .withColumn("docid", F.row_number().over(w) - 1 + F.lit(next_docid))
               .withColumn("shard", (F.col("docid") / docs_per_shard).cast("int")))

    norms = docided.select("shard", "docid", "id", "dl")
    (norms.repartition(1, "shard").sortWithinPartitions("docid")
          .write.mode("append").partitionBy("shard")
          .parquet(f"{index_path}/norms"))
    # pack the NEW shards' norm bytes (query path reads norms_packed)
    from ..operators.indexer import _pack_norms
    new_norms = (spark.read.parquet(f"{index_path}/norms")
                 .where(F.col("docid") >= next_docid))
    (new_norms.groupBy("shard")
     .applyInPandas(_pack_norms(docs_per_shard),
                    schema="shard int, base long, n long, codes binary")
     .write.mode("append").parquet(f"{index_path}/norms_packed"))

    tf_rows = docided.select("shard", "docid", "dl", "terms").mapInPandas(
        _emit_tf, schema="shard int, term string, docid long, tf int, dlq int")
    postings = (tf_rows
                .repartition(max(1, spark.sparkContext.defaultParallelism // 2),
                             "shard")
                .sortWithinPartitions("shard", "term", "docid")
                .mapInPandas(_make_postings_kernel(cfg.block_size, docs_per_shard),
                             schema=POSTINGS_SCHEMA))
    (postings.write.mode("append").partitionBy("shard")
             .parquet(f"{index_path}/postings"))

    # refresh term stats + global stats from the (cheap, columnar) tables
    post_df = spark.read.parquet(f"{index_path}/postings")
    stats = post_df.groupBy("term").agg(F.sum("df").alias("df"),
                                        F.sum("cf").alias("cf"))
    (stats.repartition(max(1, int(meta["num_shards"]) // 4))
          .sortWithinPartitions("term")
          .write.mode("overwrite").parquet(f"{index_path}/term_stats"))

    norms_df = spark.read.parquet(f"{index_path}/norms")
    g = norms_df.agg(F.count("*").alias("n"), F.sum("dl").alias("t"),
                     F.max("docid").alias("maxd")).first()
    import numpy as np
    new_meta = dict(meta)
    new_meta.update({
        "num_docs": int(g["n"]),
        "total_tf": int(g["t"] or 0),
        "avgdl": float(np.float32((g["t"] or 0) / g["n"])) if g["n"] else 0.0,
        "num_docs_ceil": (int(g["maxd"]) // docs_per_shard + 1) * docs_per_shard,
        "num_shards": int(g["maxd"]) // docs_per_shard + 1,
        "epochs": sorted(seen | ({epoch_id} if epoch_id is not None else set())),
    })
    mf.write_manifest(index_path, "index", new_meta,
                      metrics={"num_docs": new_meta["num_docs"],
                               "appended_from_shard": first_shard})
    return new_meta


def stream_index(spark: SparkSession, pages_stream: DataFrame, index_path: str,
                 checkpoint: str, cfg: IndexConfig | None = None,
                 id_col: str = "id", text_col: str = "text",
                 lang_col: str | None = "lang", **trigger_kwargs):
    """Continuous ingestion: every micro-batch is appended as new shards.
    Returns the StreamingQuery (caller awaits/stops it)."""
    cfg = cfg or IndexConfig()

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(spark, batch_df, index_path, cfg, id_col=id_col,
                     text_col=text_col, lang_col=lang_col, epoch_id=epoch_id)

    return (pages_stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start())
