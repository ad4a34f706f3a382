"""End-to-end run orchestration — the rebuild of the reference's job layer
(/root/reference/patapsco/job.py): stage 1 = documents → index (+doc store),
stage 2 = topics → queries → retrieve → score, with manifest-gated resume
replacing ``.complete`` markers (job.py:672-685,903-908) and Spark replacing
the whole map/reduce + qsub/sbatch machinery (job.py:168-481).

Each stage is a function over DataFrames; a stage is skipped when its output
manifest matches the config (exact artifact reuse). Timing per stage is
recorded in ``timing.json`` like the reference (job.py:107-110).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from ..config import RetrieveConfig
from ..operators.evaluate import evaluate_run
from ..operators.indexer import build_index
from ..operators.retrieve import search_texts
from ..operators.rm3 import search_rm3
from ..sources import trec, webpages
from . import manifest as mf
from .runconfig import RunConfig
from .pqread import read_parquet


def _read_documents(spark: SparkSession, cfg: RunConfig) -> DataFrame:
    d = cfg.documents
    if d.input_format == "parquet":
        return read_parquet(spark, d.input_path)
    if d.input_format == "webpages":
        return webpages.extract_pages(read_parquet(spark, d.input_path))
    if d.input_format == "hc4":
        return trec.read_hc4_docs(spark, d.input_path, lang=d.lang)
    if d.input_format == "tsv":
        return trec.read_tsv_docs(spark, d.input_path, lang=d.lang)
    raise ValueError(f"unknown documents.input_format {d.input_format!r}")


def _read_topics(spark: SparkSession, cfg: RunConfig) -> DataFrame:
    t = cfg.topics
    if t.input_format == "hc4":
        topics = trec.read_hc4_topics(spark, t.input_path, t.lang, t.source,
                                      qrels_lang=t.qrels_lang)
        return trec.topics_to_query_texts(topics, fields=t.fields)
    if t.input_format == "tsv":
        raw = (spark.read.option("sep", "\t")
               .schema("query_id string, text string").csv(t.input_path))
        return raw
    raise ValueError(f"unknown topics.input_format {t.input_format!r}")


def run(spark: SparkSession, cfg: RunConfig, resume: bool = True) -> dict:
    """Execute the configured pipeline; returns paths + stage timings."""
    os.makedirs(cfg.path, exist_ok=True)
    timing: dict[str, float] = {}
    out = {"run_path": cfg.path}

    # ---- stage 1: documents → index ------------------------------------
    t0 = time.perf_counter()
    index_path = os.path.join(cfg.path, "index")
    docs = _read_documents(spark, cfg)
    d = cfg.documents
    id_col = "url" if d.input_format == "webpages" else d.id_col
    lang_col = d.lang_col if d.lang_col in docs.columns else None
    build_index(spark, docs, index_path, cfg.index, id_col=id_col,
                text_col=d.text_col, lang_col=lang_col, resume=resume)
    timing["index"] = round(time.perf_counter() - t0, 3)
    out["index_path"] = index_path

    # ---- stage 2: topics → retrieve → score ----------------------------
    if cfg.topics.input_path:
        t0 = time.perf_counter()
        # cache around the two uses (count for the path decision + either
        # collect or the chunked snapshot) so the topics source executes once
        topics_df = _read_topics(spark, cfg).cache()
        n_topics = topics_df.count()
        timing["topics"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        run_path = os.path.join(cfg.path, "results")
        rcfg: RetrieveConfig = cfg.retrieve
        # large topic sets use the chunked queries-as-DataFrame path: only
        # one chunk's plans are driver-resident at a time (the reference
        # holds every topic in memory — its ceiling, not ours). RM3 keeps
        # the list path (its two-pass feedback is per-batch by design).
        use_frame = (not rcfg.rm3) and (
            cfg.topics.chunk_size > 0 or n_topics > cfg.topics.auto_chunk_above)
        if use_frame:
            from ..operators.retrieve import search_query_frame
            results = search_query_frame(
                spark, index_path, topics_df,
                os.path.join(cfg.path, "results_chunks"), rcfg,
                text_cfg=cfg.index.text, lang=cfg.topics.lang,
                chunk_size=cfg.topics.chunk_size or 16384, resume=resume)
        elif rcfg.rm3:
            queries = [(r["query_id"], r["text"]) for r in topics_df.collect()]
            results = search_rm3(spark, index_path, queries, rcfg,
                                 text_cfg=cfg.index.text, lang=cfg.topics.lang)
        else:
            queries = [(r["query_id"], r["text"]) for r in topics_df.collect()]
            results = search_texts(spark, index_path, queries, rcfg,
                                   text_cfg=cfg.index.text, lang=cfg.topics.lang)
        results = results.cache()
        trec.write_trec_run(results, run_path, system=cfg.name)
        topics_df.unpersist()
        timing["retrieve"] = round(time.perf_counter() - t0, 3)
        out["results_path"] = run_path

        if cfg.score and cfg.score.qrels_path:
            t0 = time.perf_counter()
            qrels = trec.read_qrels(spark, cfg.score.qrels_path)
            from ..operators.evaluate import normalize_metrics
            ms = normalize_metrics(cfg.score.metrics)
            scores = evaluate_run(results.select("query_id", "doc_id", "score"),
                                  qrels, metrics=ms)
            scores_path = os.path.join(cfg.path, "scores.txt")
            rows = scores.collect()
            with open(scores_path, "w") as f:
                for r in sorted(rows, key=lambda r: (r["query_id"] == "all",
                                                     r["query_id"])):
                    for m in ms:
                        f.write(f"{m:25s}\t{r['query_id']}\t{r[m]:.4f}\n")
            timing["score"] = round(time.perf_counter() - t0, 3)
            out["scores_path"] = scores_path
        results.unpersist()

    with open(os.path.join(cfg.path, "timing.json"), "w") as f:
        json.dump(timing, f, indent=2)
    out["timing"] = timing
    mf.write_manifest(cfg.path, "run", {"name": cfg.name}, metrics=timing)
    return out
