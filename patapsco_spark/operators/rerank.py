"""Doc store + rerank stage — rebuilds the reference's sqlite doc database
(/root/reference/patapsco/database.py:26-115) and rerankers
(/root/reference/patapsco/rerank.py):

- The doc store is the ``analyzed/`` table the index build already persists
  (id, lang, original_text = pre-tokenization normalized text — exactly what
  ``DatabaseWriter`` stores for rerankers, database.py:99-101). Lookup is a
  predicate-pushed scan (``id IN (...)``) or a broadcast semi-join instead
  of per-key sqlite gets.
- ``mock_rerank`` (E1, rerank.py:52-67): identity rerank that exercises the
  doc lookup join — results come back with the doc text attached.
- ``shell_rerank`` (E2, rerank.py:70-172): external-script contract — write
  the candidates as jsonl, invoke
  ``script doc_lang query_lang db input output [--key value ...]``, read a
  TREC run back. Runs driver-side over the collected top-k (rerank inputs
  are ≤ k·|queries| rows by construction — the reference batches through a
  temp dir the same way).
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..plans.pqread import read_parquet


def doc_store(spark: SparkSession, index_path: str) -> DataFrame:
    """(id, lang, original_text) — the reranker-facing document view."""
    return (read_parquet(spark, f"{index_path}/analyzed")
            .select("id", "lang", "original_text"))


def lookup_docs(spark: SparkSession, index_path: str, ids: list[str]) -> DataFrame:
    """Random-access analogue of the sqlite KV get: predicate-pushed scan."""
    return doc_store(spark, index_path).where(F.col("id").isin(list(ids)))


def attach_doc_text(results: DataFrame, store: DataFrame) -> DataFrame:
    """results ⟕ doc_store on doc_id — the rerank input join. The results
    side is tiny (top-k per query) so it broadcasts; the store scan prunes
    to the joined ids."""
    docs = store.select(F.col("id").alias("doc_id"), "original_text")
    return results.join(docs, "doc_id", "left")


def collapse_results(results: DataFrame, keys: DataFrame, key_col: str,
                     id_col: str = "doc_id", per_key: int = 1,
                     k: int | None = None) -> DataFrame:
    """Field collapsing (Lucene grouping module / Elasticsearch
    ``collapse`` analogue — the reference has no equivalent; at web scale
    this is the standard one-result-per-site diversification): keep the
    best ``per_key`` hits per (query, key) — e.g. one document per source
    domain — then re-rank what survives and optionally cut to ``k``.

    ``keys`` maps ``id_col`` → ``key_col`` (e.g. the documents table's
    (doc_id, source), or weburl.registered_domain output). Plan shape for
    100 TB: the hits side is ≤ |queries|·k rows by construction, so it
    BROADCASTS against the big key table (one pruned scan of ``keys``, no
    shuffle of it); the windows then run over the tiny joined frame.
    Ranks are reassigned 0-based per query in (score desc, id asc) order —
    collapsing changes which docs appear, never their scores."""
    hits = keys.select(F.col(id_col), F.col(key_col)).join(
        F.broadcast(results), id_col)
    w = (Window.partitionBy("query_id", key_col)
         .orderBy(F.desc("score"), F.asc(id_col)))
    kept = (hits.withColumn("_kr", F.row_number().over(w))
            .where(F.col("_kr") <= per_key).drop("_kr"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                F.asc(id_col))
    out = kept.withColumn("rank", F.row_number().over(w2) - 1)
    if k is not None:
        out = out.where(F.col("rank") < k)
    return out.orderBy("query_id", "rank")


def mock_rerank(spark: SparkSession, index_path: str, results: DataFrame) -> DataFrame:
    """Identity rerank with doc lookup (E1): scores/ranks unchanged, text
    attached and dropped — validates the store wiring like the reference's
    MockReranker deep-copy."""
    joined = attach_doc_text(results, doc_store(spark, index_path))
    return joined.drop("original_text")


def shell_rerank(spark: SparkSession, index_path: str, results: DataFrame,
                 script: str, doc_lang: str = "eng", query_lang: str = "eng",
                 extra_args: dict[str, str] | None = None,
                 distributed: bool = False) -> DataFrame:
    """External-reranker contract (E2). The script receives
    (doc_lang, query_lang, db_path, input_jsonl, output_trec) plus
    ``--key value`` pairs and must write a TREC run file; its row count must
    match its input (the reference errors otherwise, rerank.py:150-156).

    ``distributed=False`` mirrors the reference's single-process
    ShellReranker: collect the run (≤ k·|queries| rows) and invoke the
    script once on the driver. ``distributed=True`` invokes the script once
    PER QUERY GROUP inside ``applyInPandas`` — at millions of queries the
    driver path is a bottleneck, and per-query invocation is what neural
    rerankers batch on anyway. The script (and the doc-store path) must be
    reachable from executors — same deployment contract as ``--py-files``.
    Identical output either way (same script, same per-row contract)."""
    if distributed:
        return _shell_rerank_distributed(spark, index_path, results, script,
                                         doc_lang, query_lang, extra_args)
    rows = (attach_doc_text(results, doc_store(spark, index_path))
            .select("query_id", "doc_id", "rank", "score", "original_text")
            .collect())
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "input.jsonl")
        out = os.path.join(d, "output.txt")
        with open(inp, "w") as f:
            for r in rows:
                f.write(json.dumps({
                    "query_id": r["query_id"], "doc_id": r["doc_id"],
                    "rank": int(r["rank"]), "score": float(r["score"]),
                    "text": r["original_text"] or ""}) + "\n")
        cmd = [script, doc_lang, query_lang, f"{index_path}/analyzed", inp, out]
        for k, v in (extra_args or {}).items():
            cmd += [f"--{k}", str(v)]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(f"rerank script failed: {proc.stderr[-500:]}")
        reranked = []
        with open(out) as f:
            for line in f:
                qid, _, doc_id, rank, score, _system = line.split()
                reranked.append((qid, doc_id, int(rank), float(score)))
        if len(reranked) != len(rows):
            raise RuntimeError(
                f"rerank output rows ({len(reranked)}) != input rows ({len(rows)})")
    out_df = spark.createDataFrame(
        reranked, "query_id string, doc_id string, rank int, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (out_df.withColumn("rank", F.row_number().over(w) - 1))


def _shell_rerank_distributed(spark: SparkSession, index_path: str,
                              results: DataFrame, script: str,
                              doc_lang: str, query_lang: str,
                              extra_args: dict[str, str] | None) -> DataFrame:
    """Per-query-group shell invocation on executors (applyInPandas).

    Each group gets its own temp input/output files and one script run with
    the exact driver-path argument contract; a count mismatch fails the task
    (→ the job) just like the driver path raises. The shuffle keys on
    query_id — the natural rerank unit, bounded at k rows per group."""
    db_path = f"{index_path}/analyzed"
    args = dict(extra_args or {})

    def rerank_group(pdf):
        import json as _json
        import os as _os
        import subprocess as _sp
        import tempfile as _tf

        import pandas as _pd

        with _tf.TemporaryDirectory() as d:
            inp = _os.path.join(d, "input.jsonl")
            out = _os.path.join(d, "output.txt")
            with open(inp, "w") as f:
                for r in pdf.itertuples(index=False):
                    f.write(_json.dumps({
                        "query_id": r.query_id, "doc_id": r.doc_id,
                        "rank": int(r.rank), "score": float(r.score),
                        "text": r.original_text or ""}) + "\n")
            cmd = [script, doc_lang, query_lang, db_path, inp, out]
            for k, v in args.items():
                cmd += [f"--{k}", str(v)]
            proc = _sp.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                raise RuntimeError(f"rerank script failed: {proc.stderr[-500:]}")
            qids, dids, ranks, scores = [], [], [], []
            with open(out) as f:
                for line in f:
                    qid, _, doc_id, rank, score, _system = line.split()
                    qids.append(qid); dids.append(doc_id)
                    ranks.append(int(rank)); scores.append(float(score))
        if len(qids) != len(pdf):
            raise RuntimeError(
                f"rerank output rows ({len(qids)}) != input rows ({len(pdf)})")
        return _pd.DataFrame({"query_id": qids, "doc_id": dids,
                              "rank": ranks, "score": scores})

    run = (attach_doc_text(results, doc_store(spark, index_path))
           .select("query_id", "doc_id", "rank", "score", "original_text"))
    out_df = (run.groupBy("query_id")
              .applyInPandas(rerank_group,
                             schema="query_id string, doc_id string, "
                                    "rank int, score double"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return out_df.withColumn("rank", F.row_number().over(w) - 1)


def linear_fuse(runs: list, weights: list[float] | None = None,
                k: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Convex score fusion with per-run min-max normalization — the OTHER
    standard hybrid-retrieval merge next to RRF (Weaviate's "relative
    score fusion", the α·dense + (1−α)·sparse blend of the
    hybrid-search literature): within each (run, query) scores rescale to
    [0, 1] via (s − min)/(max − min), then fuse as Σ wᵢ·normᵢ. Unlike RRF
    it keeps score MAGNITUDE information (a dominant top hit stays
    dominant; RRF flattens rank 0 vs 1 to 1/60 vs 1/61) at the price of
    sensitivity to per-run outliers.

    Degenerate run (all scores equal for a query): every doc normalizes
    to 1.0 — equally best, not equally worthless (0.0 would erase the
    run's membership signal entirely).

    Determinism mirrors rrf_fuse: run-ordinal fold order, doc_id asc
    tie-break. Plan shape: runs are k-bounded by construction, the
    min/max window is per (run, query) over ≤ k rows."""
    if not runs:
        raise ValueError("linear_fuse needs at least one run")
    if weights is None:
        weights = [1.0 / len(runs)] * len(runs)
    if len(weights) != len(runs):
        raise ValueError(
            f"one weight per run: {len(weights)} != {len(runs)}")
    parts = []
    for i, (r, wgt) in enumerate(zip(runs, weights)):
        wn = Window.partitionBy("query_id")
        lo, hi = F.min("score").over(wn), F.max("score").over(wn)
        norm = F.when(hi == lo, F.lit(1.0)) \
                .otherwise((F.col("score") - lo) / (hi - lo))
        parts.append(r.select("query_id", F.col(id_col),
                              F.lit(i).alias("_run"),
                              (F.lit(float(wgt)) * norm).alias("_ws")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy("query_id", id_col)
             .agg(F.aggregate(
                 F.array_sort(F.collect_list(
                     F.struct(F.col("_run").alias("k"),
                              F.col("_ws").alias("v")))),
                 F.lit(0.0), lambda acc, x: acc + x["v"]).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc(id_col))
    return (fused.withColumn("rank", F.row_number().over(w) - 1)
            .where(F.col("rank") < k)
            .select("query_id", id_col, "rank", "score")
            .orderBy("query_id", "rank"))


def rrf_fuse(runs: list, k: int = 10, c: int = 60,
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009 —
    the standard hybrid-search merge, e.g. BM25 × dense retrieval):
    rrf(d) = Σ_runs 1/(c + rank_d + 1), summed over the runs that ranked
    d, then top-k per query. Rank-based, so incomparable score scales
    (BM25 vs cosine vs QLD) fuse without calibration; c=60 is the paper's
    constant. Runs are (query_id, doc_id, rank, ...) frames — search(),
    ann top-k joined to ids, anything rank-shaped.

    Determinism: the fused sum is folded in run-ordinal order (fixed
    array_sort fold, one addend per run — the oracle replays it exactly);
    ties break on doc_id asc. Plan shape: runs are k-bounded by
    construction, so the union/groupBy move only |queries|·k·|runs| rows —
    fusion is never the scale problem; the runs are."""
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    parts = [r.select("query_id", F.col(id_col),
                      F.lit(i).alias("_run"),
                      (F.lit(1.0) / (F.lit(float(c)) + F.col("rank")
                                     + F.lit(1.0))).alias("_rr"))
             for i, r in enumerate(runs)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy("query_id", id_col)
             .agg(F.aggregate(
                 F.array_sort(F.collect_list(
                     F.struct(F.col("_run").alias("k"),
                              F.col("_rr").alias("v")))),
                 F.lit(0.0), lambda acc, x: acc + x["v"]).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc(id_col))
    return (fused.withColumn("rank", F.row_number().over(w) - 1)
            .where(F.col("rank") < k)
            .select("query_id", id_col, "rank", "score")
            .orderBy("query_id", "rank"))
