"""Patapsco jsonl artifact format — write/read parity for the reference's
run artifacts, so a patapsco user can exchange files with this engine:

- ``documents.jsonl`` (K1/S5): Doc rows ``{id, lang, text, date}``
  (``original_text`` is never serialized — docs.py:178-180)
- ``queries.jsonl``   (K2/S11): Query rows ``{id, lang, query, text, report}``
- ``results.jsonl``   (K3/S12): one row per query:
  ``{query: {…Query}, doc_lang, system, results: [{doc_id, rank, score}]}``
  (results.py:111-142)

Readers are native Spark json scans with explicit schemas (never
inferSchema); the nested results artifact round-trips through
``collect_list(struct(...))`` / ``explode``. Writers preserve the
reference's ensure_ascii=False behavior via the json sink's default UTF-8,
and serialize explicit nulls (ignoreNullFields=false): patapsco's readers
construct dataclasses with ``Cls(**json.loads(line))``, so a dropped null
key would crash them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DOC_ARTIFACT_SCHEMA = "id string, lang string, text string, date string"
QUERY_ARTIFACT_SCHEMA = ("id string, lang string, query string, text string, "
                         "report string")
RESULTS_ARTIFACT_SCHEMA = (
    "query struct<id: string, lang: string, query: string, text: string, "
    "report: string>, doc_lang string, system string, "
    "results array<struct<doc_id: string, rank: int, score: double>>")


def write_docs_artifact(docs: DataFrame, path: str) -> None:
    """(id, lang, text[, date]) → documents.jsonl-format directory."""
    cols = [F.col("id"), F.col("lang"), F.col("text")]
    cols.append(F.col("date") if "date" in docs.columns
                else F.lit(None).cast("string").alias("date"))
    docs.select(*cols).write.mode("overwrite").option("ignoreNullFields", "false").json(path)


def read_docs_artifact(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(DOC_ARTIFACT_SCHEMA).json(path)


def write_queries_artifact(queries: DataFrame, path: str) -> None:
    """(id, lang, query, text[, report]) → queries.jsonl format."""
    cols = [F.col("id"), F.col("lang"), F.col("query"), F.col("text")]
    cols.append(F.col("report") if "report" in queries.columns
                else F.lit(None).cast("string").alias("report"))
    queries.select(*cols).write.mode("overwrite").option("ignoreNullFields", "false").json(path)


def read_queries_artifact(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(QUERY_ARTIFACT_SCHEMA).json(path)


def write_results_artifact(results: DataFrame, queries: DataFrame, path: str,
                           system: str = "patapsco-spark",
                           doc_lang: str = "eng") -> None:
    """Flat results (query_id, doc_id, rank, score) + queries table →
    nested one-row-per-query results.jsonl format."""
    q = queries.select(
        F.struct(F.col("id"), F.col("lang"), F.col("query"), F.col("text"),
                 F.col("report")).alias("query"),
        F.col("id").alias("query_id"))
    nested = (results
              .withColumn("r", F.struct(
                  F.col("doc_id"),
                  F.col("rank").cast("int").alias("rank"),
                  F.col("score").cast("double").alias("score")))
              .groupBy("query_id")
              .agg(F.sort_array(F.collect_list(
                  F.struct(F.col("rank").alias("o"), F.col("r")))).alias("rs"))
              .select("query_id", F.transform("rs", lambda x: x["r"]).alias("results")))
    (nested.join(q, "query_id")
           .select("query", F.lit(doc_lang).alias("doc_lang"),
                   F.lit(system).alias("system"), "results")
           .write.mode("overwrite").option("ignoreNullFields", "false").json(path))


def read_results_artifact(spark: SparkSession, path: str,
                          flatten: bool = True) -> DataFrame:
    df = spark.read.schema(RESULTS_ARTIFACT_SCHEMA).json(path)
    if not flatten:
        return df
    return (df.select(F.col("query.id").alias("query_id"), "doc_lang",
                      "system", F.explode("results").alias("r"))
            .select("query_id", "doc_lang", "system",
                    F.col("r.doc_id").alias("doc_id"),
                    F.col("r.rank").alias("rank"),
                    F.col("r.score").alias("score")))
