"""TREC-format IO: qrels, run files, patapsco jsonl/TSV docs and topics.

Readers/writers rebuild the reference's format surface as Spark scans/sinks:

- qrels (S14): ``qid it docno rel``, space or tab sniffed from line 1
  (/root/reference/patapsco/util/formats.py:96-110)
- TREC run (S13/K4): ``qid Q0 docno rank score system``
  (/root/reference/patapsco/results.py:34-108, line format :64)
- HC4 jsonl docs (S1): ``{id, title, text, date}`` → text = title.strip() +
  ' ' + text.strip() (/root/reference/patapsco/docs.py:62-99, join :92)
- MSMARCO TSV docs/queries (S3/S9): ``docid \\t text``
  (/root/reference/patapsco/docs.py:102-125, topics.py:215-239)
- HC4 jsonl topics (S8): nested topics[] selected by (lang, source), skip
  null title/desc, optional qrels-lang gate
  (/root/reference/patapsco/topics.py:145-212)

Everything is a native DataFrame scan — gz handled by Spark codecs, globs by
the path API; the reference's GlobIterator fail-on-empty check (S16,
/root/reference/patapsco/util/__init__.py:222-301) becomes an explicit
assert_nonempty helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "id string, title string, text string, date string"
QRELS_SCHEMA = "query_id string, iteration string, doc_id string, relevance int"


class EmptyInputError(ValueError):
    pass


def assert_nonempty(df: DataFrame, what: str) -> DataFrame:
    if df.isEmpty():
        raise EmptyInputError(f"no input rows for {what}")
    return df


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """(query_id, doc_id, relevance); separator sniffed per-row (the
    reference sniffs line 1 of one file; per-row regex handles mixed globs)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return assert_nonempty(
        lines.select(parts.getItem(0).alias("query_id"),
                     parts.getItem(2).alias("doc_id"),
                     parts.getItem(3).cast("int").alias("relevance")),
        f"qrels at {path}")


def read_trec_run(spark: SparkSession, path: str) -> DataFrame:
    """TREC run file → (query_id, doc_id, rank, score, system)."""
    lines = spark.read.text(path)
    p = F.split(F.trim(F.col("value")), r"\s+")
    return assert_nonempty(
        lines.select(p.getItem(0).alias("query_id"),
                     p.getItem(2).alias("doc_id"),
                     p.getItem(3).cast("int").alias("rank"),
                     p.getItem(4).cast("double").alias("score"),
                     p.getItem(5).alias("system")),
        f"run file at {path}")


def write_trec_run(results: DataFrame, path: str, system: str = "patapsco-spark",
                   single_file: bool = True) -> None:
    """Results (query_id, doc_id, rank, score) → TREC run lines, sorted by
    (query_id, rank) like the reference's per-query streaming write.
    ``single_file=False`` keeps one part per partition for huge runs."""
    lines = results.select(F.format_string(
        "%s Q0 %s %d %s %s",
        "query_id", "doc_id", F.col("rank").cast("int"),
        F.col("score").cast("string"), F.lit(system)).alias("value"),
        "query_id", "rank").orderBy("query_id", "rank").select("value")
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def read_hc4_docs(spark: SparkSession, path: str, lang: str = "eng") -> DataFrame:
    """HC4 jsonl docs → (id, lang, text, date); text = title + ' ' + text."""
    raw = spark.read.schema(DOC_SCHEMA).json(path)
    return assert_nonempty(
        raw.select(
            "id", F.lit(lang).alias("lang"),
            F.concat_ws(" ", F.trim("title"), F.trim("text")).alias("text"),
            "date"),
        f"hc4 docs at {path}")


def read_tsv_docs(spark: SparkSession, path: str, lang: str = "eng") -> DataFrame:
    """MSMARCO-style TSV (docid \\t text) → (id, lang, text)."""
    raw = (spark.read.option("sep", "\t")
           .schema("id string, text string").csv(path))
    return assert_nonempty(
        raw.select("id", F.lit(lang).alias("lang"), "text"),
        f"tsv docs at {path}")


def read_hc4_topics(spark: SparkSession, path: str, lang: str, source: str,
                    qrels_lang: str | None = None) -> DataFrame:
    """HC4 jsonl topics → (id, lang, title, desc, report): explode topics[],
    filter (lang, source), skip null title/desc, optional qrels-lang gate."""
    raw = spark.read.json(path)
    df = raw
    if qrels_lang is not None:
        df = df.where(F.array_contains("languages_with_qrels", qrels_lang))
    t = (df.select("topic_id",
                   F.col("report.text").alias("report") if "report" in raw.columns
                   else F.lit(None).cast("string").alias("report"),
                   F.explode("topics").alias("t"))
         .where((F.col("t.lang") == lang) & (F.col("t.source") == source))
         .where(F.col("t.topic_title").isNotNull() &
                F.col("t.topic_description").isNotNull())
         .select(F.col("topic_id").alias("id"), F.lit(lang).alias("lang"),
                 F.trim("t.topic_title").alias("title"),
                 F.trim("t.topic_description").alias("desc"),
                 "report"))
    return assert_nonempty(t, f"hc4 topics at {path} for {lang}/{source}")


def topics_to_query_texts(topics: DataFrame, fields: tuple[str, ...] = ("title",)) -> DataFrame:
    """TopicProcessor (T16): join selected fields with ' '
    (/root/reference/patapsco/topics.py:55-93)."""
    return topics.select(
        F.col("id").alias("query_id"),
        F.concat_ws(" ", *[F.trim(f) for f in fields]).alias("text"))
