"""Composed corpus-cleaning recipes for training-data pipelines.

The individual operators (dedup, textstats, weburl) are the primitives; a
real 100 TB ingestion run chains them. `clean_corpus` is that chain as one
lazy DataFrame plan — RefinedWeb/C4-shaped: boilerplate-line removal, then
exact document dedup, then heuristic quality filtering — with a per-stage
survivor count frame so the run reports its own funnel (the number every
data-curation paper publishes).

Scale shape: each stage is one of the already-audited plans (line_dedup:
md5-keyed agg + anti-join; exact dedup: one hash agg; quality: pure
per-row Catalyst). Composition adds NO new shuffles beyond the stages
themselves, and the funnel counts reuse the same lazy frames — Spark
evaluates the chain once per action as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import line_dedup
from .textstats import _TOKENS


def _stage_frames(docs: DataFrame, id_col: str, text_col: str, *,
                  line_min_docs: int, min_tokens: int,
                  min_distinct_ratio: float
                  ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(cleaned, deduped, final) — the ONE definition of the three stage
    plans, shared by `clean_corpus` and `clean_corpus_funnel` so the funnel
    counts can never desynchronize from the corpus the recipe produces.

    1. line dedup  — drop lines whose trimmed form occurs in ≥
       ``line_min_docs`` distinct docs (site chrome); docs reduced to
       nothing are dropped.
    2. exact dedup — among byte-identical cleaned texts, keep the doc with
       the smallest id (deterministic survivor, same rule as
       dedup.exact_duplicates' canonical_id). One shuffle on the 16-byte
       md5 of the text.
    3. quality     — keep docs with ≥ ``min_tokens`` tokens AND a
       distinct/total token ratio > ``min_distinct_ratio`` (the repetition
       screen from quality_scores, C4/Gopher-style).
    """
    cleaned = (line_dedup(docs, id_col, text_col, min_docs=line_min_docs)
               .where(F.trim(F.col("clean_text")) != "")
               .select(F.col(id_col), F.col("clean_text").alias(text_col)))
    w = Window.partitionBy(F.md5(F.col(text_col)))
    deduped = (cleaned
               .withColumn("_keep", F.min(id_col).over(w))
               .where(F.col("_keep") == F.col(id_col))
               .drop("_keep"))
    toks = _TOKENS(text_col)
    n_tok = F.size(toks)
    quality_ok = ((n_tok >= min_tokens)
                  & (F.size(F.array_distinct(toks))
                     > F.lit(min_distinct_ratio) * n_tok))
    return cleaned, deduped, deduped.where(quality_ok)


def clean_corpus(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", *, line_min_docs: int = 2,
                 min_tokens: int = 5,
                 min_distinct_ratio: float = 0.3) -> DataFrame:
    """The cleaned corpus: (id, text) after all three stages — see
    :func:`_stage_frames` for the stage definitions."""
    _, _, final = _stage_frames(
        docs, id_col, text_col, line_min_docs=line_min_docs,
        min_tokens=min_tokens, min_distinct_ratio=min_distinct_ratio)
    return final


def clean_corpus_funnel(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", *, line_min_docs: int = 2,
                        min_tokens: int = 5,
                        min_distinct_ratio: float = 0.3) -> DataFrame:
    """Per-stage survivor counts: (stage_no, stage, docs_out) — the
    curation funnel. One row per stage including the input row, ordered by
    stage_no, computed from the SAME stage frames `clean_corpus` returns
    (one shared builder, so the funnel cannot drift from the corpus)."""
    cleaned, deduped, final = _stage_frames(
        docs, id_col, text_col, line_min_docs=line_min_docs,
        min_tokens=min_tokens, min_distinct_ratio=min_distinct_ratio)
    stages = [("input", docs), ("line_dedup", cleaned),
              ("exact_dedup", deduped), ("quality", final)]
    counts = None
    for i, (name, frame) in enumerate(stages):
        row = frame.agg(F.count("*").alias("docs_out")).select(
            F.lit(i).cast("long").alias("stage_no"),
            F.lit(name).alias("stage"), F.col("docs_out"))
        counts = row if counts is None else counts.unionByName(row)
    return counts.orderBy("stage_no")
