"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All are pure Catalyst plans (JVM-side string ops, no Python UDFs) so they
fuse into the scan stage via whole-stage codegen — at 100 TB these run at
I/O speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stopwords import LUCENE_ENGLISH_STOPWORDS

_TOKENS = lambda c: F.filter(F.split(F.trim(F.col(c)), r"\s+"), lambda t: t != "")


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_distinct, n_chars) per document."""
    toks = _TOKENS(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score in [0,1]:

    - mean word length (2..12 is web-text normal)
    - stopword ratio (natural English prose ≈ 0.2-0.6)
    - alpha ratio (fraction of alphabetic chars)
    - repetition: distinct/total token ratio
    """
    toks = _TOKENS(text_col)
    stop_arr = F.array(*[F.lit(w) for w in sorted(LUCENE_ENGLISH_STOPWORDS)])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    mean_wl = F.aggregate(toks, F.lit(0).cast("long"),
                          lambda acc, t: acc + F.length(t)).cast("double") / n_tok
    alpha_ratio = (F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", "")) /
                   F.greatest(F.length(F.col(text_col)), F.lit(1)))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    out = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
    )
    score = (
        F.when((F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0)
        + F.when(F.col("alpha_ratio") >= 0.5, 0.25).otherwise(0.0)
        + F.when(F.col("distinct_ratio") >= 0.2, 0.25).otherwise(0.0)
    )
    return out.withColumn("quality", score)


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Heuristic language ID: English-stopword hit-rate + script detection.

    A real pipeline plugs fasttext/CLD3 in via mapInPandas; the heuristic
    keeps the operator dependency-free and deterministic: eng if ≥ 12% of
    tokens are English stopwords, zho if CJK chars dominate, else und.
    """
    toks = _TOKENS(text_col)
    stop_arr = F.array(*[F.lit(w) for w in sorted(LUCENE_ENGLISH_STOPWORDS)])
    n_tok = F.greatest(F.size(toks), F.lit(1))
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))) / n_tok
    cjk_ratio = (F.length(F.regexp_replace(F.col(text_col), r"[^\x{4e00}-\x{9fff}]", "")) /
                 F.greatest(F.length(F.col(text_col)), F.lit(1)))
    return docs.select(
        F.col(id_col),
        F.round(stop_ratio, 6).alias("eng_stop_ratio"),
        F.when(cjk_ratio > 0.25, "zho")
         .when(stop_ratio >= 0.12, "eng")
         .otherwise("und").alias("lang_guess"),
    )


def fingerprints(docs: DataFrame, shingle: int = 5, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: min md5 over word-``shingle``-grams
    (a 1-hash MinHash — robust to reordering beyond the shingle window).
    Documents shorter than the shingle fall back to hashing the whole text.
    """
    toks = _TOKENS(text_col)
    d = docs.select(F.col(id_col), toks.alias("toks"), F.col(text_col))
    exploded = (d.select(id_col, F.posexplode("toks").alias("pos", "tok"), "toks")
                .where(F.col("pos") <= F.size("toks") - shingle)
                .select(id_col,
                        F.md5(F.concat_ws(" ", F.slice("toks", F.col("pos") + 1, shingle)))
                        .alias("shingle_hash")))
    fp = exploded.groupBy(id_col).agg(F.min("shingle_hash").alias("fingerprint"))
    short = (d.where(F.size("toks") < shingle)
             .select(id_col, F.md5(F.col(text_col)).alias("fingerprint")))
    return fp.unionByName(short)
