"""Query-assist surfaces over the term dictionary: autocomplete + spell.

A search frontend needs two query-time helpers the index already paid
for: prefix AUTOCOMPLETE ("dat" → "data", "database", …) and spell
SUGGESTION ("qeury" → "query") — both are reads of the term_stats
dictionary (term, df, cf), ranked by corpus evidence. They share the
retrieval layer's segment/snapshot gating (``read_term_stats``) so a
suggestion can never surface a term from an uncommitted append.

Ranking policy (stated, since suggesters are policy):
- completions: cf desc (corpus frequency — what users most likely mean),
  term asc on ties. df ships too so callers can re-rank by document
  coverage instead.
- spell: edit distance asc FIRST (closer beats commoner — Lucene's
  DirectSpellChecker default), then cf desc, term asc. The input term
  itself is excluded; ``min_cf`` screens hapax noise (OCR junk dominates
  a web dictionary's tail).

Scale shape: completions push a ``StartsWith`` filter into the parquet
scan (dictionary-encoded column — near-free) and take top-k via sort;
spell cannot push levenshtein, but pushes a LENGTH BAND (|len(term) -
len(q)| ≤ max_edits, a necessary condition for edit distance) plus a
first-character prefilter when ``prefix_lock`` (Lucene's prefixLength
analogue, default 1: typos rarely hit the first letter) — the remaining
candidates run JVM-side ``levenshtein`` (Catalyst built-in, no Python).
Both return driver-sized frames (k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import read_term_stats
from .retrieve import load_index_meta


def _dictionary(spark: SparkSession, index_path: str) -> DataFrame:
    """(term, df, cf) over the committed segments of the live generation."""
    meta = load_index_meta(index_path)
    shard_base = int(meta.get("shard_base", 0))
    stats_base = int(meta.get("stats_base", shard_base))
    return read_term_stats(spark, index_path,
                           num_shards=int(meta["num_shards"]),
                           shard_base=stats_base)


def suggest_completions(spark: SparkSession, index_path: str, prefix: str,
                        k: int = 10) -> DataFrame:
    """Top-k dictionary terms extending ``prefix``: (term, df, cf) by
    (cf desc, term asc). Empty prefix is refused — that is "the whole
    dictionary sorted", a different (and driver-hostile) query."""
    if not prefix:
        raise ValueError("completion prefix must be non-empty")
    return (_dictionary(spark, index_path)
            .where(F.col("term").startswith(prefix))
            .orderBy(F.col("cf").desc(), F.col("term").asc())
            .limit(k))


def suggest_spelling(spark: SparkSession, index_path: str, term: str,
                     k: int = 5, max_edits: int = 2, min_cf: int = 2,
                     prefix_lock: int = 1) -> DataFrame:
    """Top-k spelling suggestions for ``term``: dictionary terms within
    ``max_edits`` Levenshtein edits, (distance asc, cf desc, term asc),
    the input itself excluded. ``prefix_lock`` first characters must
    match exactly (0 disables); ``min_cf`` drops tail noise."""
    if not term:
        raise ValueError("spell target must be non-empty")
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    d = _dictionary(spark, index_path)
    n = len(term)
    cand = d.where(
        (F.length("term") >= n - max_edits)
        & (F.length("term") <= n + max_edits)
        & (F.col("term") != term)
        & (F.col("cf") >= min_cf))
    if prefix_lock > 0:
        cand = cand.where(
            F.col("term").startswith(term[:prefix_lock]))
    return (cand.withColumn("distance", F.levenshtein(F.col("term"),
                                                      F.lit(term)))
            .where(F.col("distance") <= max_edits)
            .orderBy(F.col("distance").asc(), F.col("cf").desc(),
                     F.col("term").asc())
            .limit(k)
            .select("term", "distance", "df", "cf"))


def _collect_bigram_lm(lm_docs: DataFrame, vocab: list[str],
                       text_col: str) -> tuple[int, dict, dict]:
    """(total tokens, unigram counts, bigram counts) restricted to a
    candidate vocabulary — computed DISTRIBUTED (two combinable aggs with
    the vocab filter pushed in), collected bounded (≤ |vocab| + |vocab|²
    rows). Shared by the phrase suggester and context completions."""
    from ..operators.textstats import _adjacent_pairs
    from ..partitioning import widen_for_kernel

    # two corpus passes below (unigram agg incl. total, bigram agg) —
    # widen the usually-narrow small-corpus scan once (no-op at scale)
    lm_docs = widen_for_kernel(lm_docs)
    toks_arr = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                        lambda t: t != "")
    words = lm_docs.select(F.explode(toks_arr).alias("w"))
    # the token total and the vocab-filtered unigram counts fold into ONE
    # aggregation: out-of-vocab tokens group under NULL, total = Σ all
    # groups (was a separate count() job — same rows read twice)
    uni = (words.groupBy(F.when(F.col("w").isin(vocab), F.col("w"))
                         .alias("w"))
           .agg(F.count("*").alias("n")).collect())
    total = sum(int(r["n"]) for r in uni)
    if total == 0:
        raise ValueError("lm_docs produced no tokens")
    c1 = {r["w"]: int(r["n"]) for r in uni if r["w"] is not None}
    bi = (lm_docs.select(F.explode(_adjacent_pairs(toks_arr)).alias("p"))
          .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
          .where(F.col("a").isin(vocab) & F.col("b").isin(vocab))
          .groupBy("a", "b").agg(F.count("*").alias("n")).collect())
    c2 = {(r["a"], r["b"]): int(r["n"]) for r in bi}
    return total, c1, c2


def suggest_phrase(spark: SparkSession, index_path: str, text: str,
                   lm_docs: DataFrame, *, k: int = 3,
                   max_candidates: int = 3, max_edits: int = 2,
                   min_cf: int = 2, prefix_lock: int = 1,
                   alpha: float = 0.4, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_combos: int = 10_000) -> DataFrame:
    """ES phrase suggester — whole-query "did you mean" (public docs,
    "Phrase suggester"): per-position candidates from the term
    dictionary (Levenshtein ≤ ``max_edits``, the original token included
    at distance 0 when indexed, ranked distance asc / cf desc / term asc,
    capped at ``max_candidates``; a position with no dictionary
    neighbour keeps its original token), then every candidate
    combination is scored by a stupid-backoff BIGRAM language model
    (Brants et al. 2007 — ES's default phrase-suggest smoothing) built
    from ``lm_docs``:

        logp = ln u(w1) + Σ_i ln p(w_i | w_{i-1})
        p(b|a) = c2(a,b)/c1(a)  if the bigram was seen,
                 alpha · u(b)   otherwise
        u(w)   = c1(w)/total    if seen, else alpha/total (OOV floor)

    Top-k (logp desc, suggestion asc) rows (suggestion, logp).

    Driver-bounded by design, like every query-assist surface here: the
    candidate collect is positions × max_candidates rows; the LM lookups
    are filtered DISTRIBUTED to the candidate vocabulary before
    collecting (≤ vocab c1 rows + vocab² c2 rows — dozens); combination
    scoring is pure driver arithmetic over ≤ max_candidates^positions
    combos, refused loudly above ``max_combos`` rather than silently
    truncated. The LM count scans are one groupBy each over ``lm_docs``
    with the vocabulary filter pushed into them."""
    toks = [t for t in text.split() if t]
    if not toks:
        raise ValueError("phrase-suggest input must contain tokens")
    if max_candidates < 1:
        raise ValueError("max_candidates must be >= 1")
    d = _dictionary(spark, index_path).select("term", "cf")

    # ONE candidate job for ALL distinct tokens (was a collect per token:
    # N driver round-trips of 2 jobs each for an N-token query): broadcast
    # the tiny token table against the dictionary with the same pushed
    # length-band / prefix-lock / min_cf prefilters, rank per token with a
    # window (identical (distance asc, cf desc, term asc) order), cut at
    # max_candidates, collect once
    from pyspark.sql import Window

    uniq = sorted(set(toks))
    toks_df = spark.createDataFrame([(t,) for t in uniq], "tok string")
    cond = ((F.length("term") >= F.length("tok") - max_edits)
            & (F.length("term") <= F.length("tok") + max_edits)
            & (F.col("cf") >= min_cf))
    if prefix_lock > 0:
        cond = cond & F.col("term").startswith(
            F.substring(F.col("tok"), 1, prefix_lock))
    w = Window.partitionBy("tok").orderBy(
        F.col("distance").asc(), F.col("cf").desc(), F.col("term").asc())
    rows = (d.join(F.broadcast(toks_df), cond)
            .withColumn("distance", F.levenshtein(F.col("term"),
                                                  F.col("tok")))
            .where(F.col("distance") <= max_edits)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= max_candidates)
            .select("tok", "term", "rn").collect())
    cands: dict[str, list[str]] = {t: [] for t in uniq}
    for r in sorted(rows, key=lambda r: (r["tok"], r["rn"])):
        cands[r["tok"]].append(r["term"])
    for t in uniq:  # a token with no dictionary neighbour keeps itself
        cands[t] = cands[t] or [t]

    n_combos = 1
    for tok in toks:
        n_combos *= len(cands[tok])
    if n_combos > max_combos:
        raise ValueError(
            f"{n_combos} candidate combinations exceed max_combos="
            f"{max_combos}; lower max_candidates or split the query")

    vocab = sorted({w for c in cands.values() for w in c})
    total, c1, c2 = _collect_bigram_lm(lm_docs, vocab, text_col)

    import math

    def u(w: str) -> float:
        cw = c1.get(w, 0)
        return cw / total if cw > 0 else alpha / total

    def score(combo: tuple[str, ...]) -> float:
        lp = math.log(u(combo[0]))
        for a, b in zip(combo, combo[1:]):
            c2ab = c2.get((a, b), 0)
            if c2ab > 0:
                lp += math.log(c2ab / c1[a])
            else:
                lp += math.log(alpha * u(b))
        return lp

    from itertools import product
    scored = [(" ".join(combo), score(combo))
              for combo in product(*(cands[t] for t in toks))]
    scored.sort(key=lambda sv: (-sv[1], sv[0]))
    return spark.createDataFrame(scored[:k], "suggestion string, logp double")


def suggest_completions_context(spark: SparkSession, index_path: str,
                                prefix: str, prev_word: str,
                                lm_docs: DataFrame, *, k: int = 10,
                                max_candidates: int = 50,
                                alpha: float = 0.4,
                                text_col: str = "text") -> DataFrame:
    """Context-aware completion — search-as-you-type: dictionary
    completions of ``prefix`` re-ranked by the stupid-backoff bigram
    probability given the PRECEDING word ("data s…" ranks "stream" above
    equally-frequent s-words the corpus never puts after "data"). The ES
    completion/context suggester shape, with corpus LM evidence instead
    of hand-assigned context weights:

        P(cand | prev) = c2(prev, cand) / c1(prev)   if the bigram was seen,
                         alpha · u(cand)             otherwise

    (u as in :func:`suggest_phrase`). Candidate pool = the top
    ``max_candidates`` static completions (cf desc — the plain
    suggest_completions ranking); ties after the LM re-rank break by
    cf desc, term asc. Returns (suggestion, prob, cf) top-k.

    Driver-bounded like every suggester: one pushed-StartsWith dictionary
    read (pool rows), the shared vocabulary-filtered LM aggs
    (_collect_bigram_lm), and a pool-sized re-rank in the driver."""
    if not prefix:
        raise ValueError("completion prefix must be non-empty")
    if not prev_word:
        raise ValueError("context word must be non-empty")
    pool = suggest_completions(spark, index_path, prefix,
                               k=max_candidates).collect()
    if not pool:
        return spark.createDataFrame(
            [], "suggestion string, prob double, cf long")
    vocab = sorted({r["term"] for r in pool} | {prev_word})
    total, c1, c2 = _collect_bigram_lm(lm_docs, vocab, text_col)

    def u(w: str) -> float:
        cw = c1.get(w, 0)
        return cw / total if cw > 0 else alpha / total

    def prob(cand: str) -> float:
        n2 = c2.get((prev_word, cand), 0)
        if n2 > 0:
            return n2 / c1[prev_word]
        return alpha * u(cand)

    scored = [(r["term"], prob(r["term"]), int(r["cf"])) for r in pool]
    scored.sort(key=lambda svc: (-svc[1], -svc[2], svc[0]))
    return spark.createDataFrame(scored[:k],
                                 "suggestion string, prob double, cf long")
