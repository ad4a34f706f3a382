"""Percolation — reverse search (Elasticsearch percolator analogue; the
reference has no equivalent): match INCOMING documents against STORED
queries. The alerting/routing primitive of a live crawl: "which standing
queries does this page satisfy" evaluated per batch, with no index of the
documents at all.

Spark-first shape: every stored query's boolean tree is COMPILED into a
Catalyst predicate over the document's analyzed token array
(``arrays_overlap`` / ``array_contains`` + AND/OR/NOT, the exact
eval_clauses candidate semantics from retrieve.py including
minimumNumberShouldMatch) — so the whole percolation is ONE whole-stage-
codegen projection per batch: no shuffle, no join, no Python. That also
makes it directly usable inside Structured Streaming (a narrow
transformation on each micro-batch).

Cost model, stated honestly: every query predicate runs against every doc
(columnar, short-circuiting on the cheap ``arrays_overlap`` prefilter that
leads each compiled tree). That is linear in |queries| per doc — fine for
the thousands of standing queries an alerting tier holds; Elasticsearch
reduces the candidate set by indexing the QUERIES' terms first, which is
the natural extension here too (a term→query inverted map joined on
exploded doc tokens) if query counts outgrow the codegen budget.

Departures, documented: index-backed expansions (wildcards, fuzzy, ranges,
regexps) are REJECTED loudly — percolation is index-free, there is no term
dictionary to expand against. Phrases match bag-of-words (any member
token), exactly like a positions-less search scores them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import TextConfig
from ..functions.analyze import analyze_documents
from .queryparse import (MUST, MUST_NOT, Clause, ParseError, QueryPlan,
                         iter_term_clauses, parse_query)


def _clause_mask(c: Clause, terms_col: Column) -> Column:
    if c.group:
        return _compile_level(c.group, terms_col, 0)
    words = [t for t, _p in c.terms]
    if len(words) == 1:
        return F.array_contains(terms_col, words[0])
    # multi-term clause (phrase bag-of-words / weighted group): matches if
    # ANY member is present — etf > 0 in the scorer kernel
    return F.arrays_overlap(terms_col, F.array(*[F.lit(w) for w in words]))


def _compile_level(clauses: list[Clause], terms_col: Column,
                   mm: int) -> Column:
    """One boolean level → Catalyst predicate; the candidate-mask subset of
    retrieve's eval_clauses (matched_any & must_ok & ~forbidden, plus the
    top-level minimumNumberShouldMatch count)."""
    matched_any = F.lit(False)
    must_ok = F.lit(True)
    forbidden = F.lit(False)
    should_cnt = F.lit(0) if mm > 0 else None
    for c in clauses:
        mask = _clause_mask(c, terms_col)
        if c.occur == MUST_NOT:
            forbidden = forbidden | mask
            continue
        if c.occur == MUST:
            must_ok = must_ok & mask
        elif should_cnt is not None:
            should_cnt = should_cnt + mask.cast("int")
        matched_any = matched_any | mask
    cand = matched_any & must_ok & ~forbidden
    if should_cnt is not None:
        cand = cand & (should_cnt >= mm)
    return cand


def percolate(docs: DataFrame, plans: list[QueryPlan],
              text_cfg: TextConfig | None = None,
              id_col: str = "id", text_col: str = "text",
              lang_col: str | None = "lang",
              min_should_match: int = 0) -> DataFrame:
    """(doc_id, query_id) for every stored query each document matches.
    Documents run through the SAME analysis chain as indexing (the
    reference's strict_check invariant), then one compiled projection
    evaluates every query."""
    for p in plans:
        for c in iter_term_clauses(p.clauses):
            if (c.prefix or c.fuzzy is not None or c.wild is not None
                    or c.regex is not None
                    or getattr(c, "trange", None) is not None):
                raise ParseError(
                    f"query {p.qid!r} uses an index-backed expansion "
                    "(wildcard/fuzzy/range/regexp); percolation is "
                    "index-free and cannot expand it")
            if getattr(c, "first", None) is not None:
                # the compiled predicates match token PRESENCE; treating a
                # span-first clause as "term anywhere" would silently widen
                # the match — refuse (positions-aware percolation would
                # need array_position, a different compile)
                raise ParseError(
                    f"query {p.qid!r} uses span_first; percolation "
                    "compiles presence predicates and cannot honor a "
                    "position bound")
    analyzed = analyze_documents(docs, text_cfg or TextConfig(),
                                 id_col=id_col, text_col=text_col,
                                 lang_col=lang_col, store_raw=False)
    terms_col = F.col("terms")
    slots = [F.struct(F.lit(p.qid).alias("query_id"),
                      _compile_level(p.clauses, terms_col,
                                     min_should_match).alias("m"))
             for p in plans]
    hits = F.filter(F.array(*slots), lambda s: s["m"])
    return (analyzed
            .select(F.col("id").alias("doc_id"),
                    F.explode(F.transform(hits, lambda s: s["query_id"]))
                    .alias("query_id")))


def percolate_texts(docs: DataFrame, queries: list[tuple[str, str]],
                    text_cfg: TextConfig | None = None,
                    mode: str = "boolean", **kw) -> DataFrame:
    plans = [parse_query(qid, q, mode=mode) for qid, q in queries]
    return percolate(docs, plans, text_cfg, **kw)


def _extract_triggers(clauses: list[Clause]) -> set[str]:
    """Necessary-condition term set (Elasticsearch's query-term extraction):
    a document can match this boolean level only if it contains ≥1 of the
    returned terms. With any MUST clause present, ONE must-clause's
    extraction is already necessary — pick the smallest. Otherwise every
    SHOULD clause is a potential trigger, so take their union (sound for
    any minimumNumberShouldMatch ≥ 0 because matched_any requires ≥1
    clause regardless). MUST_NOT contributes nothing. An empty set means
    the query can never match (e.g. only MUST_NOT clauses) — zero
    candidates is exactly right."""
    must_sets, should_sets = [], []
    for c in clauses:
        if c.occur == MUST_NOT:
            continue
        trig = (_extract_triggers(c.group) if c.group
                else {t for t, _p in c.terms})
        (must_sets if c.occur == MUST else should_sets).append(trig)
    if must_sets:
        nonempty = [s for s in must_sets if s]
        # an empty must-extraction means that clause (hence the query)
        # can never match
        if len(nonempty) < len(must_sets):
            return set()
        return min(nonempty, key=len)
    return set().union(*should_sets) if should_sets else set()


def percolate_indexed(docs: DataFrame, plans: list[QueryPlan],
                      text_cfg: TextConfig | None = None,
                      id_col: str = "id", text_col: str = "text",
                      lang_col: str | None = "lang",
                      min_should_match: int = 0) -> DataFrame:
    """The large-query-set percolation path (Elasticsearch's design:
    index the QUERIES' terms, prefilter docs against that). Semantics are
    identical to ``percolate`` (pinned by test); the execution swaps the
    run-every-predicate-on-every-doc codegen pass for candidate
    generation:

    1. each stored query yields a trigger-term set (``_extract_triggers``
       — a doc lacking every trigger cannot match), broadcast as a
       (term → query) table;
    2. distinct doc terms explode and hash-join the broadcast triggers
       (narrow — no shuffle) into candidate (doc, query) pairs, deduped
       with ONE shuffle on candidate-scale rows (two string/int columns);
    3. candidates join back to the analyzed docs (shuffle two: bounded by
       |candidates| + |docs|) and ONE chained CASE predicate — evaluated
       per candidate pair, not per (doc × query) — confirms the match.

    Cost crossover vs ``percolate``: the codegen path evaluates
    |queries| predicates per doc with zero shuffles — prefer it below
    ~1-2k stored queries; this path's per-doc cost is O(distinct terms)
    probe rows + work proportional to candidates, independent of
    |queries| — prefer it for the 10k-1M standing queries of an alerting
    tier."""
    for p in plans:
        for c in iter_term_clauses(p.clauses):
            if (c.prefix or c.fuzzy is not None or c.wild is not None
                    or c.regex is not None
                    or getattr(c, "trange", None) is not None):
                raise ParseError(
                    f"query {p.qid!r} uses an index-backed expansion "
                    "(wildcard/fuzzy/range/regexp); percolation is "
                    "index-free and cannot expand it")
            if getattr(c, "first", None) is not None:
                # the compiled predicates match token PRESENCE; treating a
                # span-first clause as "term anywhere" would silently widen
                # the match — refuse (positions-aware percolation would
                # need array_position, a different compile)
                raise ParseError(
                    f"query {p.qid!r} uses span_first; percolation "
                    "compiles presence predicates and cannot honor a "
                    "position bound")
    spark = docs.sparkSession
    analyzed = (analyze_documents(docs, text_cfg or TextConfig(),
                                  id_col=id_col, text_col=text_col,
                                  lang_col=lang_col, store_raw=False)
                .select(F.col("id"), "terms"))
    trig_rows = [(t, i) for i, p in enumerate(plans)
                 for t in sorted(_extract_triggers(p.clauses))]
    if not trig_rows:
        return spark.createDataFrame([], "doc_id string, query_id string")
    trig = spark.createDataFrame(trig_rows, "term string, qidx int")
    cand = (analyzed
            .select("id", F.explode(F.array_distinct("terms")).alias("term"))
            .join(F.broadcast(trig), "term")
            .select("id", "qidx").distinct())
    joined = cand.join(analyzed, "id")
    expr = None
    for i, p in enumerate(plans):
        m = _compile_level(p.clauses, F.col("terms"), min_should_match)
        expr = (F.when(F.col("qidx") == i, m) if expr is None
                else expr.when(F.col("qidx") == i, m))
    qids = F.array(*[F.lit(p.qid) for p in plans])
    return (joined.where(expr)
            .select(F.col("id").alias("doc_id"),
                    F.element_at(qids, F.col("qidx") + 1).alias("query_id")))
