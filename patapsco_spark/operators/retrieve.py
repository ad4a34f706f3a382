"""Distributed top-k retrieval over the sharded index — the rebuild of the
reference's ``PyseriniRetriever`` (/root/reference/patapsco/retrieve.py), with
scoring natively re-implemented to be score-identical to Lucene 8:

- BM25 (defaults k1=0.9, b=0.4 — /root/reference/patapsco/schema.py:169-170):
      idf = ln(1 + (N - df + 0.5)/(df + 0.5))
      score = Σ_t idf_t · tf/(tf + k1·(1 - b + b·dlq/avgdl))
  with dlq the SmallFloat-quantized doc length and avgdl = float32(Σdl/N),
  exactly as Lucene's BM25Similarity computes them (no (k1+1) numerator in
  Lucene ≥ 8).
- QLD / LMDirichlet (mu=1000 — schema.py:171-172):
      score_t = ln(1 + tf/(mu·p(t|C))) + ln(mu/(dlq + mu)),  clamped ≥ 0
      p(t|C) = (cf + 1)/(total_tf + 1)
- PSQ clauses score expected statistics (etf = Σ p·tf, edf = Σ p·df) and
  reproduce the reference's pinned goldens (tests/test_psq.py:48-66).
- Boolean MUST/MUST_NOT filter; matching SHOULD/MUST clauses sum; ties break
  by ascending docid like Lucene's internal-docid tie-break.

Physical plan (100 TB thinking): postings are document-sharded, so each
shard computes its exact local top-k independently — a cogrouped
``applyInPandas`` over (postings-for-query-terms ⨝ norms) per shard — and the
global result is a tiny k×shards window merge. The postings read is
partition-pruned by shard layout and predicate-pushed on ``term`` (postings
files are sorted by term within shards → Parquet row-group pruning).
"""

from __future__ import annotations

import math
import re
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import RetrieveConfig, TextConfig
from ..functions.analyze import analyze_tokens_batch
from ..functions.codec import decode_blocks
from ..functions.smallfloat import quantize_length
from ..plans import fsio
from ..plans import manifest as mf
from ..plans.pqread import read_parquet
from .queryparse import (MUST, MUST_NOT, SHOULD, QueryPlan,
                         iter_term_clauses, parse_query)

RESULT_SCHEMA = "query_id string, docid long, score double"


def load_index_meta(index_path: str) -> dict:
    man = mf.read_manifest(index_path)
    if man is None:
        raise FileNotFoundError(f"no index manifest at {index_path}")
    return man["config"]


def open_pit(index_path: str) -> dict:
    """Open a point-in-time view (Elasticsearch PIT / Lucene IndexReader
    refcount analogue, file-based): returns the index's CURRENT committed
    manifest config; pass it to ``search(..., pit=...)`` to pin every read
    of a multi-request session (search_after paging, sliced scroll) to
    this snapshot. Appends are additive — a newer manifest only ADDS
    shards and stats segments above the pinned ranges — so a PIT stays
    valid and byte-stable across concurrent appends. Compaction DELETES
    the superseded generation's files; search detects that (the PIT's
    live shards or stats segments are no longer retained) and refuses
    loudly instead of silently reading the wrong generation. There is no
    keep-alive lease: validity is bounded by the index's compaction
    schedule — the documented tradeoff of a file-based PIT (ES holds
    segment refcounts in-process; a shared-nothing reader cannot).

    Documented departure from ES: TOMBSTONES are read live — a
    delete-by-query issued after open_pit IS visible through the PIT
    (ES pins per-segment live-docs bitsets; here tombstones are a shared
    additive sidecar, and snapshotting them would mean collecting every
    tombstone file list into the PIT handle). Appends and stats growth
    are fully shielded; deletes are not."""
    return dict(load_index_meta(index_path))


def _live_ranges(meta: dict) -> list[tuple[int, int]]:
    """The committed live shard set as sorted half-open intervals:
    [shard_base, num_shards) minus tiered-compaction dead_ranges."""
    a, b = int(meta.get("shard_base", 0)), int(meta["num_shards"])
    holes = sorted((int(x), int(y))
                   for x, y in (meta.get("dead_ranges") or []))
    out, cur = [], a
    for x, y in holes:
        x, y = max(x, a), min(y, b)
        if x >= y:
            continue
        if x > cur:
            out.append((cur, x))
        cur = max(cur, y)
    if cur < b:
        out.append((cur, b))
    return out


def _check_pit_valid(pit_meta: dict, cur_meta: dict) -> None:
    """A PIT is valid iff every shard and stats segment live at open time
    is still retained: appends only add, so staleness means a compaction
    flipped or collapsed the pinned generation — reading on would scan
    deleted/re-bucketed directories and silently return the WRONG
    generation's rows."""
    cur_live = _live_ranges(cur_meta)
    for a, b in _live_ranges(pit_meta):
        pos = a
        for x, y in cur_live:
            if x <= pos < y:
                pos = min(b, y)
            if pos >= b:
                break
        if pos < b:
            raise ValueError(
                f"point-in-time is stale: pinned shards [{pos}, {b}) were "
                f"removed by compaction — reopen the PIT (open_pit)")
    pit_stats = int(pit_meta.get("stats_base",
                                 pit_meta.get("shard_base", 0)))
    cur_stats = int(cur_meta.get("stats_base",
                                 cur_meta.get("shard_base", 0)))
    if cur_stats > pit_stats:
        raise ValueError(
            f"point-in-time is stale: stats segments below {cur_stats} "
            f"were collapsed by compaction — reopen the PIT (open_pit)")


def process_queries(texts: Iterable[tuple[str, str]], text_cfg: TextConfig,
                    lang: str = "eng", mode: str = "plain") -> list[QueryPlan]:
    """Raw query texts → plans, via the same analysis chain as documents
    (the reference enforces identical processing via strict_check,
    /root/reference/patapsco/job.py:952-962)."""
    qids = [q for q, _ in texts]
    raw = [t for _, t in texts]
    if mode == "plain":
        terms = analyze_tokens_batch(pd.Series(raw), text_cfg, lang=lang)
        return [parse_query(qid, "", "plain", terms=list(t))
                for qid, t in zip(qids, terms)]
    return [parse_query(qid, t, mode) for qid, t in zip(qids, raw)]


def search(spark: SparkSession, index_path: str, plans: list[QueryPlan],
           cfg: RetrieveConfig | None = None,
           count_only: bool = False,
           matches_only: bool = False,
           stats_override: dict | None = None,
           synonyms: dict | None = None,
           dv_filter: tuple[str, float | None, float | None] | None = None,
           dv_boost: tuple[str, dict] | None = None,
           pit: dict | None = None) -> DataFrame:
    """Run all query plans over the index; returns
    (query_id, doc_id, docid, rank, score) with rank starting at 0
    (reference: enumerate(hits), retrieve.py:146).

    ``pit`` pins every read to a point-in-time manifest snapshot from
    :func:`open_pit` — stable paging across concurrent appends; staleness
    (a compaction removed pinned files) refuses loudly. None = read the
    current committed manifest, the default snapshot-per-call isolation.

    ``count_only`` collects total hit counts instead of hits — Lucene's
    TotalHitCountCollector: (query_id, total_hits), queries matching
    nothing omitted. Per-shard counting in the same kernel (one number per
    query×shard crosses the Arrow boundary), summed JVM-side.

    ``matches_only`` returns the FULL match set — (query_id, doc_id,
    docid, score), no rank, no top-k cut — the collector behind
    sort-by-field and match-set aggregations (operators/aggs.py). The
    result stays distributed (it can be huge); external ids resolve via a
    shuffle join against norms, NOT the broadcast the k-bounded path
    uses.

    ``stats_override`` replaces the scoring statistics with caller-supplied
    GLOBAL ones — {"num_docs", "total_tf", "avgdl", "df_map": {term: (df,
    cf)}} — the hook operators/federate.py uses to score one index of a
    multi-index federation under the combined corpus statistics (Lucene
    MultiReader semantics). The term-stats read is skipped entirely.
    Multiterm expansion (wildcard/fuzzy/range/regexp) and phrase rewrites
    derive terms from THIS index's dictionary, whose stats the override
    cannot know — rejected loudly rather than silently scoring df=0.

    ``synonyms`` maps an ANALYZED query term → its equivalents (also
    analyzed): a bare term clause naming a mapped term scores with Lucene
    SynonymQuery semantics — tf = Σ member tfs per doc, df = max member
    df, cf = Σ member cf (see _rewrite_synonym_plans). Phrase members are
    not expanded.

    ``dv_filter`` = (name, lo, hi), either bound None for open: a FILTER-
    context numeric range over the ``name`` doc-values sidecar
    (facets.build_value_sidecar) — the ES bool.filter execution shape:
    the per-shard float64 blob joins the packed-norms side (one blob row
    per shard, no extra cogroup input) and candidates outside [lo, hi] —
    or missing the value, which a range never matches — are masked inside
    the kernel BEFORE the local top-k cut. Exact filtered retrieval
    without materializing the match set (operators/retrieve.py
    search_filtered is the sidecar-less fields-table alternative); scores
    keep the unrestricted corpus statistics, as a filter clause never
    contributes to scoring. The block-max pruner is disabled (its seed
    pass could under-seed from filtered-out docs); a filter-aware bound
    pass is the natural extension if profiling demands it.

    ``dv_boost`` = (name, params): EXACT function_score decay — ES
    ``function_score`` with a decay function, executed like ES does it
    (factor per candidate inside the scorer, not a depth-bounded rescore;
    ``search_with_decay`` is the fields-table rescore alternative and
    documents its cascade error, which this path has none of).
    ``params``: origin (required), scale (required, > 0), offset (0),
    decay (0.5), shape ('gauss' | 'exp' | 'linear'), mode ('multiply' |
    'sum'), weight (1.0, sum only). The factor is computed vectorized
    from the field's packed blob; docs missing the value take factor 1.0
    (ES's missing-field behavior). Applies to any scorer; the pruner is
    disabled (its bounds don't see the factor)."""
    if count_only and matches_only:
        raise ValueError("count_only and matches_only are exclusive")
    cfg = cfg or RetrieveConfig()
    if cfg.name not in ("bm25", "qld", "qljm", "classic", "dfr_inl2",
                        "dfi", "pl2", "f2exp", "ib_ll", "bool"):
        raise ValueError(
            f"unknown scorer {cfg.name!r}: expected bm25 | qld | qljm | "
            "classic | dfr_inl2 | dfi | pl2 | f2exp | ib_ll | bool")
    if pit is not None:
        _check_pit_valid(pit, load_index_meta(index_path))
        meta = pit
    else:
        meta = load_index_meta(index_path)
    num_docs = int(meta["num_docs"])
    total_tf = int(meta["total_tf"])
    avgdl = float(meta["avgdl"])
    docs_per_shard = int(meta["docs_per_shard"])
    num_shards = int(meta["num_shards"])
    # [shard_base, num_shards) is the committed live generation: compaction
    # (streaming/incremental.compact_index) rewrites the index into fresh
    # dense shards ABOVE the old range and flips shard_base in the manifest
    # — a reader holding either manifest sees exactly one consistent
    # generation (manifest-snapshot isolation, same as the append gate)
    shard_base = int(meta.get("shard_base", 0))
    # stats baseline: after a TIERED compaction the shard floor stays put
    # (kept base shards) while the collapsed stats segment moves up
    stats_base = int(meta.get("stats_base", shard_base))
    from .indexer import live_shard_pred
    live_pred = live_shard_pred(meta)

    # prefix wildcards ("te*") and fuzzy terms ("term~N") expand against
    # the term dictionary BEFORE stats lookup — one bounded union job for
    # all patterns in the batch
    if any(c.prefix or c.fuzzy is not None
           or getattr(c, "trange", None) is not None
           or getattr(c, "wild", None) is not None
           or getattr(c, "regex", None) is not None
           for p in plans for c in iter_term_clauses(p.clauses)):
        if stats_override is not None:
            raise ValueError(
                "stats_override cannot score multiterm queries "
                "(wildcard/fuzzy/range/regexp): expansion is per-index and "
                "the override's df_map cannot cover the expanded terms — "
                "expand federation-side or use literal terms")
        plans = _expand_multiterm_plans(spark, index_path, plans, num_shards,
                                        shard_base=stats_base)

    # synonym groups touching this batch's bare terms: members join the
    # stats read below so the pseudo-terms' (max df, Σ cf) can be derived
    syn_groups: dict[str, tuple[str, ...]] = {}
    if synonyms:
        plan_terms = {t for p in plans for c in iter_term_clauses(p.clauses)
                      if not c.phrase and len(c.terms) == 1
                      and getattr(c, "first", None) is None
                      for t, _ in c.terms}
        for term, syns in synonyms.items():
            if term in plan_terms:
                syn_groups[term] = tuple(sorted({term, *syns}))

    all_terms = sorted({t for p in plans
                        for c in iter_term_clauses(p.clauses)
                        for t, _ in c.terms}
                       | {w for g in syn_groups.values() for w in g})
    if not all_terms or num_docs == 0:
        if count_only:
            return spark.createDataFrame([], "query_id string, total_hits long")
        if matches_only:
            return spark.createDataFrame(
                [], "query_id string, doc_id string, docid long, score double")
        return spark.createDataFrame(
            [], "query_id string, doc_id string, docid long, rank int, score double")

    # global term stats for idf/cf — only the query's terms are read;
    # aggregated across additive COMMITTED segments (seg < num_shards gates
    # out a crashed append's uncommitted delta, like the shard filters below)
    if stats_override is not None:
        num_docs = int(stats_override["num_docs"])
        total_tf = int(stats_override["total_tf"])
        avgdl = float(stats_override["avgdl"])
        df_map: dict[str, tuple[int, int]] = dict(stats_override["df_map"])
        if num_docs == 0:
            return spark.createDataFrame(
                [], "query_id string, doc_id string, docid long, rank int,"
                    " score double")
    else:
        from .indexer import read_term_stats
        stats_df = (read_term_stats(spark, index_path, num_shards=num_shards,
                                    shard_base=stats_base)
                    .where(F.col("term").isin(all_terms)))
        df_map = {
            r["term"]: (int(r["df"]), int(r["cf"])) for r in stats_df.collect()}

    # exact phrase scoring (positions sidecar): rewrite each phrase clause to
    # a single pseudo-term whose postings are built from positional joins.
    # Applies under BOTH bm25 (idf = Σ member idfs via idf_over, Lucene
    # PhraseQuery semantics) and qld (the pseudo-term's own (df, cf) feed
    # LMDirichlet's p(t|C) directly). Without the sidecar phrases stay
    # bag-of-words, matching the reference's Lucene index which stores no
    # positions (index.py:52).
    idf_over: dict[str, float] = {}
    phrase_posts = None
    has_phrases = any(c.phrase and len(c.terms) > 1
                      for p in plans for c in iter_term_clauses(p.clauses))
    if cfg.name in ("qljm", "classic", "dfr_inl2", "dfi", "pl2", "f2exp",
                    "ib_ll", "bool") and \
            meta.get("positions") and has_phrases:
        # positional phrase scoring is wired for bm25 (idf_over = Σ member
        # idfs) and qld (pseudo-term cf) only; silently degrading qljm /
        # classic phrases to the bag-of-words fallback while positions
        # EXIST would be the silent-wrong-answer class — refuse loudly
        raise ValueError(
            f"positional phrases are not implemented for scorer "
            f"{cfg.name!r} (bm25/qld only)")
    if cfg.name in ("bm25", "qld") and meta.get("positions") and has_phrases:
        if stats_override is not None and cfg.name == "qld":
            # bm25 phrases are federation-safe (idf = Σ member idfs from the
            # GLOBAL df_map via idf_over); qld phrases score p(t|C) from the
            # pseudo-term's PER-INDEX cf, which the override cannot globalize
            raise ValueError(
                "stats_override cannot score qld phrases: the phrase "
                "pseudo-term's collection frequency is per-index")
        plans, phrase_posts = _rewrite_phrase_plans(
            spark, index_path, plans, df_map, idf_over, num_docs=num_docs,
            num_shards=num_shards, docs_per_shard=docs_per_shard,
            block_size=int(meta.get("block_size", 128)),
            shard_base=shard_base, live_pred=live_pred)

    # span-first clauses (Lucene SpanFirstQuery, Clause.first) → pseudo-
    # terms whose tf counts only positions < end. Unlike phrases there is
    # no reference bag-of-words behavior to degrade to, so a positions-less
    # index (or an unwired scorer) refuses loudly instead
    sf_posts = None
    if any(getattr(c, "first", None) is not None
           for p in plans for c in iter_term_clauses(p.clauses)):
        if not meta.get("positions"):
            raise ValueError(
                "span_first clauses need the positions sidecar: rebuild "
                "with IndexConfig(positions=True)")
        if cfg.name not in ("bm25", "qld"):
            raise ValueError(
                f"span_first is not implemented for scorer {cfg.name!r} "
                "(bm25/qld only)")
        if stats_override is not None and cfg.name == "qld":
            raise ValueError(
                "stats_override cannot score qld span_first clauses: the "
                "pseudo-term's collection frequency is per-index")
        plans, sf_posts = _rewrite_spanfirst_plans(
            spark, index_path, plans, df_map, idf_over, num_docs=num_docs,
            num_shards=num_shards, docs_per_shard=docs_per_shard,
            block_size=int(meta.get("block_size", 128)),
            shard_base=shard_base, live_pred=live_pred)

    # unordered proximity (span_near) → pseudo-terms over the positions
    # sidecar
    near_posts = None
    if any(getattr(c, "near", None) is not None
           for p in plans for c in iter_term_clauses(p.clauses)):
        if not meta.get("positions"):
            raise ValueError(
                "span_near clauses need the positions sidecar: rebuild "
                "with IndexConfig(positions=True)")
        if cfg.name not in ("bm25", "qld"):
            raise ValueError(
                f"span_near is not implemented for scorer {cfg.name!r} "
                "(bm25/qld only)")
        if stats_override is not None and cfg.name == "qld":
            raise ValueError(
                "stats_override cannot score qld span_near clauses: the "
                "pseudo-term's collection frequency is per-index")
        plans, near_posts = _rewrite_spannear_plans(
            spark, index_path, plans, df_map, idf_over, num_docs=num_docs,
            num_shards=num_shards, docs_per_shard=docs_per_shard,
            block_size=int(meta.get("block_size", 128)),
            shard_base=shard_base, live_pred=live_pred)

    # ordered minimal intervals (Lucene IntervalQuery) → pseudo-terms over
    # the positions sidecar
    intv_posts = None
    if any(getattr(c, "gaps", None) is not None
           for p in plans for c in iter_term_clauses(p.clauses)):
        if not meta.get("positions"):
            raise ValueError(
                "interval clauses need the positions sidecar: rebuild "
                "with IndexConfig(positions=True)")
        if cfg.name not in ("bm25", "qld"):
            raise ValueError(
                f"interval is not implemented for scorer {cfg.name!r} "
                "(bm25/qld only)")
        if stats_override is not None and cfg.name == "qld":
            raise ValueError(
                "stats_override cannot score qld interval clauses: the "
                "pseudo-term's collection frequency is per-index")
        plans, intv_posts = _rewrite_interval_plans(
            spark, index_path, plans, df_map, idf_over, num_docs=num_docs,
            num_shards=num_shards, docs_per_shard=docs_per_shard,
            block_size=int(meta.get("block_size", 128)),
            shard_base=shard_base, live_pred=live_pred)

    # phrase-prefix clauses (ES match_phrase_prefix) → pseudo-terms over
    # the positions sidecar, prefix expanded against the term dictionary
    pp_posts = None
    if any(getattr(c, "pprefix", None) is not None
           for p in plans for c in iter_term_clauses(p.clauses)):
        if not meta.get("positions"):
            raise ValueError(
                "phrase_prefix clauses need the positions sidecar: rebuild "
                "with IndexConfig(positions=True)")
        if cfg.name not in ("bm25", "qld"):
            raise ValueError(
                f"phrase_prefix is not implemented for scorer {cfg.name!r} "
                "(bm25/qld only)")
        if stats_override is not None:
            raise ValueError(
                "stats_override cannot score phrase_prefix clauses: the "
                "expansion and the pseudo-term's stats are per-index")
        plans, pp_posts = _rewrite_phrase_prefix_plans(
            spark, index_path, plans, df_map, idf_over, num_docs=num_docs,
            num_shards=num_shards, docs_per_shard=docs_per_shard,
            block_size=int(meta.get("block_size", 128)),
            shard_base=shard_base, live_pred=live_pred)

    # synonym groups → SynonymQuery pseudo-terms (after the phrase rewrite
    # so phrase members stay literal; before the postings read so replaced
    # member terms drop out of it)
    syn_posts = None
    if syn_groups:
        plans, syn_posts = _rewrite_synonym_plans(
            spark, index_path, plans, syn_groups, df_map,
            num_shards=num_shards, docs_per_shard=docs_per_shard,
            block_size=int(meta.get("block_size", 128)),
            live_pred=live_pred)

    # postings read is filtered on the POST-rewrite plans' real terms — a
    # word appearing only inside phrases is read from positions/, not here.
    # shard < manifest num_shards gives manifest-snapshot isolation: a
    # concurrent streaming append's half-written NEW shard dirs are never
    # read — they only become visible once its manifest commit lands
    live_terms = sorted({t for p in plans
                         for c in iter_term_clauses(p.clauses)
                         for t, _ in c.terms if not t.startswith("\x01")})
    posts = (read_parquet(spark, f"{index_path}/postings")
             .where(F.col("term").isin(live_terms) & live_pred))
    if phrase_posts is not None:
        posts = posts.unionByName(phrase_posts)
    if sf_posts is not None:
        posts = posts.unionByName(sf_posts)
    if near_posts is not None:
        posts = posts.unionByName(near_posts)
    if intv_posts is not None:
        posts = posts.unionByName(intv_posts)
    if pp_posts is not None:
        posts = posts.unionByName(pp_posts)
    if syn_posts is not None:
        posts = posts.unionByName(syn_posts)
    # packed norms: ONE blob row per shard (the full norms table is only
    # touched at the end, partition-pruned, to resolve top-k external ids)
    norms_packed = (read_parquet(spark, f"{index_path}/norms_packed")
                    .where(live_pred))
    dv_range = None
    if dv_filter is not None:
        dv_name, dv_lo, dv_hi = dv_filter
        if dv_lo is None and dv_hi is None:
            raise ValueError("dv_filter needs at least one bound")
        dv_range = (None if dv_lo is None else float(dv_lo),
                    None if dv_hi is None else float(dv_hi))
        dvp = (read_parquet(spark, 
                   f"{index_path}/doc_values/{dv_name}/packed")
               .where(live_pred)
               .select("shard", F.col("values").alias("dv")))
        # LEFT join: a live shard missing its blob must reach the kernel
        # (which refuses loudly) — an inner join would silently drop the
        # whole shard from the result instead
        norms_packed = norms_packed.join(dvp, "shard", "left")
    boost_params = None
    if dv_boost is not None:
        boost_name, boost_params = dv_boost
        bp = dict(boost_params)
        shape = bp.setdefault("shape", "gauss")
        if shape not in ("gauss", "exp", "linear"):
            raise ValueError(f"unknown decay shape: {shape!r}")
        mode = bp.setdefault("mode", "multiply")
        if mode not in ("multiply", "sum"):
            raise ValueError(f"unknown decay mode: {mode!r}")
        if not 0.0 < float(bp.get("decay", 0.5)) < 1.0:
            raise ValueError("decay must be in (0, 1)")
        if float(bp["scale"]) <= 0:
            raise ValueError("scale must be positive")
        bp.setdefault("offset", 0.0)
        bp.setdefault("decay", 0.5)
        bp.setdefault("weight", 1.0)
        boost_params = bp
        dvb = (read_parquet(spark, 
                   f"{index_path}/doc_values/{boost_name}/packed")
               .where(live_pred)
               .select("shard", F.col("values").alias("dvb")))
        norms_packed = norms_packed.join(dvb, "shard", "left")

    def _clause_payload(c):
        # (occur, boost, terms, children): children non-empty for a nested
        # boolean group — the kernel scores it recursively
        return (c.occur, float(c.boost), list(c.terms),
                [_clause_payload(k) for k in (c.group or [])])

    plans_payload = [
        (p.qid, [_clause_payload(c) for c in p.clauses]) for p in plans
    ]
    # adaptive pruning decision: the block-max pruner pays an O(size)
    # bound pass + a seed pass before it can skip anything; vectorized
    # dense scoring is memory-bandwidth fast, so pruning only wins once the
    # decode volume is large (measured: ~0.6x at 8M postings/shard, grows
    # favorable as lists far exceed cache/bandwidth budgets)
    matched_postings = sum(df for df, _ in df_map.values())
    use_pruner = cfg.pruning == "always" or (
        cfg.pruning == "auto"
        and matched_postings >= cfg.pruning_min_postings)
    after = cfg.after
    if after is not None:
        if not isinstance(after, dict):
            after = {p.qid: tuple(after) for p in plans}
        # the pruner's seed/threshold passes don't know the cursor and
        # could prune docs the page must surface — dense path when paging
        use_pruner = False
    if count_only or matches_only:
        use_pruner = False  # counting/collecting needs the full candidate set
    if cfg.min_should_match > 1:
        use_pruner = False  # pruner bounds assume any-of-terms matching
    if dv_filter is not None:
        use_pruner = False  # seed pass could under-seed from filtered docs
    if dv_boost is not None:
        use_pruner = False  # block-max bounds don't see the decay factor

    # committed tombstones (operators/deletes.py): masked inside the kernel
    # BEFORE the local top-k cut, with scoring statistics left at the
    # manifest values — Lucene's exact semantics for an index with
    # not-yet-merged deletes. None (the common case) costs nothing.
    from .deletes import tombstone_arrays
    deleted = tombstone_arrays(spark, index_path, meta)

    scorer = _make_shard_scorer(
        plans_payload, df_map, scorer=cfg.name,
        k=None if matches_only else cfg.k, k1=cfg.k1, b=cfg.b,
        mu=cfg.mu, lam=cfg.lam, dfr_c=cfg.dfr_c, ax_s=cfg.ax_s,
        ax_k=cfg.ax_k,
        num_docs=num_docs, total_tf=total_tf, avgdl=avgdl,
        docs_per_shard=docs_per_shard, use_pruner=use_pruner,
        idf_over=idf_over, deleted=deleted, after=after,
        count_only=count_only, min_should_match=cfg.min_should_match,
        dv_range=dv_range, dv_boost=boost_params)

    local = (posts.groupBy("shard").cogroup(norms_packed.groupBy("shard"))
             .applyInPandas(scorer, schema=RESULT_SCHEMA))

    if count_only:
        return (local.groupBy("query_id")
                .agg(F.sum("score").cast("long").alias("total_hits"))
                .orderBy("query_id"))

    if matches_only:
        # full match set: resolve external ids with a SHUFFLE join keyed on
        # (shard, docid) — the match side is unbounded, so no broadcast;
        # shard is norms' partition column, keeping the scan pruned to
        # shards that produced matches (AQE handles the rest)
        m = local.withColumn(
            "shard", (F.col("docid") / F.lit(docs_per_shard)).cast("int"))
        norms = (read_parquet(spark, f"{index_path}/norms")
                 .where(live_pred)
                 .select("shard", "docid", F.col("id").alias("doc_id")))
        # MERGE hint: at plan time Catalyst only sees the (possibly tiny)
        # norms file size and would broadcast it — at 100 TB norms IS the
        # corpus, so pin sort-merge statically and let AQE downgrade to a
        # broadcast from observed runtime sizes when genuinely small
        return (norms.hint("merge").join(m, ["shard", "docid"])
                .select("query_id", "doc_id", "docid", "score"))

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("docid"))
    topk = (local.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= cfg.k)
            .select("query_id", "docid", (F.col("rn") - 1).alias("rank"),
                    "score"))

    # resolve external ids for the winners only: join the (broadcast) top-k
    # against norms on (shard, docid) — shard is norms' partition column, so
    # dynamic partition pruning restricts the scan to shards that actually
    # hold winners; no extra driver job, no second scoring pass.
    topk = topk.withColumn(
        "shard", (F.col("docid") / F.lit(docs_per_shard)).cast("int"))
    norms = (read_parquet(spark, f"{index_path}/norms")
             .select("shard", "docid", F.col("id").alias("doc_id")))
    return (norms.join(F.broadcast(topk), ["shard", "docid"])
            .select("query_id", "doc_id", "docid", "rank", "score")
            .orderBy("query_id", "rank"))  # k×|queries| rows — trivial sort


def search_texts(spark: SparkSession, index_path: str,
                 queries: list[tuple[str, str]], cfg: RetrieveConfig | None = None,
                 text_cfg: TextConfig | None = None, lang: str = "eng",
                 mode: str = "plain",
                 synonyms: dict | None = None,
                 dv_filter: tuple | None = None,
                 pit: dict | None = None) -> DataFrame:
    plans = process_queries(queries, text_cfg or TextConfig(), lang=lang, mode=mode)
    return search(spark, index_path, plans, cfg, synonyms=synonyms,
                  dv_filter=dv_filter, pit=pit)


def more_like_this(spark: SparkSession, index_path: str, like_text: str,
                   text_cfg: TextConfig | None = None, lang: str = "eng",
                   min_tf: int = 2, min_df: int = 5, max_terms: int = 25,
                   cfg: RetrieveConfig | None = None,
                   qid: str = "mlt") -> DataFrame:
    """Lucene MoreLikeThis (like-text form): select the informative terms
    of ``like_text`` and run them as an OR query.

    Term selection, exactly (replayed by the SQL oracle): analyze the text
    through the SAME chain as documents; keep terms with like-text
    tf ≥ ``min_tf`` and corpus df ≥ ``min_df`` (Lucene MLT's
    minTermFreq/minDocFreq gates, same defaults); rank by tf·idf with the
    engine's BM25 idf ln(1+(N−df+0.5)/(df+0.5)); keep the top
    ``max_terms`` (ties by term asc). Documented departures from Lucene
    MLT: its classic-similarity idf log(N/(df+1))+1 is replaced by the
    engine's own BM25 idf (one idf definition engine-wide), and the source
    document is NOT excluded from results (it simply ranks first; filter
    by id downstream if unwanted — Lucene leaves it in too).

    Cost shape: one pushed-In term_stats lookup for the like-text's
    candidate terms (bounded by the doc's vocabulary), then a normal
    sharded BM25 search over ≤ max_terms terms."""
    from collections import Counter

    from .indexer import read_term_stats
    from .queryparse import Clause

    cfg = cfg or RetrieveConfig()
    text_cfg = text_cfg or TextConfig()
    toks = list(analyze_tokens_batch(pd.Series([like_text]), text_cfg,
                                     lang=lang)[0])
    tf = Counter(toks)
    cand = sorted(t for t, c in tf.items() if c >= min_tf)
    if not cand:
        raise ValueError(
            f"MoreLikeThis: no term of the like-text reaches "
            f"min_tf={min_tf}; nothing to query")
    meta = load_index_meta(index_path)
    stats = read_term_stats(
        spark, index_path, num_shards=int(meta["num_shards"]),
        shard_base=int(meta.get("stats_base", meta.get("shard_base", 0))))
    rows = stats.where(F.col("term").isin(cand)).select("term", "df").collect()
    n = float(meta["num_docs"])
    ranked = sorted(
        (-float(tf[r["term"]])
         * math.log(1.0 + (n - float(r["df"]) + 0.5) / (float(r["df"]) + 0.5)),
         r["term"])
        for r in rows if float(r["df"]) >= min_df)
    top = [t for _, t in ranked[:max_terms]]
    if not top:
        raise ValueError(
            f"MoreLikeThis: no like-text term reaches min_df={min_df} "
            "in the corpus; nothing to query")
    plan = QueryPlan(qid, [Clause(occur=SHOULD, terms=[(t, 1.0)])
                           for t in top], mode="plain")
    return search(spark, index_path, [plan], cfg)


def search_with_prior(spark: SparkSession, index_path: str,
                      plans: list[QueryPlan], priors: DataFrame,
                      cfg: RetrieveConfig | None = None,
                      weight: float = 1.0, rescore_depth: int | None = None,
                      id_col: str = "doc_id", prior_col: str = "prior"
                      ) -> DataFrame:
    """Two-stage web ranking: text top-R, then blend a query-INDEPENDENT
    document prior (PageRank, harmonic centrality, URL-depth, spam score)
    and re-rank to k — the cascade every web engine runs, since "how good
    is this page" is knowable offline while "how well does it match" is
    not. ``score' = text_score + weight * prior``; callers pass priors
    already on the scale they mean (log-PageRank etc. — this stage does
    arithmetic, not policy). Missing priors count 0.

    Rescoring semantics, stated honestly: stage 1 keeps the top
    ``rescore_depth`` (default 10×k) by TEXT score; a document whose text
    rank is below that depth cannot be promoted by its prior. That is the
    standard cascade trade (depth bounds the error: only docs within
    ``weight × max_prior`` of the depth boundary can be mis-cut) — not an
    exact top-k under the blended score.

    Scale shape: the priors table is corpus-sized (10^12 rows), so it is
    never shuffled OR broadcast whole: a broadcast LEFT-SEMI join of the
    ≤depth×|queries| candidate ids against it reduces it map-side in one
    scan, and the surviving ≤candidate-count rows broadcast back onto the
    candidate frame. Two broadcast joins, zero shuffles of the big side.
    """
    cfg = cfg or RetrieveConfig()
    depth = rescore_depth if rescore_depth is not None else cfg.k * 10
    if depth < cfg.k:
        raise ValueError(f"rescore_depth {depth} < k {cfg.k}")
    from dataclasses import replace
    base = search(spark, index_path, plans, replace(cfg, k=depth))
    pri = priors.select(F.col(id_col).alias("doc_id"),
                        F.col(prior_col).cast("double").alias("__prior"))
    cand_pri = pri.join(
        F.broadcast(base.select("doc_id").distinct()), "doc_id", "leftsemi")
    blended = (base.join(F.broadcast(cand_pri), "doc_id", "left")
               .withColumn("score",
                           F.col("score")
                           + F.lit(float(weight))
                           * F.coalesce(F.col("__prior"), F.lit(0.0))))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (blended.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", "doc_id", "docid",
                    (F.col("__rn") - 1).alias("rank"), "score")
            .orderBy("query_id", "rank"))


def decay_factor(x, *, origin: float, scale: float, offset: float = 0.0,
                 decay: float = 0.5, shape: str = "gauss"):
    """Column expression for the Elasticsearch ``function_score`` decay
    family (public docs, "Decay functions"): the factor is 1 at
    ``origin`` (± ``offset``) and exactly ``decay`` at distance ``scale``,
    falling off by ``shape``:

    - gauss:  exp(-d²/(2σ²)),  σ² = -scale²/(2·ln decay)
    - exp:    exp(d·ln(decay)/scale)
    - linear: max(0, (s - d)/s),  s = scale/(1 - decay)

    with d = max(0, |x - origin| - offset). Pure Catalyst arithmetic — the
    factor fuses into whatever plan consumes it (whole-stage codegen, no
    Python). NULL x propagates NULL so the caller decides missing-field
    policy (ES returns 1.0 for missing fields; search_with_decay follows)."""
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    x = x if isinstance(x, F.Column) else F.col(x)
    d = F.greatest(F.abs(x - F.lit(float(origin))) - F.lit(float(offset)),
                   F.lit(0.0))
    if shape == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return F.exp(-(d * d) / F.lit(2.0 * sigma2))
    if shape == "exp":
        return F.exp(d * F.lit(math.log(decay) / scale))
    if shape == "linear":
        s = scale / (1.0 - decay)
        return F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))
    raise ValueError(f"unknown decay shape: {shape!r}")


def feature_factor(x, *, fn: str = "saturation", pivot: float | None = None,
                   exponent: float | None = None,
                   scaling_factor: float | None = None):
    """Column expression for the Elasticsearch ``rank_feature`` query's
    scoring functions (public docs, "rank_feature query"), over a
    POSITIVE static feature (pagerank, url_length inverse, spam prior):

    - saturation: x / (x + pivot)           (≈0 for x≪pivot, →1 for x≫pivot;
      exactly 0.5 at x = pivot)
    - log:        ln(scaling_factor + x)
    - sigmoid:    x^exp / (x^exp + pivot^exp)
    - linear:     x

    Pure Catalyst arithmetic. Feature values must be positive (ES rejects
    non-positive rank_features at index time; here log of a non-positive
    shifted value yields NULL and the blend's COALESCE treats it as a
    missing feature rather than scoring -inf)."""
    x = x if isinstance(x, F.Column) else F.col(x)
    if fn == "saturation":
        if pivot is None or pivot <= 0:
            raise ValueError("saturation needs a positive pivot")
        return x / (x + F.lit(float(pivot)))
    if fn == "log":
        if scaling_factor is None:
            raise ValueError("log needs scaling_factor")
        return F.log(F.lit(float(scaling_factor)) + x)
    if fn == "sigmoid":
        if pivot is None or pivot <= 0 or exponent is None or exponent <= 0:
            raise ValueError("sigmoid needs positive pivot and exponent")
        xp = F.pow(x, F.lit(float(exponent)))
        return xp / (xp + F.lit(float(pivot) ** float(exponent)))
    if fn == "linear":
        return x
    raise ValueError(f"unknown rank_feature fn: {fn!r}")


def search_with_rank_feature(spark: SparkSession, index_path: str,
                             plans: list[QueryPlan], features: DataFrame,
                             cfg: RetrieveConfig | None = None, *,
                             fn: str = "saturation", boost: float = 1.0,
                             pivot: float | None = None,
                             exponent: float | None = None,
                             scaling_factor: float | None = None,
                             rescore_depth: int | None = None,
                             id_col: str = "doc_id",
                             feature_col: str = "feature") -> DataFrame:
    """Text retrieval blended with an ES ``rank_feature`` SHOULD clause:
    ``score' = text + boost · f(feature)`` with f from
    :func:`feature_factor`; documents missing from ``features`` contribute
    0 from the clause (ES's behavior — a rank_feature should-clause never
    penalizes, it only adds). Same honest depth-bounded cascade and
    two-broadcast-join scale shape as :func:`search_with_prior`, to which
    this delegates after transforming the feature column."""
    transformed = features.select(
        F.col(id_col).alias(id_col),
        feature_factor(F.col(feature_col).cast("double"), fn=fn, pivot=pivot,
                       exponent=exponent, scaling_factor=scaling_factor)
        .alias("prior"))
    return search_with_prior(spark, index_path, plans, transformed, cfg,
                             weight=boost, rescore_depth=rescore_depth,
                             id_col=id_col, prior_col="prior")


def search_with_decay(spark: SparkSession, index_path: str,
                      plans: list[QueryPlan], fields: DataFrame,
                      cfg: RetrieveConfig | None = None, *,
                      origin: float, scale: float, offset: float = 0.0,
                      decay: float = 0.5, shape: str = "gauss",
                      mode: str = "multiply", weight: float = 1.0,
                      rescore_depth: int | None = None,
                      id_col: str = "doc_id", field_col: str = "ts"
                      ) -> DataFrame:
    """Function-score retrieval with a numeric-field decay — freshness
    ranking ("recent pages first", the standard webtext second stage) and
    any other distance-from-origin boost (geo bucket, price band). Follows
    Elasticsearch ``function_score`` decay semantics: per-candidate factor
    from :func:`decay_factor`, composed with the text score by ``mode``:

    - ``multiply`` (ES boost_mode default): ``score' = text · factor``
    - ``sum``: ``score' = text + weight · factor``

    Documents missing from ``fields`` (or with NULL field) take factor 1.0
    — ES's documented missing-field behavior — so a multiply blend never
    invents a penalty for unknown timestamps.

    Rescoring semantics, stated honestly (same cascade as
    :func:`search_with_prior`): stage 1 keeps the top ``rescore_depth``
    (default 10×k) by TEXT score, then the decay re-ranks within that
    window; under ``multiply`` the factor ≤ 1 only shrinks scores, so a
    text rank below the depth can never be promoted into the final k by
    freshness alone — depth bounds the cascade error.

    Scale shape: ``fields`` is corpus-sized (one row per document at
    10^12), so it is never shuffled or broadcast whole — a broadcast
    left-semi join of the ≤depth×|queries| candidate ids reduces it
    map-side in one scan, and the survivors broadcast back onto the
    candidates. Two broadcast joins, zero shuffles of the big side; the
    decay arithmetic itself is pure Catalyst (no Python boundary)."""
    if mode not in ("multiply", "sum"):
        raise ValueError(f"unknown decay mode: {mode!r}")
    cfg = cfg or RetrieveConfig()
    depth = rescore_depth if rescore_depth is not None else cfg.k * 10
    if depth < cfg.k:
        raise ValueError(f"rescore_depth {depth} < k {cfg.k}")
    from dataclasses import replace
    base = search(spark, index_path, plans, replace(cfg, k=depth))
    fld = fields.select(F.col(id_col).alias("doc_id"),
                        F.col(field_col).cast("double").alias("__x"))
    cand = fld.join(
        F.broadcast(base.select("doc_id").distinct()), "doc_id", "leftsemi")
    factor = F.coalesce(
        decay_factor(F.col("__x"), origin=origin, scale=scale,
                     offset=offset, decay=decay, shape=shape),
        F.lit(1.0))
    joined = base.join(F.broadcast(cand), "doc_id", "left")
    if mode == "multiply":
        blended = joined.withColumn("score", F.col("score") * factor)
    else:
        blended = joined.withColumn(
            "score", F.col("score") + F.lit(float(weight)) * factor)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (blended.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", "doc_id", "docid",
                    (F.col("__rn") - 1).alias("rank"), "score")
            .orderBy("query_id", "rank"))


def search_filtered(spark: SparkSession, index_path: str,
                    plans: list[QueryPlan], fields: DataFrame,
                    predicate, cfg: RetrieveConfig | None = None, *,
                    id_col: str = "doc_id") -> DataFrame:
    """Filter-context retrieval — the ES bool query's ``filter`` clause
    (public docs "Query and filter context"): a structured predicate over
    a document-fields table restricts WHICH documents can rank, while
    scores stay exactly the unrestricted corpus-statistics BM25/QLD (a
    filter never contributes to the score, and idf/avgdl are corpus-wide
    — ES semantics; restricting the stats would be a different query).

    ``predicate``: a Column or SQL string evaluated against ``fields``
    (e.g. ``"source IN ('a','b') AND n_chars >= 200"``). Documents absent
    from ``fields`` are excluded (a filter on a missing field matches
    nothing — ES's behavior for required filters).

    Exactness: the text query runs in ``matches_only`` mode (the FULL
    match set, no depth cut), so the filter-then-top-k order is exact — a
    doc ranked below k pre-filter can still surface once better-scoring
    docs are filtered away. This is the semantic difference from a
    post-filtered ``search()``: rescoring a truncated top-k would
    silently under-fill results for selective filters.

    Scale shape (100 TB): the predicate is pure Catalyst on the fields
    scan — pushed to parquet (PushedFilters) with column pruning, the
    same class of work as ES's doc-values/bitset filter evaluation per
    segment. The surviving-id side joins the match set on doc_id — one
    hash join keyed on the id; when the filter is selective Spark's AQE
    converts it to a broadcast join at runtime. Neither side is ever
    collected; the k cut happens after the join in one window."""
    cfg = cfg or RetrieveConfig()
    matches = search(spark, index_path, plans, cfg, matches_only=True)
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    keep = fields.where(pred).select(F.col(id_col).alias("doc_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (matches.join(keep, "doc_id", "leftsemi")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", "doc_id", "docid",
                    (F.col("__rn") - 1).cast("int").alias("rank"), "score")
            .orderBy("query_id", "rank"))


def rescore(spark: SparkSession, index_path: str,
            plans: list[QueryPlan], rescore_plans: list[QueryPlan],
            cfg: RetrieveConfig | None = None, *,
            window: int | None = None, query_weight: float = 1.0,
            rescore_weight: float = 1.0) -> DataFrame:
    """ES query rescorer (public docs, "Rescore filtered search
    results"): a cheap primary query ranks the corpus, then an expensive
    secondary query refines ONLY the top ``window`` candidates per query
    (default 10·k):

        score' = query_weight · primary + rescore_weight · secondary

    — ES ``score_mode=total`` (the default); window docs the secondary
    doesn't match keep their weighted primary alone. This is the
    two-stage shape every production ranker uses (BM25 window → heavier
    model), here with another index query (typically phrases / proximity
    — pass any plans the engine scores) as the second stage.

    Honest cascade semantics, same as search_with_prior: the window cut
    is by PRIMARY score, so a doc the secondary loves but the primary
    ranks below ``window`` never surfaces — window bounds the cascade
    error, and ES behaves identically.

    Scale shape: stage 1 is the normal pruned top-window retrieval;
    stage 2 runs matches_only on the secondary plans and joins
    (query, docid)-keyed against the window candidates — ≤ window·|q|
    rows on the left, AQE broadcasts it; one final k-bounded window."""
    cfg = cfg or RetrieveConfig()
    win = window if window is not None else cfg.k * 10
    if win < cfg.k:
        raise ValueError(f"window {win} < k {cfg.k}")
    from dataclasses import replace
    base = search(spark, index_path, plans, replace(cfg, k=win))
    sec = (search(spark, index_path, rescore_plans, cfg, matches_only=True)
           .select("query_id", "docid", F.col("score").alias("__s2")))
    blended = (base.join(sec, ["query_id", "docid"], "left")
               .select("query_id", "doc_id", "docid",
                       (F.lit(float(query_weight)) * F.col("score")
                        + F.lit(float(rescore_weight))
                        * F.coalesce(F.col("__s2"), F.lit(0.0)))
                       .alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (blended.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", "doc_id", "docid",
                    (F.col("__rn") - 1).cast("int").alias("rank"), "score")
            .orderBy("query_id", "rank"))


def search_pinned(spark: SparkSession, index_path: str,
                  plans: list[QueryPlan], pinned: dict[str, list[str]],
                  cfg: RetrieveConfig | None = None) -> DataFrame:
    """ES ``pinned`` query (public docs, "Pinned query"): editorially
    promoted documents rank FIRST, in the exact order given, ahead of
    every organic result; organic ranking below them is unchanged and
    pinned ids are deduplicated out of it. ``pinned`` maps query_id →
    ordered external ids (unknown ids are simply absent — ES behavior:
    a pin names a doc, it does not create one).

    Scores follow ES's scheme: pinned hits get large descending
    synthetic scores (1e9 − slot — ES pins above MAX_ORGANIC_SCORE;
    1e9's double ulp is ≪ 1 so the ladder actually descends, unlike a
    DBL_MAX base where subtracting the slot would be absorbed) so the
    output stays sortable by (score desc) alone; organic hits keep
    their real scores. Scale shape: the organic run is the
    ordinary pruned top-k; the pinned lookup is a broadcast semi-join of
    a handful of ids against the partition-pruned norms table; one final
    k cut."""
    cfg = cfg or RetrieveConfig()
    organic = search(spark, index_path, plans, cfg)
    rows = [(qid, did, slot)
            for qid, ids in sorted(pinned.items())
            for slot, did in enumerate(ids)]
    if not rows:
        return organic
    pins = spark.createDataFrame(
        rows, "query_id string, doc_id string, __slot int")
    # resolve pinned external ids against the live index (docid needed for
    # the output contract and the stable tie-break)
    meta = load_index_meta(index_path)
    from .indexer import live_shard_pred
    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live_shard_pred(meta))
             .select(F.col("id").alias("doc_id"), "docid"))
    resolved = (norms.join(F.broadcast(pins), "doc_id")
                .select("query_id", "doc_id", "docid",
                        (F.lit(1.0e9) - F.col("__slot")).alias("score")))
    rest = organic.join(F.broadcast(pins.select("query_id", "doc_id")
                                    .withColumn("__p", F.lit(True))),
                        ["query_id", "doc_id"], "left") \
        .where(F.col("__p").isNull()) \
        .select("query_id", "doc_id", "docid", "score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (resolved.unionByName(rest)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", "doc_id", "docid",
                    (F.col("__rn") - 1).cast("int").alias("rank"), "score")
            .orderBy("query_id", "rank"))


def search_boosting(spark: SparkSession, index_path: str,
                    positive_plans: list[QueryPlan],
                    negative_plans: list[QueryPlan],
                    cfg: RetrieveConfig | None = None, *,
                    negative_boost: float = 0.5) -> DataFrame:
    """ES/Lucene ``boosting`` query: rank by the positive query, DEMOTE
    (never exclude) documents that also match the negative query by
    multiplying their score by ``negative_boost`` ∈ [0, 1) — the
    "relevant, but I'd rather see something else" middle ground between a
    should-clause and MUST_NOT. Negative plans are matched per query_id
    against positive plans (same qids query-by-query).

    Exact by construction: the positive run is ``matches_only`` (full
    match set), so demotion-induced reordering below any fixed depth is
    captured; the negative run only contributes membership (its scores
    are discarded — ES semantics). Scale shape: two postings reads, one
    id-keyed left-semi-style hash join (AQE broadcasts the negative side
    when selective), one k-bounded window."""
    if not 0.0 <= negative_boost < 1.0:
        raise ValueError(
            f"negative_boost must be in [0, 1), got {negative_boost}")
    cfg = cfg or RetrieveConfig()
    pos = search(spark, index_path, positive_plans, cfg, matches_only=True)
    neg = (search(spark, index_path, negative_plans, cfg, matches_only=True)
           .select("query_id", "docid").withColumn("__neg", F.lit(True)))
    blended = (pos.join(neg, ["query_id", "docid"], "left")
               .withColumn("score",
                           F.when(F.col("__neg"),
                                  F.col("score")
                                  * F.lit(float(negative_boost)))
                           .otherwise(F.col("score"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("docid"))
    return (blended.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", "doc_id", "docid",
                    (F.col("__rn") - 1).cast("int").alias("rank"), "score")
            .orderBy("query_id", "rank"))


def search_constant_score(spark: SparkSession, index_path: str,
                          plans: list[QueryPlan],
                          cfg: RetrieveConfig | None = None, *,
                          boost: float = 1.0) -> DataFrame:
    """ES/Lucene ``constant_score``: every matching document scores
    exactly ``boost`` — filter semantics with a fixed score, the idiom
    for "match matters, relevance doesn't" clauses. Ties (i.e. all rows)
    are broken by docid asc, pinned, so the k cut is deterministic
    (Lucene leaves constant-score tie order to doc order — same thing).
    One matches_only pass, scoring arithmetic skipped downstream."""
    cfg = cfg or RetrieveConfig()
    matches = search(spark, index_path, plans, cfg, matches_only=True)
    w = Window.partitionBy("query_id").orderBy(F.asc("docid"))
    return (matches.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", "doc_id", "docid",
                    (F.col("__rn") - 1).cast("int").alias("rank"),
                    F.lit(float(boost)).alias("score"))
            .orderBy("query_id", "rank"))


def search_query_frame(spark: SparkSession, index_path: str,
                       queries_df: DataFrame, out_path: str,
                       cfg: RetrieveConfig | None = None,
                       text_cfg: TextConfig | None = None, lang: str = "eng",
                       mode: str = "plain", chunk_size: int = 16384,
                       resume: bool = True, parallel: int = 2) -> DataFrame:
    """Batch retrieval for a DataFrame of queries (query_id, text) — the
    scale path for topic sets too large to hold as driver-resident plans.

    The reference collects all topics into memory before retrieval
    (generators over the full topic store, /root/reference/patapsco/job.py)
    — fine at its scale, a driver bottleneck at 10^6 topics. Here the query
    set is SNAPSHOTTED to parquet once (so chunk membership is computed from
    one materialization — a nondeterministic source can't shift rows between
    the per-chunk jobs, and each chunk read is a cheap columnar scan of the
    snapshot, not a re-execution of the source plan), then split into hash
    chunks; at most ``parallel`` chunks' texts/plans/term-stats live on the
    driver at a time (bounded by ``parallel × chunk_size``), overlapping
    that many chunk jobs so wall-time tracks cluster capacity instead of
    chunk count, and each chunk's results land in their own ``chunk=K``
    parquet directory.

    Resume discipline (the batch indexer's): a run manifest fingerprints the
    retrieval/text config, mode, lang, chunking, index path AND the query
    CONTENT — (row count, xor of xxhash64(query_id, text)), one cheap
    aggregation over the input. With ``resume=True``, a matching manifest reuses the
    snapshot and skips completed chunks (crash-resume); a MISMATCHED
    manifest (changed k, scorer, chunk size, …, or a changed topic set —
    round-3 advice: config-only identity silently served stale chunks for
    changed content) wipes ``out_path`` and recomputes everything. Caveat: a
    nondeterministic query SOURCE fingerprints differently every run and thus
    never resumes — correct, at the price of re-running; snapshot the
    source to parquet first if that matters. Results are identical to
    :func:`search_texts` on the same queries.
    """
    import os

    from ..plans import manifest as mf
    from .indexer import _delete_path

    cfg = cfg or RetrieveConfig()
    text_cfg = text_cfg or TextConfig()
    run_doc = {"retrieve": vars(cfg), "text": vars(text_cfg), "lang": lang,
               "mode": mode, "chunk_size": chunk_size, "index": index_path}
    # decimal SUM of row hashes, not bit_xor: both are order-independent,
    # but xor cancels pairwise — replacing a DUPLICATED row pair with a
    # different duplicated pair leaves n and the xor unchanged (x^x = 0)
    # and a stale resume would silently serve the old chunks. A sum only
    # cancels on engineered collisions; decimal(38,0) cannot overflow
    # under ANSI (10^5 rows × 2^63 ≪ 10^38).
    fp = (queries_df.select(
        F.xxhash64(F.col("query_id").cast("string"),
                   F.col("text")).cast("decimal(38,0)").alias("_h"))
        .agg(F.count("*").alias("n"),
             F.sum("_h").alias("h")).first())
    content_fp = {"n": int(fp["n"] or 0), "h": str(fp["h"] or 0)}

    staged = f"{out_path}/_topics"
    man = mf.read_manifest(out_path) if resume else None
    fresh = (man is None or man.get("stage") != "query_chunks"
             or man.get("config", {}).get("run") != run_doc
             or man.get("config", {}).get("content") != content_fp)
    if fresh:
        _delete_path(spark, out_path)
        (queries_df.select(
            F.col("query_id").cast("string").alias("query_id"), "text")
         .write.mode("overwrite").parquet(staged))

    snapshot = read_parquet(spark, staged)
    n = snapshot.count()
    if n == 0:
        return spark.createDataFrame(
            [], "query_id string, doc_id string, docid long, rank int, score double")
    n_chunks = max(1, -(-n // chunk_size))
    if fresh:
        mf.write_manifest(out_path, "query_chunks",
                          {"run": run_doc, "content": content_fp,
                           "n": n, "n_chunks": n_chunks})
    chunked = snapshot.select(
        "query_id", "text",
        F.pmod(F.xxhash64("query_id"), n_chunks).cast("int").alias("chunk"))

    def run_chunk(c: int) -> None:
        chunk_dir = f"{out_path}/chunk={c}"
        # fsio: scheme-qualified out_paths (hdfs://, s3a://) resume too
        if not fresh and fsio.exists(f"{chunk_dir}/_SUCCESS"):
            return
        batch = [(r["query_id"], r["text"])
                 for r in chunked.where(F.col("chunk") == c)
                                 .select("query_id", "text").collect()]
        if not batch:
            # write an empty marker dir so resume skips it next time
            (spark.createDataFrame([], "query_id string, doc_id string, "
                                       "docid long, rank int, score double")
             .write.mode("overwrite").parquet(chunk_dir))
            return
        res = search_texts(spark, index_path, batch, cfg,
                           text_cfg=text_cfg, lang=lang, mode=mode)
        res.write.mode("overwrite").parquet(chunk_dir)

    # overlap a bounded number of chunk jobs (round-3 verdict #5): the
    # strictly-sequential loop made wall-time scale with chunk count, not
    # cluster size — each chunk's driver collect + small fan-out left most
    # executors idle. Spark schedules concurrent jobs from driver threads
    # (FIFO pool sharing); driver memory stays bounded at parallel ×
    # chunk_size texts, and per-chunk `_SUCCESS` resume is unchanged (each
    # chunk dir is still written atomically by exactly one thread).
    parallel = max(1, int(parallel))
    if parallel == 1 or n_chunks == 1:
        for c in range(n_chunks):
            run_chunk(c)
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(parallel, n_chunks)) as pool:
            # list() drains the iterator so the first failure propagates
            list(pool.map(run_chunk, range(n_chunks)))
    return (read_parquet(spark, f"{out_path}/chunk=*")
            .drop("chunk"))


MAX_PREFIX_EXPANSIONS = 1024  # Lucene BooleanQuery.maxClauseCount


def _range_key(rng: tuple) -> str:
    """Stable branch key for a term range; \\x00 separators keep term
    content from colliding with the key syntax."""
    lo, hi, lo_inc, hi_inc = rng
    return (f"r:{'[' if lo_inc else '{'}{lo or '*'}\x00"
            f"{hi or '*'}{']' if hi_inc else '}'}")


def _expand_multiterm_plans(spark: SparkSession, index_path: str,
                            plans: list[QueryPlan], num_shards: int,
                            max_expansions: int = MAX_PREFIX_EXPANSIONS,
                            shard_base: int = 0) -> list[QueryPlan]:
    """Rewrite multi-term clauses — prefix wildcards ("te*"), general
    wildcards ("te?t" / "t*st", round 5: literal-prefix pushdown + anchored
    JVM regex), fuzzy terms ("term~N") and term ranges ("[a TO b]",
    round 5) — to SHOULD-groups
    over the matching dictionary terms: Lucene's SCORING_BOOLEAN_REWRITE,
    the group matches any doc containing ≥1 expanded term and scores
    boost × Σ per-term BM25/QLD contributions. (For ranges that is a
    documented departure from Lucene TermRangeQuery's default
    constant-score rewrite — consistent with the wildcard/fuzzy choice
    here, and it keeps the oracle an exact BM25 sum.) Range bounds push
    GreaterThan/LessThan straight to the term-sorted stats scan.

    Plan shape: ONE job for ALL expansions — a union of per-pattern
    branches over the term_stats read, each branch bounded by
    ``limit(max_expansions + 1)`` BEFORE the collect (round-4 verdict
    defect #2: the old path collected every match of a degenerate prefix
    like 'a*' to the driver just to raise; now the failure path is O(cap)
    per pattern). Prefix branches push StringStartsWith to the parquet scan
    (row-group pruning over term-sorted stats files); fuzzy branches push a
    length-range filter and compute plain Levenshtein JVM-side
    (F.levenshtein). Over-cap patterns raise ParseError like Lucene's
    BooleanQuery.maxClauseCount → TooManyClauses.

    Fuzzy departures from Lucene FuzzyQuery, chosen for oracle-exactness
    and documented here: (a) plain Levenshtein, not the default
    transpositions=true Damerau variant (Lucene also offers
    transpositions=false — that is the semantics implemented); (b) boolean
    rewrite over ALL matches within distance N, not
    TopTermsBlendedFreqScoringRewrite's size-capped blended-idf scoring.

    A pattern matching NOTHING keeps a reserved \\x01 pseudo-term so MUST
    still excludes everything and SHOULD contributes nothing, exactly like
    an empty Lucene PrefixQuery rewrite."""
    from functools import reduce

    from .indexer import read_term_stats
    from .queryparse import Clause, ParseError

    prefixes = sorted({c.terms[0][0] for p in plans
                       for c in iter_term_clauses(p.clauses) if c.prefix})
    fuzzies = sorted({(c.terms[0][0], c.fuzzy) for p in plans
                      for c in iter_term_clauses(p.clauses)
                      if c.fuzzy is not None})
    wilds = sorted({c.wild for p in plans
                    for c in iter_term_clauses(p.clauses)
                    if getattr(c, "wild", None) is not None})
    regexes = sorted({c.regex for p in plans
                      for c in iter_term_clauses(p.clauses)
                      if getattr(c, "regex", None) is not None})
    ranges = sorted({c.trange for p in plans
                     for c in iter_term_clauses(p.clauses)
                     if getattr(c, "trange", None) is not None},
                    key=repr)
    stats = read_term_stats(spark, index_path, num_shards=num_shards,
                            shard_base=shard_base)
    branches = []
    for p in prefixes:
        branches.append(
            stats.where(F.col("term").startswith(p))
                 .select(F.lit("p:" + p).alias("key"), "term")
                 .limit(max_expansions + 1))
    for pat in wilds:
        # general wildcard ('te?t', 't*st'): the literal prefix before the
        # first wildcard char pushes StringStartsWith to the term-sorted
        # scan (the parser guarantees it is non-empty — leading wildcards
        # are rejected); the full pattern filters JVM-side as an anchored
        # regex, so no pattern bytes ever cross to Python
        lit = re.split(r"[*?]", pat, maxsplit=1)[0]
        rx = "^" + "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in pat) + "$"
        branches.append(
            stats.where(F.col("term").startswith(lit)
                        & F.col("term").rlike(rx))
                 .select(F.lit("w:" + pat).alias("key"), "term")
                 .limit(max_expansions + 1))
    _RX_META = set(".?*+()[]{}|\\^$")
    for pat in regexes:
        # Lucene RegexpQuery: anchored — the WHOLE term must match. A
        # literal opening (chars before the first regex metachar) pushes
        # StringStartsWith; a pattern with no literal opening scans the
        # whole dictionary once per batch (Lucene's automaton walk over its
        # terms index is the same cost class), never the postings
        lit = ""
        for ch in pat:
            if ch in _RX_META:
                break
            lit += ch
        cond = F.col("term").rlike("^(?:" + pat + ")$")
        if lit:
            cond = F.col("term").startswith(lit) & cond
        branches.append(
            stats.where(cond)
                 .select(F.lit("x:" + pat).alias("key"), "term")
                 .limit(max_expansions + 1))
    for base, n in fuzzies:
        cond = (F.length("term").between(len(base) - n, len(base) + n)
                & (F.levenshtein(F.col("term"), F.lit(base)) <= n))
        branches.append(
            stats.where(cond)
                 .select(F.lit(f"f:{n}:{base}").alias("key"), "term")
                 .limit(max_expansions + 1))
    for rng in ranges:
        lo, hi, lo_inc, hi_inc = rng
        cond = F.lit(True)
        if lo is not None:
            cond = cond & ((F.col("term") >= lo) if lo_inc
                           else (F.col("term") > lo))
        if hi is not None:
            cond = cond & ((F.col("term") <= hi) if hi_inc
                           else (F.col("term") < hi))
        branches.append(
            stats.where(cond)
                 .select(F.lit(_range_key(rng)).alias("key"), "term")
                 .limit(max_expansions + 1))
    match: dict[str, list[str]] = {}
    for r in reduce(DataFrame.unionByName, branches).collect():
        match.setdefault(r["key"], []).append(r["term"])
    for key, ts in match.items():
        if len(ts) > max_expansions:
            if key.startswith("p:"):
                what = f"prefix wildcard '{key[2:]}*'"
            elif key.startswith("w:"):
                what = f"wildcard '{key[2:]}'"
            elif key.startswith("x:"):
                what = f"regexp '/{key[2:]}/'"
            elif key.startswith("f:"):
                what = (f"fuzzy term '{key.split(':', 2)[2]}~"
                        f"{key.split(':', 2)[1]}'")
            else:
                what = f"range query '{key[2:]}'"
            raise ParseError(
                f"{what} expands to more than {max_expansions} terms; "
                "use a more selective pattern")
        ts.sort()

    def rw(cs: list) -> list:
        out = []
        for c in cs:
            if c.group:
                out.append(Clause(c.occur, c.boost, [], group=rw(c.group)))
            elif (c.prefix or c.fuzzy is not None
                  or getattr(c, "trange", None) is not None
                  or getattr(c, "wild", None) is not None
                  or getattr(c, "regex", None) is not None):
                if c.trange is not None:
                    base, key, tag = str(c.trange), _range_key(c.trange), "range"
                elif getattr(c, "wild", None) is not None:
                    base, key, tag = c.wild, "w:" + c.wild, "wild"
                elif getattr(c, "regex", None) is not None:
                    base, key, tag = c.regex, "x:" + c.regex, "regex"
                else:
                    base = c.terms[0][0]
                    key = ("p:" + base) if c.prefix else f"f:{c.fuzzy}:{base}"
                    tag = "wild" if c.prefix else "fuzzy"
                ts = match.get(key, [])
                if ts:
                    out.append(Clause(c.occur, c.boost, [], group=[
                        Clause(SHOULD, 1.0, [(t, 1.0)]) for t in ts]))
                else:
                    out.append(Clause(c.occur, c.boost,
                                      [(f"\x01{tag}:" + base, 1.0)]))
            else:
                out.append(c)
        return out

    return [QueryPlan(p.qid, rw(p.clauses), p.mode) for p in plans]


# round ≤4 name (tests/importers)
_expand_prefix_plans = _expand_multiterm_plans


def _phrase_pseudo_term(words: list[str], slop: int = 0) -> str:
    # \x01 prefix keeps pseudo-terms out of the real term namespace
    # (no analyzed token can contain a control char); sloppy phrases get
    # their own namespace so "a b" and "a b"~3 coexist in one batch
    if slop:
        return f"\x01near{slop}:" + " ".join(words)
    return "\x01phrase:" + " ".join(words)


def _synonym_pseudo_term(group: tuple[str, ...]) -> str:
    # \x01 namespace like phrases; the group is stored sorted so the same
    # synonym set from different query spellings shares one pseudo-term
    return "\x01syn:" + "|".join(group)


def _rewrite_synonym_plans(spark, index_path, plans, syn_groups, df_map, *,
                           num_shards, docs_per_shard, block_size,
                           live_pred):
    """Rewrite synonym-bearing term clauses to pseudo-terms with Lucene
    SynonymQuery semantics (SynonymQuery.createWeight): per-document tf =
    Σ member tfs, docFreq = MAX member df, totalTermFreq = Σ member cf —
    the members score as ONE term, not an OR of independently-idf'd terms
    (an OR overweights a concept that happens to have many surface forms).

    ``syn_groups`` maps a query term → its full sorted member tuple. All
    groups build in ONE pass: the members' postings decode through the
    bm25f tf-frame kernel (pushed In filter, tombstones masked), one
    groupBy (group, shard, docid) sums member tfs, and the pseudo postings
    encode through the SAME blocked varbyte kernel as regular postings —
    the scorer needs no synonym-specific path. Stats come from df_map (the
    members were folded into the stats read), so the rewrite also works
    under a federation stats_override — max/sum of GLOBAL member stats.

    Scale shape: decode volume = the members' postings (the same rows an
    OR query would score), one extra shuffle to regroup by (group, doc).
    Synonyms inside phrases are not rewritten (Lucene expresses those as
    graph/span queries; out of scope — members only replace bare terms)."""
    from .indexer import POSTINGS_SCHEMA as _PSCHEMA, _make_postings_kernel
    from .queryparse import Clause, QueryPlan

    groups = sorted({g for g in syn_groups.values()})
    gid_of = {g: i for i, g in enumerate(groups)}
    # pseudo stats from df_map: max df / Σ cf over members present
    live: dict[tuple[str, ...], str] = {}
    for g in groups:
        stats = [df_map[w] for w in g if w in df_map and df_map[w][0] > 0]
        if not stats:
            continue  # no member indexed: pseudo stays out of df_map
        pseudo = _synonym_pseudo_term(g)
        df_map[pseudo] = (max(s[0] for s in stats),
                          sum(s[1] for s in stats))
        live[g] = pseudo

    def rw(clauses):
        out = []
        for c in clauses:
            if c.group:
                out.append(Clause(c.occur, c.boost, list(c.terms),
                                  group=rw(c.group)))
            elif (not c.phrase and len(c.terms) == 1
                  and c.terms[0][0] in syn_groups):
                g = syn_groups[c.terms[0][0]]
                pseudo = live.get(g)
                terms = ([(pseudo, c.terms[0][1])] if pseudo
                         else list(c.terms))  # dead group: keep the literal
                out.append(Clause(c.occur, c.boost, terms, phrase=c.phrase))
            else:
                out.append(c)
        return out

    plans = [QueryPlan(p.qid, rw(p.clauses), p.mode) for p in plans]
    if not live:
        return plans, None

    from .bm25f import term_postings_frame
    members = sorted({w for g in live for w in g})
    decoded = term_postings_frame(spark, index_path, members)
    memb = spark.createDataFrame(
        [(gid_of[g], w) for g in live for w in g],
        "gid int, term string")
    name_df = spark.createDataFrame(
        [(gid_of[g], live[g]) for g in live], "gid int, term string")
    base_kernel = _make_postings_kernel(block_size, docs_per_shard)

    def encode(batches):
        for b in batches:
            if not b.empty:
                yield from base_kernel(iter([b]))

    union = (decoded.join(F.broadcast(memb), "term")
             .withColumn("shard",
                         (F.col("docid") / F.lit(docs_per_shard)).cast("int"))
             .groupBy("gid", "shard", "docid")
             .agg(F.sum("tf").cast("int").alias("tf"),
                  F.max("dlq").cast("int").alias("dlq"))
             .join(F.broadcast(name_df), "gid")
             .select("shard", "term", "docid", "tf", "dlq")
             .repartition(num_shards, "shard")
             .sortWithinPartitions("shard", "term", "docid")
             .mapInPandas(encode, schema=_PSCHEMA))
    return plans, union


def _spanfirst_pseudo_term(term: str, end: int) -> str:
    # \x01 namespace like phrases/synonyms — never collides with analyzed
    # terms, and the postings read skips it (read from the rewrite union)
    return f"\x01first:{end}:{term}"


MAX_PHRASE_PREFIX_EXPANSIONS = 50  # ES match_phrase_prefix max_expansions


def _phrase_prefix_pseudo_term(words: tuple[str, ...], prefix: str) -> str:
    return "\x01pp:" + "\x01".join(words) + "\x01*" + prefix


def _spannear_pseudo_term(a: str, b: str, slop: int,
                          inv: bool = False) -> str:
    tag = "nearnot" if inv else "near"
    return f"\x01{tag}:{slop}:{a}\x01{b}"


def _rewrite_spannear_plans(spark, index_path, plans, df_map, idf_over, *,
                            num_docs, num_shards, docs_per_shard,
                            block_size, shard_base=0, live_pred=None):
    """Rewrite unordered-proximity clauses (Lucene SpanNearQuery with
    inOrder=false — semantics and the anchored-counting departure
    documented at queryparse.Clause.near) to pseudo-terms over the
    positions sidecar: ONE positions read for all pairs joined to a
    broadcast spec table, one groupBy (sid, shard, docid) whose fold
    counts first-word occurrences with ANY second-word occurrence within
    the window in either direction, stats in one collect, pseudo postings
    through the same blocked varbyte kernel as everything else."""
    from .indexer import POSTINGS_SCHEMA as _PSCHEMA, _make_postings_kernel
    from .queryparse import Clause, QueryPlan
    from ..functions.smallfloat import quantize_length

    specs: dict[tuple[str, str, int, bool], str] = {}
    for p in plans:
        for c in iter_term_clauses(p.clauses):
            near = getattr(c, "near", None)
            if near is None:
                continue
            if len(c.terms) != 2 or c.phrase or c.prefix:
                raise ValueError(
                    f"span_near clause must carry exactly two plain "
                    f"terms (got {c!r})")
            a, b = c.terms[0][0], c.terms[1][0]
            if a == b:
                raise ValueError(
                    f"span_near needs two distinct terms, got {a!r} twice")
            inv = bool(getattr(c, "near_not", False))
            specs.setdefault((a, b, int(near), inv),
                             _spannear_pseudo_term(a, b, int(near), inv))
    if not specs:
        return plans, None

    if live_pred is None:
        live_pred = ((F.col("shard") >= shard_base) &
                     (F.col("shard") < num_shards))
    sid_of = {key: i for i, key in enumerate(specs)}
    pseudo_of_sid = {i: specs[k] for k, i in sid_of.items()}
    memb_rows = []
    for (a, b, slop, inv), sid in sid_of.items():
        memb_rows.append((sid, a, 0, slop, int(inv)))
        memb_rows.append((sid, b, 1, slop, int(inv)))
    all_words = sorted({w for _s, w, _r, _sl, _i in memb_rows})

    pos = (read_parquet(spark, f"{index_path}/positions")
           .where(F.col("term").isin(all_words) & live_pred))
    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live_pred)
             .select("shard", "docid", "dl"))
    memb = spark.createDataFrame(
        memb_rows, "sid int, word string, role int, slop int, inv int")

    joined = (pos.join(F.broadcast(memb), pos["term"] == memb["word"])
              .select("sid", "shard", "docid", "role", "slop", "inv",
                      "positions"))
    grouped = (joined.groupBy("sid", "shard", "docid")
               .agg(F.count("*").alias("nm"), F.max("slop").alias("slop"),
                    F.max("inv").alias("inv"),
                    F.collect_list(F.struct("role", "positions"))
                    .alias("items"))
               # near needs BOTH words in the doc; near_not keeps docs
               # holding only the include word (nothing nearby to exclude
               # — every occurrence counts). Only-exclude docs survive
               # this filter but die at tf NULL below (pa is NULL).
               .where((F.col("nm") == 2) | (F.col("inv") == 1)))
    items = F.col("items")
    pa = F.try_element_at(
        F.transform(F.filter(items, lambda s: s["role"] == 0),
                    lambda s: s["positions"]), F.lit(1))
    # near_not over a doc with NO exclude occurrences: exists() over a
    # NULL array is NULL and would poison the negation — coalesce to
    # empty so "nothing nearby" reads false, not unknown
    pb = F.coalesce(
        F.try_element_at(
            F.transform(F.filter(items, lambda s: s["role"] == 1),
                        lambda s: s["positions"]), F.lit(1)),
        F.array().cast("array<int>"))
    # anchors: first-word positions with a second-word occurrence within
    # slop intervening tokens in EITHER direction (|p−q| − 1 ≤ slop);
    # near_not counts the complement (see queryparse.Clause.near_not)
    def _window_hit(p):
        return F.exists(pb, lambda q: F.abs(p - q) - 1 <= F.col("slop"))

    tf_col = F.size(F.filter(
        pa, lambda p: F.when(F.col("inv") == 1,
                             ~_window_hit(p)).otherwise(_window_hit(p))))
    tf_all = (grouped
              .select("sid", "shard", "docid", tf_col.alias("tf"))
              .where(F.col("tf") > 0)
              .join(norms, ["shard", "docid"])
              .localCheckpoint(eager=True))

    stats_by_sid = {int(r["sid"]): (int(r["df"]), int(r["cf"]))
                    for r in tf_all.groupBy("sid")
                    .agg(F.count("*").alias("df"),
                         F.sum("tf").alias("cf")).collect()}
    live_sids = []
    for (a, b, slop, inv), sid in sid_of.items():
        st = stats_by_sid.get(sid)
        if not st or st[0] == 0:
            continue
        pseudo = pseudo_of_sid[sid]
        df_map[pseudo] = st
        # near: Σ both idfs (SpanNearQuery weight over both terms);
        # near_not: the INCLUDE term's idf only — the exclusion shapes tf,
        # never the weight (SpanNotQuery scores from the include span)
        words = (a,) if inv else (a, b)
        idf_over[pseudo] = sum(
            math.log(1.0 + (num_docs - df_map[w][0] + 0.5)
                     / (df_map[w][0] + 0.5))
            for w in words if w in df_map and df_map[w][0] > 0)
        live_sids.append(sid)
    if not live_sids:
        union = None
    else:
        base_kernel = _make_postings_kernel(block_size, docs_per_shard)

        def encode(batches):
            def add_dlq(pdf: pd.DataFrame) -> pd.DataFrame:
                out = pdf.assign(
                    dlq=quantize_length(pdf["dl"].to_numpy()).astype("int32"))
                return out[["shard", "term", "docid", "tf", "dlq"]]
            yield from base_kernel(add_dlq(b) for b in batches if not b.empty)

        name_df = spark.createDataFrame(
            [(sid, pseudo_of_sid[sid]) for sid in live_sids],
            "sid int, term string")
        union = (tf_all.join(F.broadcast(name_df), "sid")
                 .select("shard", "term", "docid",
                         F.col("tf").cast("int"), "dl")
                 .repartition(num_shards, "shard")
                 .sortWithinPartitions("shard", "term", "docid")
                 .mapInPandas(encode, schema=_PSCHEMA))

    def swap(clauses):
        cl = []
        for c in clauses:
            if c.group:
                cl.append(Clause(c.occur, c.boost, [], group=swap(c.group)))
            elif getattr(c, "near", None) is not None:
                pseudo = specs[(c.terms[0][0], c.terms[1][0], int(c.near),
                                bool(getattr(c, "near_not", False)))]
                cl.append(Clause(c.occur, c.boost, [(pseudo, 1.0)]))
            else:
                cl.append(c)
        return cl

    new_plans = [QueryPlan(p.qid, swap(p.clauses), p.mode) for p in plans]
    return new_plans, union


def _interval_pseudo_term(words: tuple[str, ...], gaps: int, x: str | None,
                          h: str | None = None) -> str:
    return (f"\x01intv:{gaps}:" + "\x01".join(words)
            + f"\x01!{x or ''}\x01+{h or ''}")


def _rewrite_interval_plans(spark, index_path, plans, df_map, idf_over, *,
                            num_docs, num_shards, docs_per_shard,
                            block_size, shard_base=0, live_pred=None):
    """Rewrite ordered-interval clauses (Lucene IntervalQuery — semantics
    and the minimal-interval definition at queryparse.Clause.gaps) to
    pseudo-terms over the positions sidecar, the same single-job shape as
    the span_near rewrite: ONE positions read for all specs' words joined
    to a broadcast spec table, one groupBy (sid, shard, docid) whose
    Catalyst fold counts minimal intervals over n ORDERED words — the
    greedy chain from each first-word position p (each later word at its
    earliest position after the previous link) ends at q; chains are
    monotone in p, so (p, q) is minimal iff NO later first-word
    occurrence chains to the same q, and it counts iff additionally
    q − p − (n−1) ≤ max_gaps (Intervals.maxgaps: total intervening
    non-member tokens), no exclusion-term occurrence lies in [p, q]
    (Intervals.notContaining) and, when required, a containing-term
    occurrence does (Intervals.containing) — stats in one collect, pseudo
    postings through the same blocked varbyte kernel as everything else.
    Per-doc cost is O(|first-word positions|² · n · log) from the
    minimality re-chain inside exists() — the same complexity class as
    the sloppy-phrase kernel's correlated mins, fine at real-query
    occurrence counts."""
    from .indexer import POSTINGS_SCHEMA as _PSCHEMA, _make_postings_kernel
    from .queryparse import Clause, QueryPlan
    from ..functions.smallfloat import quantize_length

    specs: dict[tuple, str] = {}
    for p in plans:
        for c in iter_term_clauses(p.clauses):
            g = getattr(c, "gaps", None)
            if g is None:
                continue
            if len(c.terms) < 2 or c.phrase or c.prefix:
                raise ValueError(
                    f"interval clause must carry two or more plain "
                    f"terms (got {c!r})")
            words = tuple(t for t, _ in c.terms)
            x = getattr(c, "intv_not", None)
            if x in words:
                raise ValueError(
                    f"interval not_containing term {x!r} collides with a "
                    f"member")
            h = getattr(c, "intv_has", None)
            if h is not None and h == x:
                raise ValueError(
                    f"interval containing and not_containing both {x!r}")
            specs.setdefault((words, int(g), x, h),
                             _interval_pseudo_term(words, int(g), x, h))
    if not specs:
        return plans, None

    if live_pred is None:
        live_pred = ((F.col("shard") >= shard_base) &
                     (F.col("shard") < num_shards))
    sid_of = {key: i for i, key in enumerate(specs)}
    pseudo_of_sid = {i: specs[k] for k, i in sid_of.items()}
    # member word j → role j (a repeated word holds several roles — its
    # one positions row fans out through the join); exclusion role −2,
    # containment role −3
    memb_rows = []
    for (words, g, x, h), sid in sid_of.items():
        need = int(h is not None)  # sid requires a containing hit
        nw = len(words)
        for j, w in enumerate(words):
            memb_rows.append((sid, w, j, g, need, nw))
        if x is not None:
            memb_rows.append((sid, x, -2, g, need, nw))
        if h is not None:
            memb_rows.append((sid, h, -3, g, need, nw))
    all_words = sorted({r[1] for r in memb_rows})

    pos = (read_parquet(spark, f"{index_path}/positions")
           .where(F.col("term").isin(all_words) & live_pred))
    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live_pred)
             .select("shard", "docid", "dl"))
    memb = spark.createDataFrame(
        memb_rows,
        "sid int, word string, role int, gaps int, need int, nw int")

    joined = (pos.join(F.broadcast(memb), pos["term"] == memb["word"])
              .select("sid", "shard", "docid", "role", "gaps", "need",
                      "nw", "positions"))
    grouped = (joined.groupBy("sid", "shard", "docid")
               .agg(F.max("gaps").alias("gaps"),
                    F.max("need").alias("need"),
                    F.max("nw").alias("nw"),
                    F.collect_list(F.struct("role", "positions"))
                    .alias("items"))
               # a chain needs EVERY ordered member in the doc; a row
               # holding only the exclusion term can never match
               .where(F.size(F.filter(
                   F.col("items"), lambda s: s["role"] >= 0))
                   == F.col("nw")))
    items = F.col("items")

    def _role(r):
        return F.coalesce(
            F.try_element_at(
                F.transform(F.filter(items, lambda s: s["role"] == r),
                            lambda s: s["positions"]), F.lit(1)),
            F.array().cast("array<int>"))

    pa, px, ph = _role(0), _role(-2), _role(-3)
    # position arrays for roles 1..nw−1, chain order
    tail = F.transform(
        F.sequence(F.lit(1), F.col("nw") - 1),
        lambda r: F.coalesce(
            F.try_element_at(
                F.transform(F.filter(items, lambda s: s["role"] == r),
                            lambda s: s["positions"]), F.lit(1)),
            F.array().cast("array<int>")))

    def _chain(p):
        # earliest-after greedy chain: each later word at its first
        # position after the previous link; NULL acc propagates (j > NULL
        # filters everything, array_min of empty is NULL)
        return F.aggregate(
            tail, p, lambda acc, arr: F.array_min(
                F.filter(arr, lambda j: j > acc)))

    # minimal intervals: chains are monotone in p, so (p, q) is minimal
    # iff no later first-word occurrence chains to the same q. chain(p2)
    # of a doomed start is NULL; the equality must read FALSE there, not
    # NULL — an uncoalesced NULL element makes exists() return NULL
    # (three-valued logic) and a NULL-poisoned ~exists would silently
    # drop valid anchors
    def _valid(p):
        q = _chain(p)
        return (q.isNotNull()
                & ((q - p - (F.col("nw") - F.lit(1))) <= F.col("gaps"))
                & ~F.exists(pa, lambda p2: F.coalesce(
                    (p2 > p) & (_chain(p2) == q), F.lit(False)))
                & ~F.exists(px, lambda xx: (xx >= p) & (xx <= q))
                & ((F.col("need") == 0)
                   | F.exists(ph, lambda hh: (hh >= p) & (hh <= q))))

    tf_col = F.size(F.filter(pa, _valid))
    tf_all = (grouped
              .select("sid", "shard", "docid", tf_col.alias("tf"))
              .where(F.col("tf") > 0)
              .join(norms, ["shard", "docid"])
              .localCheckpoint(eager=True))

    stats_by_sid = {int(r["sid"]): (int(r["df"]), int(r["cf"]))
                    for r in tf_all.groupBy("sid")
                    .agg(F.count("*").alias("df"),
                         F.sum("tf").alias("cf")).collect()}
    live_sids = []
    for (words, g, x, h), sid in sid_of.items():
        st = stats_by_sid.get(sid)
        if not st or st[0] == 0:
            continue
        pseudo = pseudo_of_sid[sid]
        df_map[pseudo] = st
        # Σ ordered members' idfs, repeats counted per occurrence (the
        # SpanWeight convention the phrase/near rewrites follow); the
        # exclusion/containment terms never weigh
        idf_over[pseudo] = sum(
            math.log(1.0 + (num_docs - df_map[w][0] + 0.5)
                     / (df_map[w][0] + 0.5))
            for w in words if w in df_map and df_map[w][0] > 0)
        live_sids.append(sid)
    if not live_sids:
        union = None
    else:
        base_kernel = _make_postings_kernel(block_size, docs_per_shard)

        def encode(batches):
            def add_dlq(pdf: pd.DataFrame) -> pd.DataFrame:
                out = pdf.assign(
                    dlq=quantize_length(pdf["dl"].to_numpy()).astype("int32"))
                return out[["shard", "term", "docid", "tf", "dlq"]]
            yield from base_kernel(add_dlq(b) for b in batches if not b.empty)

        name_df = spark.createDataFrame(
            [(sid, pseudo_of_sid[sid]) for sid in live_sids],
            "sid int, term string")
        union = (tf_all.join(F.broadcast(name_df), "sid")
                 .select("shard", "term", "docid",
                         F.col("tf").cast("int"), "dl")
                 .repartition(num_shards, "shard")
                 .sortWithinPartitions("shard", "term", "docid")
                 .mapInPandas(encode, schema=_PSCHEMA))

    def swap(clauses):
        cl = []
        for c in clauses:
            if c.group:
                cl.append(Clause(c.occur, c.boost, [], group=swap(c.group)))
            elif getattr(c, "gaps", None) is not None:
                pseudo = specs[(tuple(t for t, _ in c.terms), int(c.gaps),
                                getattr(c, "intv_not", None),
                                getattr(c, "intv_has", None))]
                cl.append(Clause(c.occur, c.boost, [(pseudo, 1.0)]))
            else:
                cl.append(c)
        return cl

    new_plans = [QueryPlan(p.qid, swap(p.clauses), p.mode) for p in plans]
    return new_plans, union


def _rewrite_phrase_prefix_plans(spark, index_path, plans, df_map, idf_over,
                                 *, num_docs, num_shards, docs_per_shard,
                                 block_size, shard_base=0, live_pred=None,
                                 max_expansions=None):
    """Rewrite phrase-prefix clauses (ES match_phrase_prefix — see
    queryparse.Clause.pprefix for the full semantics and the documented
    SynonymQuery-idf departure from Lucene MultiPhraseQuery) to
    pseudo-terms backed by positional postings, the same shape as the
    phrase rewrite: ONE bounded expansion job for all prefixes (term-order
    ``limit(max_expansions)`` over the term-sorted stats scan — Lucene's
    setMaxExpansions truncates silently, it does not throw), one positions
    read for fixed words ∪ expansions joined to a broadcast membership
    table, one groupBy (pid, shard, docid) whose Catalyst fold intersects
    the shifted fixed-word arrays with the UNION of the expansion terms'
    shifted arrays (tf = anchors completed by any expansion), stats in one
    collect, pseudo postings through the same blocked varbyte kernel.

    Scale shape: expansion candidates never exceed max_expansions per
    prefix ON THE DRIVER (TakeOrderedAndProject); the positions groupBy is
    keyed (pid, shard, docid) so head-term rows stay bounded per shard."""
    from .indexer import POSTINGS_SCHEMA as _PSCHEMA, _make_postings_kernel
    from .queryparse import Clause, QueryPlan
    from ..functions.smallfloat import quantize_length

    if max_expansions is None:  # read at call time so tests/config can
        max_expansions = MAX_PHRASE_PREFIX_EXPANSIONS  # override the cap
    specs: dict[tuple[tuple[str, ...], str], str] = {}
    for p in plans:
        for c in iter_term_clauses(p.clauses):
            pp = getattr(c, "pprefix", None)
            if pp is None:
                continue
            if c.phrase or c.prefix or c.fuzzy is not None or not c.terms:
                raise ValueError(
                    f"phrase_prefix clause must carry plain fixed words "
                    f"(got {c!r})")
            key = (tuple(t for t, _ in c.terms), pp)
            specs.setdefault(key, _phrase_prefix_pseudo_term(*key))
    if not specs:
        return plans, None

    if live_pred is None:
        live_pred = ((F.col("shard") >= shard_base) &
                     (F.col("shard") < num_shards))

    # bounded expansion for ALL distinct prefixes in ONE job (a union of
    # per-prefix StringStartsWith branches, each limit-capped BEFORE the
    # collect — the same no-per-pattern-jobs shape as
    # _expand_multiterm_plans); the dictionary read also supplies each
    # expansion's df for the synonym-style idf
    from .indexer import read_term_stats
    stats = read_term_stats(spark, index_path, num_shards=num_shards,
                            shard_base=shard_base)
    branches = None
    for pfx in sorted({p for _ws, p in specs}):
        b = (stats.where(F.col("term").startswith(pfx))
             .select(F.lit(pfx).alias("pfx"), "term", "df")
             .orderBy("term").limit(max_expansions))
        branches = b if branches is None else branches.unionByName(b)
    expansions: dict[str, list[tuple[str, int]]] = \
        {pfx: [] for _ws, pfx in specs}
    for r in branches.collect():
        expansions[r["pfx"]].append((r["term"], int(r["df"])))
    for pfx in expansions:
        expansions[pfx].sort()

    pid_of = {key: i for i, key in enumerate(specs)}
    pseudo_of_pid = {i: specs[k] for k, i in pid_of.items()}
    memb_rows, n_fixed_of = [], {}
    for (words, pfx), pid in pid_of.items():
        n_fixed_of[pid] = len(words)
        for off, w in enumerate(words):
            memb_rows.append((pid, w, off, 0))
        for t, _df in expansions[pfx]:
            memb_rows.append((pid, t, len(words), 1))
    all_words = sorted({w for _pid, w, _off, _x in memb_rows})

    pos = (read_parquet(spark, f"{index_path}/positions")
           .where(F.col("term").isin(all_words) & live_pred))
    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live_pred)
             .select("shard", "docid", "dl"))
    memb = spark.createDataFrame(
        memb_rows, "pid int, word string, off int, is_exp int")
    nf = spark.createDataFrame(
        [(pid, n) for pid, n in n_fixed_of.items()], "pid int, n_fixed int")

    joined = (pos.join(F.broadcast(memb), pos["term"] == memb["word"])
              .select("pid", "shard", "docid", "is_exp",
                      F.transform("positions", lambda x: x - F.col("off"))
                      .alias("sp")))
    grouped = (joined.groupBy("pid", "shard", "docid")
               .agg(F.collect_list(F.struct("is_exp", "sp")).alias("items"))
               .join(F.broadcast(nf), "pid"))
    items = F.col("items")
    fixed_arrs = F.transform(
        F.filter(items, lambda s: s["is_exp"] == 0), lambda s: s["sp"])
    exp_all = F.array_distinct(F.flatten(F.transform(
        F.filter(items, lambda s: s["is_exp"] == 1), lambda s: s["sp"])))
    # try_element_at: a doc holding only expansion rows has an EMPTY fixed
    # array and codegen evaluates this projection before the n_fixed
    # filter — the NULL seed folds to a NULL intersect, size() = -1, and
    # the tf > 0 cut drops it (same rows the filter drops anyway)
    fixed_fold = F.aggregate(fixed_arrs,
                             F.try_element_at(fixed_arrs, F.lit(1)),
                             lambda acc, a: F.array_intersect(acc, a))
    tf_col = F.size(F.array_intersect(fixed_fold, exp_all))
    # same localCheckpoint rationale as the phrase rewrite: one eager
    # materialization feeds the stats collect AND the encode
    tf_all = (grouped
              .where(F.size(fixed_arrs) == F.col("n_fixed"))
              .select("pid", "shard", "docid", tf_col.alias("tf"))
              .where(F.col("tf") > 0)
              .join(norms, ["shard", "docid"])
              .localCheckpoint(eager=True))

    stats_by_pid = {int(r["pid"]): (int(r["df"]), int(r["cf"]))
                    for r in tf_all.groupBy("pid")
                    .agg(F.count("*").alias("df"),
                         F.sum("tf").alias("cf")).collect()}
    live_pids = []
    for (words, pfx), pid in pid_of.items():
        st = stats_by_pid.get(pid)
        if not st or st[0] == 0:
            continue  # no completion anywhere: stays out of df_map, so
            # MUST excludes everything and SHOULD contributes nothing
        pseudo = pseudo_of_pid[pid]
        df_map[pseudo] = st
        # BM25: Σ fixed-word idfs + one synonym-style idf for the
        # expansion set (df = max member df; see Clause.pprefix for the
        # documented departure from Lucene's Σ-over-every-expansion)
        idf = sum(
            math.log(1.0 + (num_docs - df_map[w][0] + 0.5)
                     / (df_map[w][0] + 0.5))
            for w in words if w in df_map and df_map[w][0] > 0)
        max_df = max((d for _t, d in expansions[pfx]), default=0)
        if max_df > 0:
            idf += math.log(1.0 + (num_docs - max_df + 0.5)
                            / (max_df + 0.5))
        idf_over[pseudo] = idf
        live_pids.append(pid)
    if not live_pids:
        union = None
    else:
        base_kernel = _make_postings_kernel(block_size, docs_per_shard)

        def encode(batches):
            def add_dlq(pdf: pd.DataFrame) -> pd.DataFrame:
                out = pdf.assign(
                    dlq=quantize_length(pdf["dl"].to_numpy()).astype("int32"))
                return out[["shard", "term", "docid", "tf", "dlq"]]
            yield from base_kernel(add_dlq(b) for b in batches if not b.empty)

        name_df = spark.createDataFrame(
            [(pid, pseudo_of_pid[pid]) for pid in live_pids],
            "pid int, term string")
        union = (tf_all.join(F.broadcast(name_df), "pid")
                 .select("shard", "term", "docid",
                         F.col("tf").cast("int"), "dl")
                 .repartition(num_shards, "shard")
                 .sortWithinPartitions("shard", "term", "docid")
                 .mapInPandas(encode, schema=_PSCHEMA))

    def swap(clauses):
        cl = []
        for c in clauses:
            if c.group:
                cl.append(Clause(c.occur, c.boost, [], group=swap(c.group)))
            elif getattr(c, "pprefix", None) is not None:
                pseudo = specs[(tuple(t for t, _ in c.terms), c.pprefix)]
                cl.append(Clause(c.occur, c.boost, [(pseudo, 1.0)]))
            else:
                cl.append(c)
        return cl

    new_plans = [QueryPlan(p.qid, swap(p.clauses), p.mode) for p in plans]
    return new_plans, union


def _rewrite_spanfirst_plans(spark, index_path, plans, df_map, idf_over, *,
                             num_docs, num_shards, docs_per_shard,
                             block_size, shard_base=0, live_pred=None):
    """Rewrite span-first clauses (Lucene SpanFirstQuery — Clause.first) to
    pseudo-terms whose positional postings carry tf = the count of the
    term's occurrences at token positions < end. ONE Spark job for all
    (term, end) specs in the batch, the same shape as the phrase rewrite:
    the positions read (term-predicate-pushed, live-shard-gated) joins a
    broadcast spec table, the qualifying-occurrence count is one Catalyst
    ``size(filter(positions, p < end))`` per row (positions are 0-based),
    stats come back in one collect, and all pseudo postings encode through
    the SAME blocked varbyte kernel — the scorer needs no span path.

    Scoring follows the engine's phrase convention: under BM25 the pseudo
    scores with the WRAPPED TERM's idf via ``idf_over`` (Lucene SpanWeight
    builds its SimWeight from the underlying term states, so df is the
    term's full df, not the span df); under QLD the pseudo's own (df, cf)
    feed LMDirichlet. A spec matching nothing stays out of df_map, so a
    MUST clause correctly excludes everything."""
    from .indexer import POSTINGS_SCHEMA as _PSCHEMA, _make_postings_kernel
    from .queryparse import Clause, QueryPlan
    from ..functions.smallfloat import quantize_length

    specs: dict[tuple[str, int], str] = {}
    for p in plans:
        for c in iter_term_clauses(p.clauses):
            end = getattr(c, "first", None)
            if end is None:
                continue
            if c.phrase or c.prefix or c.fuzzy is not None \
                    or getattr(c, "trange", None) is not None \
                    or getattr(c, "wild", None) is not None \
                    or getattr(c, "regex", None) is not None \
                    or len(c.terms) != 1:
                raise ValueError(
                    "span_first applies to a single plain term clause "
                    f"(got {c!r})")
            if end < 1:
                raise ValueError(f"span_first end must be >= 1, got {end}")
            term = c.terms[0][0]
            specs.setdefault((term, int(end)),
                             _spanfirst_pseudo_term(term, int(end)))
    if not specs:
        return plans, None

    if live_pred is None:
        live_pred = ((F.col("shard") >= shard_base) &
                     (F.col("shard") < num_shards))
    words = sorted({t for t, _e in specs})
    pos = (read_parquet(spark, f"{index_path}/positions")
           .where(F.col("term").isin(words) & live_pred))
    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live_pred)
             .select("shard", "docid", "dl"))
    sid_of = {key: i for i, key in enumerate(sorted(specs))}
    spec_df = spark.createDataFrame(
        [(sid, t, e) for (t, e), sid in sid_of.items()],
        "sid int, word string, fend int")

    tf_col = F.size(F.filter("positions", lambda x: x < F.col("fend")))
    # one eager materialization feeds both the stats collect and the encode
    # (same localCheckpoint rationale as the phrase rewrite: a bare persist
    # would leak one cached frame per span-first search for the session)
    tf_all = (pos.join(F.broadcast(spec_df), pos["term"] == spec_df["word"])
              .select("sid", "shard", "docid", tf_col.alias("tf"))
              .where(F.col("tf") > 0)
              .join(norms, ["shard", "docid"])
              .localCheckpoint(eager=True))

    stats = {int(r["sid"]): (int(r["df"]), int(r["cf"]))
             for r in tf_all.groupBy("sid")
                            .agg(F.count("*").alias("df"),
                                 F.sum("tf").alias("cf")).collect()}
    live_sids = []
    for (term, end), sid in sid_of.items():
        st = stats.get(sid)
        if not st or st[0] == 0:
            continue  # no qualifying occurrence anywhere: stays out of df_map
        pseudo = specs[(term, end)]
        df_map[pseudo] = st
        if term in df_map and df_map[term][0] > 0:
            idf_over[pseudo] = math.log(
                1.0 + (num_docs - df_map[term][0] + 0.5)
                / (df_map[term][0] + 0.5))
        live_sids.append(sid)

    if not live_sids:
        union = None
    else:
        base_kernel = _make_postings_kernel(block_size, docs_per_shard)

        def encode(batches):
            def add_dlq(pdf: pd.DataFrame) -> pd.DataFrame:
                out = pdf.assign(
                    dlq=quantize_length(pdf["dl"].to_numpy()).astype("int32"))
                return out[["shard", "term", "docid", "tf", "dlq"]]
            yield from base_kernel(add_dlq(b) for b in batches if not b.empty)

        name_df = spark.createDataFrame(
            [(sid, specs[key]) for key, sid in sid_of.items()
             if sid in set(live_sids)],
            "sid int, term string")
        union = (tf_all.join(F.broadcast(name_df), "sid")
                 .select("shard", "term", "docid",
                         F.col("tf").cast("int"), "dl")
                 .repartition(num_shards, "shard")
                 .sortWithinPartitions("shard", "term", "docid")
                 .mapInPandas(encode, schema=_PSCHEMA))

    def swap(clauses):
        cl = []
        for c in clauses:
            if c.group:
                cl.append(Clause(c.occur, c.boost, [], group=swap(c.group)))
            elif getattr(c, "first", None) is not None:
                pseudo = specs[(c.terms[0][0], int(c.first))]
                cl.append(Clause(c.occur, c.boost,
                                 [(pseudo, c.terms[0][1])]))
            else:
                cl.append(c)
        return cl

    new_plans = [QueryPlan(p.qid, swap(p.clauses), p.mode) for p in plans]
    return new_plans, union


def _rewrite_phrase_plans(spark, index_path, plans, df_map, idf_over, *,
                          num_docs, num_shards, docs_per_shard, block_size,
                          shard_base=0, live_pred=None):
    """Rewrite phrase clauses to pseudo-terms backed by positional postings
    — ONE Spark job for ALL phrases, however many the batch contains.

    Every distinct phrase's members become rows of a tiny broadcast
    membership table (pid, word, offset, n_words); the positions read (term-
    predicate-pushed, shard-pruned) joins it once, each row's position list
    is shifted by its member offset JVM-side, and a single groupBy
    (pid, shard, docid) folds the member lists with array_intersect — the
    intersection size is the exact phrase frequency (a doc must supply all
    n_words member rows to survive). All phrases' (df, cf) stats come back
    in ONE collect; all pseudo-term postings are encoded through the SAME
    blocked varbyte kernel as regular postings in ONE repartition+kernel
    pass, so the scorer needs no phrase-specific path and the postings frame
    gains exactly one union branch regardless of phrase count. (The round-2
    shape — a driver loop with a per-phrase .first() plus a per-phrase union
    branch — was O(#phrases) sequential jobs; a thousand-phrase topic batch
    would have crawled.)

    Scoring matches Lucene's PhraseQuery under BM25: tf = phrase frequency,
    idf = Σ member idfs (BM25Similarity.idfExplain over the phrase terms) —
    carried via ``idf_over``; under QLD the pseudo-term scores through the
    standard LMDirichlet formula with its own (df, cf) from df_map. A phrase
    with zero matches (or an unindexed member) stays out of df_map, so MUST
    clauses correctly exclude everything.

    Scale shape: the groupBy keys on (pid, shard, docid) — a head term's
    rows per shard stay bounded by docs_per_shard (the shard is the salt),
    and phrase candidates only exist for docs containing a member word."""
    from .indexer import POSTINGS_SCHEMA as _PSCHEMA, _make_postings_kernel
    from .queryparse import Clause, QueryPlan

    # keyed by (words, slop): "a b" and "a b"~3 are distinct pseudo-terms
    phrases: dict[tuple[tuple[str, ...], int], str] = {}
    for p in plans:
        for c in iter_term_clauses(p.clauses):
            if c.phrase and len(c.terms) > 1:
                key = (tuple(t for t, _ in c.terms), getattr(c, "slop", 0))
                phrases.setdefault(
                    key, _phrase_pseudo_term(list(key[0]), key[1]))
    pid_of = {key: i for i, key in enumerate(phrases)}
    pseudo_of_pid = {i: phrases[k] for k, i in pid_of.items()}

    pos_path = f"{index_path}/positions"
    all_words = sorted({w for ws, _s in phrases for w in ws})
    if live_pred is None:
        live_pred = ((F.col("shard") >= shard_base) &
                     (F.col("shard") < num_shards))
    pos = (read_parquet(spark, pos_path)
           .where(F.col("term").isin(all_words) & live_pred))
    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live_pred)
             .select("shard", "docid", "dl"))

    memb = spark.createDataFrame(
        [(pid, w, off, len(ws), slop)
         for (ws, slop), pid in pid_of.items()
         for off, w in enumerate(ws)],
        "pid int, word string, off int, n_words int, slop int")

    joined = (pos.join(F.broadcast(memb), pos["term"] == memb["word"])
              .select("pid", "shard", "docid", "off", "n_words", "slop",
                      "positions"))
    tf_parts = []

    if any(s == 0 for _ws, s in pid_of):
        # exact phrases: shift each member's positions by its offset; the
        # intersection size of the shifted arrays = phrase frequency
        shifted = (joined.where(F.col("slop") == 0)
                   .select("pid", "shard", "docid", "n_words",
                           F.transform("positions",
                                       lambda x: x - F.col("off"))
                           .alias("sp")))
        arrs = F.col("arrs")
        inter = F.aggregate(arrs, F.element_at(arrs, 1),
                            lambda acc, a: F.array_intersect(acc, a))
        tf_parts.append(
            (shifted.groupBy("pid", "shard", "docid")
             .agg(F.count("*").alias("nm"), F.max("n_words").alias("nw"),
                  F.collect_list("sp").alias("arrs"))
             .where(F.col("nm") == F.col("nw"))
             .select("pid", "shard", "docid", F.size(inter).alias("tf"))))

    if any(s > 0 for _ws, s in pid_of):
        # sloppy phrases ('"a b"~N'): ordered anchored-greedy proximity
        # (see queryparse.Clause.slop for semantics + Lucene departures).
        # Folded entirely in Catalyst: sort member arrays by phrase offset,
        # seed per-anchor (start, cur) structs from the first word's
        # positions, then aggregate() over the remaining arrays advancing
        # each anchor to the EARLIEST position after its current link —
        # a dead anchor's cur goes NULL and stays NULL (filter over a NULL
        # bound is empty, array_min(empty) is NULL). tf = anchors whose
        # final width excess ≤ slop. Like the exact path this is one
        # groupBy keyed (pid, shard, docid), shard-salted by construction.
        grouped = (joined.where(F.col("slop") > 0)
                   .groupBy("pid", "shard", "docid")
                   .agg(F.count("*").alias("nm"),
                        F.max("n_words").alias("nw"),
                        F.max("slop").alias("slop"),
                        F.array_sort(F.collect_list(
                            F.struct("off", "positions"))).alias("offarrs"))
                   .where(F.col("nm") == F.col("nw")))
        parrs = F.transform("offarrs", lambda x: x["positions"])
        init = F.transform(F.element_at(parrs, 1),
                           lambda p: F.struct(p.alias("start"),
                                              p.alias("cur")))
        chained = F.aggregate(
            F.slice(parrs, F.lit(2), F.size(parrs) - 1), init,
            lambda acc, nxt: F.transform(
                acc,
                lambda s: F.struct(
                    s["start"].alias("start"),
                    F.array_min(F.filter(nxt, lambda x: x > s["cur"]))
                    .alias("cur"))))
        tf_sloppy = F.size(F.filter(
            chained,
            lambda s: s["cur"].isNotNull()
            & ((s["cur"] - s["start"] - (F.col("nw") - 1))
               <= F.col("slop"))))
        tf_parts.append(grouped.select("pid", "shard", "docid",
                                       tf_sloppy.alias("tf")))

    tf_union = tf_parts[0]
    for part in tf_parts[1:]:
        tf_union = tf_union.unionByName(part)
    # materialized ONCE as an eager localCheckpoint (we must execute it
    # anyway for the stats collect below): feeds both the stats and the
    # pseudo-term encode without recompute, and its blocks are GC-released
    # with the plan — a bare persist() here would leak one cached frame per
    # phrase-bearing search() for the session lifetime (a long-lived query
    # service or a warm bench loop fills executor storage memory)
    tf_all = (tf_union
              .where(F.col("tf") > 0)
              .join(norms, ["shard", "docid"])
              .localCheckpoint(eager=True))

    # ALL phrases' stats in one job
    stats = {int(r["pid"]): (int(r["df"]), int(r["cf"]))
             for r in tf_all.groupBy("pid")
                            .agg(F.count("*").alias("df"),
                                 F.sum("tf").alias("cf")).collect()}
    live_pids = []
    for (words, _slop), pid in pid_of.items():
        st = stats.get(pid)
        if not st or st[0] == 0:
            continue  # phrase matches nothing: pseudo stays out of df_map
        pseudo = pseudo_of_pid[pid]
        df_map[pseudo] = st
        idf_over[pseudo] = sum(
            math.log(1.0 + (num_docs - df_map[w][0] + 0.5) / (df_map[w][0] + 0.5))
            for w in words if w in df_map and df_map[w][0] > 0)
        live_pids.append(pid)
    if not live_pids:
        union = None
    else:
        base_kernel = _make_postings_kernel(block_size, docs_per_shard)

        def encode(batches):
            def add_dlq(pdf: pd.DataFrame) -> pd.DataFrame:
                out = pdf.assign(
                    dlq=quantize_length(pdf["dl"].to_numpy()).astype("int32"))
                return out[["shard", "term", "docid", "tf", "dlq"]]
            yield from base_kernel(add_dlq(b) for b in batches if not b.empty)

        name_df = spark.createDataFrame(
            [(pid, pseudo_of_pid[pid]) for pid in live_pids],
            "pid int, term string")
        union = (tf_all.join(F.broadcast(name_df), "pid")
                 .select("shard", "term", "docid",
                         F.col("tf").cast("int"), "dl")
                 .repartition(num_shards, "shard")
                 .sortWithinPartitions("shard", "term", "docid")
                 .mapInPandas(encode, schema=_PSCHEMA))

    # swap phrase clauses for their pseudo-term, descending through nested
    # groups (new plan objects — the caller's plans are not mutated)
    def swap(clauses):
        cl = []
        for c in clauses:
            if c.group:
                cl.append(Clause(c.occur, c.boost, [], group=swap(c.group)))
            elif c.phrase and len(c.terms) > 1:
                pseudo = phrases[(tuple(t for t, _ in c.terms),
                                  getattr(c, "slop", 0))]
                cl.append(Clause(c.occur, c.boost, [(pseudo, 1.0)]))
            else:
                cl.append(c)
        return cl

    new_plans = [QueryPlan(p.qid, swap(p.clauses), p.mode) for p in plans]
    return new_plans, union


def _make_shard_scorer(plans_payload, df_map, *, scorer, k, k1, b, mu,
                       lam=0.1, dfr_c=1.0, ax_s=0.5, ax_k=0.35,
                       num_docs, total_tf, avgdl, docs_per_shard,
                       use_pruner=True, idf_over=None, deleted=None,
                       after=None, count_only=False, min_should_match=0,
                       dv_range=None, dv_boost=None):
    """Build the per-shard cogrouped kernel. Pure numpy inside.

    ``idf_over`` maps pseudo-terms (phrases) to an explicit idf that replaces
    the df-derived one — Lucene phrase scoring uses Σ member idfs.

    ``deleted`` maps shard → sorted local positions of tombstoned docs
    (operators/deletes.py): those positions are masked out of the candidate
    set before the local top-k, while df/cf/num_docs/avgdl stay at the
    manifest values (Lucene pre-merge delete semantics). A tombstoned shard
    takes the dense path — the block-max pruner's bounds would still be
    valid upper bounds over a masked candidate set, but its seed pass could
    pick deleted docs and under-seed the threshold; correctness over
    cleverness until compaction clears the tombstones.

    ``after`` maps qid → (score, docid) page cursor: only docs strictly
    after it in (score desc, docid asc) order survive, applied BEFORE the
    local top-k cut. Score recomputation is bit-deterministic (same kernel,
    same doubles, same order), so equality against the previous page's
    returned score is exact. Callers must not hand the pruner a cursored
    query (search() forces the dense path when paging).

    ``count_only`` turns the kernel into Lucene's TotalHitCountCollector:
    one row per (query, shard) with score = number of matching docs (after
    tombstone/cursor masking), no per-doc output and no top-k cut.

    ``dv_range`` = (lo, hi), either side None for unbounded: a FILTER-
    context doc-values range (ES bool.filter over a numeric field,
    executed like its per-segment doc-values bitset). The packed_pdf side
    must carry a ``dv`` float64 blob column (search() joins the value
    sidecar shard-wise); candidates outside the range — or with a NaN
    (missing) value, ES's a-range-never-matches-missing semantics — are
    masked BEFORE the local top-k cut, so filtered retrieval is exact
    without materializing the match set. Scores stay the unrestricted
    corpus-statistics values (a filter never contributes to the score)."""
    idf_over = idf_over or {}
    after = after or {}

    def kernel(key, posts_pdf: pd.DataFrame, packed_pdf: pd.DataFrame) -> pd.DataFrame:
        if posts_pdf.empty or packed_pdf.empty:
            return _empty_result()
        shard = int(key[0])
        base = shard * docs_per_shard
        dead = None if deleted is None else deleted.get(shard)

        dv_ok = None
        if dv_range is not None:
            if "dv" not in packed_pdf.columns \
                    or packed_pdf["dv"].iloc[0] is None:
                # a live shard with postings but no doc-values blob would
                # silently pass every doc through the filter — refuse, like
                # the facet kernel's missing-blob check
                raise ValueError(
                    f"shard {shard} has postings but no doc-values blob; "
                    "rebuild the value sidecar after appends/compaction")
            dvals = np.frombuffer(bytes(packed_pdf["dv"].iloc[0]),
                                  dtype=np.float64)
            lo, hi = dv_range
            with np.errstate(invalid="ignore"):  # NaN compares → False
                dv_ok = np.ones(len(dvals), dtype=bool)
                if lo is not None:
                    dv_ok &= dvals >= lo
                if hi is not None:
                    dv_ok &= dvals <= hi
                dv_ok &= ~np.isnan(dvals)

        factor = None
        if dv_boost is not None:
            if "dvb" not in packed_pdf.columns \
                    or packed_pdf["dvb"].iloc[0] is None:
                raise ValueError(
                    f"shard {shard} has postings but no doc-values blob "
                    "for the boost field; rebuild the value sidecar after "
                    "appends/compaction")
            bx = np.frombuffer(bytes(packed_pdf["dvb"].iloc[0]),
                               dtype=np.float64)
            # d = max(0, |x - origin| - offset); factor per the published
            # ES decay formulas, NaN (missing) → 1.0 (ES missing-field)
            d = np.maximum(
                np.abs(bx - dv_boost["origin"]) - dv_boost["offset"], 0.0)
            sc, dc = float(dv_boost["scale"]), float(dv_boost["decay"])
            shp = dv_boost["shape"]
            if shp == "gauss":
                sigma2 = -(sc * sc) / (2.0 * math.log(dc))
                factor = np.exp(-(d * d) / (2.0 * sigma2))
            elif shp == "exp":
                factor = np.exp(d * (math.log(dc) / sc))
            else:  # linear
                s = sc / (1.0 - dc)
                factor = np.maximum((s - d) / s, 0.0)
            factor = np.where(np.isnan(bx), 1.0, factor)

        # dense per-shard dlq array from the packed norm-byte blob
        from ..functions.smallfloat import byte4_to_int
        codes = np.frombuffer(bytes(packed_pdf["codes"].iloc[0]), dtype=np.uint8)
        size = len(codes)
        if factor is not None and len(factor) < size:
            # docs beyond the boost blob: missing value → factor 1.0
            factor = np.concatenate([factor, np.ones(size - len(factor))])
        dlq = byte4_to_int(codes).astype(np.float64)

        if scorer == "bm25":
            K = k1 * (1.0 - b + b * dlq / avgdl)
        elif scorer == "qld":  # per-doc length component ln(mu/(dlq+mu))
            len_comp = np.log(mu / (dlq + mu))
        elif scorer == "qljm":
            # LM Jelinek-Mercer (Lucene LMJelinekMercerSimilarity):
            # per-term ln(1 + ((1-λ)·tf/dl) / (λ·p(t|C))). Only tf>0 docs
            # are ever scored, and tf>0 ⇒ dl≥1, so inv_dl's 0-guard is
            # defensive only (a dlq=0 slot can exist for an empty doc)
            with np.errstate(divide="ignore"):
                inv_dl = np.where(dlq > 0, 1.0 / dlq, 0.0)
        elif scorer == "classic":  # classic TF-IDF (ClassicSimilarity):
            # per-term √tf · idf² · 1/√dl over the same quantized norms
            with np.errstate(divide="ignore"):
                inv_sqrt_dl = np.where(dlq > 0, 1.0 / np.sqrt(dlq), 0.0)
        elif scorer in ("dfr_inl2", "pl2", "ib_ll"):
            # DFR InL2 / PL2 (Amati & van Rijsbergen, TOIS 2002; Lucene
            # DFRSimilarity, Terrier PL2) and IB (Clinchant & Gaussier,
            # SIGIR 2010; Lucene IBSimilarity) all share normalization 2:
            # doc length folds into a per-doc tf multiplier
            # tfn/tf = log2(1 + c·avgdl/dl); log2 is written
            # ln(x)·(1/ln 2) so the DuckDB oracle replays the identical
            # double-op tree
            inv_ln2 = 1.0 / math.log(2.0)
            with np.errstate(divide="ignore"):
                tfn_mult = np.where(
                    dlq > 0,
                    np.log(1.0 + (dfr_c * avgdl) / dlq) * inv_ln2, 0.0)
        elif scorer == "f2exp":
            # Axiomatic F2EXP (Fang & Zhai, SIGIR 2005; Lucene
            # AxiomaticF2EXP): the length component is Lucene's
            # s + s·dl/avgdl added to tf in the denominator
            dl_ax = dlq
        elif scorer == "bool":
            # BooleanSimilarity needs no per-doc length state: score is
            # the clause boost alone (no tf, idf, or norm)
            pass
        else:  # dfi: expected tf under independence needs the doc length
            # (e = cf·dl/total_tf; Kocabaş, Dinçer & Karaoğlan 2014)
            inv_ln2 = 1.0 / math.log(2.0)
            dl_dfi = dlq

        # per-term postings handles: decode lazily, by block
        handles: dict[str, _TermHandle] = {}
        for row in posts_pdf.itertuples(index=False):
            handles[row.term] = _TermHandle(
                bytes(row.postings),
                np.asarray(row.block_last, dtype=np.int64),
                np.asarray(row.block_max_tf, dtype=np.int64),
                np.asarray(row.block_min_dlq, dtype=np.int64),
                np.asarray(row.block_off, dtype=np.int64),
                np.asarray(row.block_gap_len, dtype=np.int64),
                base)

        bmw = _BlockMaxPruner(size, base, k1, b, avgdl, num_docs, k) \
            if (scorer == "bm25" and use_pruner) else None
        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        def full(term):
            """whole-list decode, cached."""
            got = decoded.get(term)
            if got is None:
                h = handles[term]
                d, t = h.decode(np.arange(len(h.block_last)))
                got = decoded[term] = (d - base, t.astype(np.float64))
            return got

        def eval_clauses(clauses, mm=0):
            """Score one boolean level; nested groups recurse — Lucene's
            BooleanQuery: score = Σ matching scoring clauses, a sub-query
            clause matches iff its own constraints hold and contributes
            boost × its score. Returns (total, cand_mask, has_scoring).

            ``mm`` (top level only) is Lucene's minimumNumberShouldMatch:
            a doc qualifies only if at least mm of this level's SHOULD
            clauses individually match it (MUST/MUST_NOT unaffected)."""
            total = np.zeros(size, dtype=np.float64)
            should_cnt = np.zeros(size, dtype=np.int32) if mm > 0 else None
            matched_any = np.zeros(size, dtype=bool)
            must_ok = np.ones(size, dtype=bool)
            forbidden = np.zeros(size, dtype=bool)
            has_scoring_clause = False
            for occur, boost, terms, kids in clauses:
                if kids:
                    sub_total, mask, sub_has = eval_clauses(kids)
                    if occur == MUST_NOT:
                        forbidden |= mask
                        continue
                    has_scoring_clause = has_scoring_clause or sub_has
                    if occur == MUST:
                        must_ok &= mask
                    elif should_cnt is not None:
                        should_cnt[mask] += 1
                    matched_any |= mask
                    total[mask] += boost * sub_total[mask]
                    continue
                etf = np.zeros(size, dtype=np.float64)
                edf = 0.0
                ecf = 0.0
                present = False
                for term, p in terms:
                    stat = df_map.get(term)
                    if stat is None:
                        continue  # term absent from index — matches nothing
                    present = True
                    edf += p * stat[0]
                    ecf += p * stat[1]
                    if term in handles:
                        pos, tfv = full(term)
                        etf[pos] += p * tfv
                mask = etf > 0
                if occur == MUST_NOT:
                    forbidden |= mask
                    continue
                has_scoring_clause = True
                if occur == MUST:
                    must_ok &= mask
                elif should_cnt is not None:
                    should_cnt[mask] += 1
                matched_any |= mask
                if not present or not mask.any():
                    continue
                if scorer == "bm25":
                    if len(terms) == 1 and terms[0][0] in idf_over:
                        idf = idf_over[terms[0][0]]  # phrase: Σ member idfs
                    else:
                        idf = math.log(1.0 + (num_docs - edf + 0.5) / (edf + 0.5))
                    total[mask] += boost * idf * etf[mask] / (etf[mask] + K[mask])
                elif scorer == "qld":  # LMDirichlet, +1-smoothed p(t|C)
                    p_c = (ecf + 1.0) / (total_tf + 1.0)
                    s = np.log(1.0 + etf[mask] / (mu * p_c)) + len_comp[mask]
                    total[mask] += boost * np.maximum(s, 0.0)
                elif scorer == "qljm":  # Jelinek-Mercer, same +1 smoothing
                    p_c = (ecf + 1.0) / (total_tf + 1.0)
                    # ln(1+x), NOT log1p: the DuckDB oracle replays ln(1+x)
                    # and the two can differ in the last ulp
                    s = np.log(1.0 + ((1.0 - lam) * etf[mask] * inv_dl[mask])
                               / (lam * p_c))
                    total[mask] += boost * s
                elif scorer == "classic":
                    # classic: √tf · (1+ln((N+1)/(df+1)))² · 1/√dl
                    idf = 1.0 + math.log((num_docs + 1.0) / (edf + 1.0))
                    total[mask] += (boost * np.sqrt(etf[mask])
                                    * (idf * idf) * inv_sqrt_dl[mask])
                elif scorer == "dfr_inl2":
                    # InL2: (1/(tfn+1)) · tfn · log2((N+1)/(df+0.5))
                    idf2 = (math.log((num_docs + 1.0) / (edf + 0.5))
                            * (1.0 / math.log(2.0)))
                    tfn = etf[mask] * tfn_mult[mask]
                    total[mask] += (boost * (1.0 / (tfn + 1.0))
                                    * tfn * idf2)
                elif scorer == "pl2":
                    # DFR PL2 (Amati & van Rijsbergen, TOIS 2002 —
                    # Poisson basic model P, Laplace after-effect L,
                    # normalization 2; Terrier's default model):
                    # λ = cf/N, gain = (1/(tfn+1)) · (tfn·log2(tfn/λ)
                    # + (λ − tfn)·log2(e) + 0.5·log2(2π·tfn)), clamped
                    # at 0 (Lucene requires non-negative scores; a
                    # tf at or below chance frequency contributes
                    # nothing, the same convention as dfi)
                    lam_p = ecf / num_docs
                    tfn = etf[mask] * tfn_mult[mask]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        g = ((1.0 / (tfn + 1.0))
                             * (tfn * (np.log(tfn / lam_p) * inv_ln2)
                                + (lam_p - tfn) * inv_ln2
                                + 0.5 * (np.log(2.0 * math.pi * tfn)
                                         * inv_ln2)))
                        # tfn = 0 (defensive dlq=0 slot) → log(0) noise;
                        # a zero normalized tf scores nothing
                        g = np.where(tfn > 0, g, 0.0)
                    total[mask] += boost * np.maximum(g, 0.0)
                elif scorer == "f2exp":
                    # Axiomatic F2EXP (Fang & Zhai, SIGIR 2005; Lucene
                    # AxiomaticF2EXP, s=0.5, k=0.35): per-term
                    # ((N+1)/df)^k · tf/(tf + s + s·dl/avgdl)
                    idf_ax = ((num_docs + 1.0) / edf) ** ax_k
                    total[mask] += (boost * idf_ax * etf[mask]
                                    / (etf[mask] + ax_s
                                       + ax_s * dl_ax[mask] / avgdl))
                elif scorer == "bool":
                    # Lucene BooleanSimilarity: every matching clause
                    # contributes exactly its boost — the classic filter-
                    # as-query scoring (constant_score's whole-query
                    # sibling, but per clause and boost-composable)
                    total[mask] += boost
                elif scorer == "ib_ll":
                    # IB LL·DF·H2 (Clinchant & Gaussier, SIGIR 2010;
                    # Lucene IBSimilarity(DistributionLL, LambdaDF,
                    # NormalizationH2)): λ = (df+1)/(N+1),
                    # gain = ln(1 + tfn/λ) — DistributionLL's
                    # -log(λ/(λ+tfn)) rewritten for the oracle replay
                    lam_ib = (edf + 1.0) / (num_docs + 1.0)
                    tfn = etf[mask] * tfn_mult[mask]
                    total[mask] += boost * np.log(1.0 + tfn / lam_ib)
                else:  # dfi (standardized independence): docs whose tf
                    # does not EXCEED the chance expectation e=cf·dl/F
                    # contribute nothing for the term (the paper's
                    # built-in stopword effect); above it,
                    # log2(1 + (tf-e)/√e)
                    e = (ecf * dl_dfi[mask]) / total_tf
                    m = etf[mask] - e
                    # the discarded np.where branch still evaluates
                    # log(1 + m/√e) at m ≤ -√e (argument ≤ 0) — silence
                    # the transient nan, where() never selects it
                    with np.errstate(invalid="ignore", divide="ignore"):
                        gain = np.where(
                            m > 0,
                            np.log(1.0 + m / np.sqrt(e)) * inv_ln2, 0.0)
                    total[mask] += boost * gain
            cand = matched_any & must_ok & ~forbidden
            if should_cnt is not None:
                cand &= should_cnt >= mm
            return total, cand, has_scoring_clause

        out_q, out_d, out_s = [], [], []
        for qid, clauses in plans_payload:
            # fast path: pure disjunctive single-term BM25 (plain/RM3/
            # weighted-OR queries) goes through the block-max pruner.
            # ts[0][1] == 1.0 excludes PSQ-probability terms: the dense
            # kernel scores those with EXPECTED statistics (idf(p·df),
            # p·tf), which the pruner's multiplicative weight cannot
            # reproduce — results must not depend on the pruning heuristic
            # (RM3/boosted terms carry their weight in the clause boost
            # with p = 1.0, so they keep the fast path)
            if bmw is not None and dead is None and dv_ok is None \
                    and not count_only \
                    and qid not in after and all(
                    occ == SHOULD and len(ts) == 1 and ts[0][1] == 1.0
                    and not kids
                    for occ, _, ts, kids in clauses):
                terms_w = [(ts[0][0], boost * ts[0][1])
                           for _, boost, ts, _kids in clauses]
                got = bmw.topk(terms_w, handles, df_map, K, idf_over)
                if got is not None:
                    cpos, cscore = got
                    if len(cpos):
                        out_q.append(np.full(len(cpos), qid, dtype=object))
                        out_d.append(cpos + base)
                        out_s.append(cscore)
                    continue
            total, cand, has_scoring_clause = eval_clauses(
                clauses, mm=min_should_match)
            if dead is not None and len(dead):
                # local positions, clipped defensively against stale rows
                cand[dead[dead < size]] = False
            if dv_ok is not None:
                n = min(size, len(dv_ok))
                cand[:n] &= dv_ok[:n]
                cand[n:] = False  # no value slot = missing = filtered out
            if not has_scoring_clause or not cand.any():
                continue
            cpos = np.flatnonzero(cand)
            cscore = total[cpos]
            if factor is not None:
                # exact function_score: factor per CANDIDATE, before the
                # cursor comparison and the local top-k cut
                if dv_boost["mode"] == "multiply":
                    cscore = cscore * factor[cpos]
                else:
                    cscore = cscore + dv_boost["weight"] * factor[cpos]
            aft = after.get(qid)
            if aft is not None:
                a_s, a_d = float(aft[0]), int(aft[1])
                keep = (cscore < a_s) | ((cscore == a_s)
                                         & (cpos + base > a_d))
                cpos, cscore = cpos[keep], cscore[keep]
                if not len(cpos):
                    continue
            if count_only:
                out_q.append(np.asarray([qid], dtype=object))
                out_d.append(np.asarray([base], dtype=np.int64))
                out_s.append(np.asarray([float(len(cpos))]))
                continue
            if k is not None and len(cpos) > k:
                part = np.argpartition(-cscore, k - 1)[:k]
                cpos, cscore = cpos[part], cscore[part]
            out_q.append(np.full(len(cpos), qid, dtype=object))
            out_d.append(cpos + base)
            out_s.append(cscore)

        if not out_q:
            return _empty_result()
        return pd.DataFrame({
            "query_id": np.concatenate(out_q),
            "docid": np.concatenate(out_d).astype(np.int64),
            "score": np.concatenate(out_s),
        })

    return kernel


class _TermHandle:
    """Lazy, block-granular access to one term's postings in a shard."""

    __slots__ = ("blob", "block_last", "block_max_tf", "block_min_dlq",
                 "block_off", "block_gap_len", "base")

    def __init__(self, blob, block_last, block_max_tf, block_min_dlq,
                 block_off, block_gap_len, base):
        self.blob = blob
        self.block_last = block_last
        self.block_max_tf = block_max_tf
        self.block_min_dlq = block_min_dlq
        self.block_off = block_off
        self.block_gap_len = block_gap_len
        self.base = base

    def decode(self, which: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return decode_blocks(self.blob, which, self.block_off,
                             self.block_gap_len, self.block_last, self.base)

    def spans(self) -> tuple[np.ndarray, np.ndarray]:
        """Conservative per-block local docid spans [lo, hi] (inclusive):
        lo = previous block's last + 1 (earliest possible first docid)."""
        hi = self.block_last - self.base
        lo = np.empty_like(hi)
        lo[0] = 0
        lo[1:] = hi[:-1] + 1
        return lo, hi


class _BlockMaxPruner:
    """Exact top-k for disjunctive weighted BM25 with block-max skipping,
    vectorized (numpy) rather than doc-at-a-time:

    1. optimistic bound O(d) for every doc slot via difference arrays over
       block spans — O(#blocks), no decoding;
    2. exact-score the k docs with highest O (decoding only blocks that
       contain them) → threshold θ = kth best exact score (a valid lower
       bound on the true kth score);
    3. candidates = {d : O(d) ≥ θ}; decode only blocks whose span contains a
       candidate; exact-score candidates; top-k.

    Correctness: s(d) ≤ O(d) ∀d, so every true top-k doc is a candidate, and
    every candidate's decoded contributions are complete (a posting's block
    span always contains its doc). Scores are exactly the dense scorer's.
    This is the block-max WAND idea (Ding & Suel, SIGIR'11) restructured for
    columnar execution: bounds and skipping at block granularity, but
    batch-vectorized instead of a per-doc pivot walk.
    """

    def __init__(self, size, base, k1, b, avgdl, num_docs, k):
        self.size = size
        self.base = base
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.num_docs = num_docs
        self.k = k

    def _block_ub(self, h: _TermHandle, w: float, idf: float) -> np.ndarray:
        mtf = h.block_max_tf.astype(np.float64)
        mdlq = h.block_min_dlq.astype(np.float64)
        kpart = self.k1 * (1.0 - self.b + self.b * mdlq / self.avgdl)
        return w * idf * mtf / (mtf + kpart)

    def topk(self, terms_w, handles, df_map, K, idf_over=None):
        """terms_w: [(term, weight)]. Returns (local_positions, scores) or
        None to signal 'use the fallback path'."""
        idf_over = idf_over or {}
        alive = []
        for term, w in terms_w:
            stat = df_map.get(term)
            h = handles.get(term)
            if stat is None or h is None or stat[0] <= 0:
                continue
            idf = idf_over.get(term)
            if idf is None:
                idf = math.log(1.0 + (self.num_docs - stat[0] + 0.5) / (stat[0] + 0.5))
            alive.append((h, w, idf))
        if not alive:
            return np.zeros(0, dtype=np.int64), np.zeros(0)

        # phase 1: optimistic bounds via diff arrays
        diff = np.zeros(self.size + 1, dtype=np.float64)
        sum_ub = 0.0  # Σ per-term max block bound — upper bound on any O(d)
        for h, w, idf in alive:
            ub = self._block_ub(h, w, idf)
            sum_ub += float(ub.max()) if ub.size else 0.0
            lo, hi = h.spans()
            np.add.at(diff, lo, ub)
            np.subtract.at(diff, hi + 1, ub)
        O = np.cumsum(diff[:-1])

        nz = np.flatnonzero(O > 0)
        if nz.size == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        kk = min(self.k, nz.size)

        def exact(cand_sorted: np.ndarray) -> np.ndarray:
            """Exact scores for sorted candidate positions; decodes only
            blocks whose span contains a candidate."""
            total = np.zeros(self.size, dtype=np.float64)
            for h, w, idf in alive:
                lo, hi = h.spans()
                # block contains a candidate ⟺ a candidate falls in [lo, hi]
                left = np.searchsorted(cand_sorted, lo, side="left")
                right = np.searchsorted(cand_sorted, hi, side="right")
                which = np.flatnonzero(right > left)
                if which.size == 0:
                    continue
                d, tf = h.decode(which)
                pos = d - self.base
                tf = tf.astype(np.float64)
                total[pos] += w * idf * tf / (tf + K[pos])
            return total

        # phase 2: threshold from the top-kk optimistic docs
        seeds = nz[np.argpartition(-O[nz], kk - 1)[:kk]]
        seeds.sort()
        seed_scores = exact(seeds)[seeds]
        theta = np.partition(seed_scores, len(seed_scores) - kk)[len(seed_scores) - kk] \
            if len(seed_scores) >= kk else 0.0
        theta = max(theta, 0.0)

        # phase 3: candidates + exact scoring. The cut slack is RELATIVE to
        # the bound magnitudes: O comes from an np.cumsum over a shard-sized
        # diff array, whose accumulated float error scales with the summed
        # magnitudes (≈ √n·ε_machine·Σub ≪ 1e-9·Σub even at 10^8 slots), so
        # an absolute 1e-12 could drop an exact-tie doc at production scale.
        # Extra slack only admits more candidates — never wrong results.
        slack = 1e-9 * max(sum_ub, 1.0)
        cand = np.flatnonzero(O >= theta - slack)
        total = exact(cand)
        cscore = total[cand]
        matched = cscore > 0
        cand, cscore = cand[matched], cscore[matched]
        if len(cand) > self.k:
            part = np.argpartition(-cscore, self.k - 1)[:self.k]
            cand, cscore = cand[part], cscore[part]
        return cand, cscore


def _empty_result() -> pd.DataFrame:
    return pd.DataFrame({
        "query_id": pd.Series(dtype=object),
        "docid": pd.Series(dtype=np.int64),
        "score": pd.Series(dtype=np.float64),
    })


def _chain_count(pos_lists: list[list[int]], slop: int) -> int:
    """Driver-side mirror of the sloppy-phrase Catalyst fold (explain()
    only touches a handful of docs): ordered anchored-greedy proximity —
    from each first-word position, link each later word to its earliest
    position after the previous link; count anchors whose width excess
    ≤ slop. Lists must be sorted ascending (positions/ stores them so)."""
    import bisect
    k = len(pos_lists)
    count = 0
    for p1 in pos_lists[0]:
        cur, alive = p1, True
        for arr in pos_lists[1:]:
            i = bisect.bisect_right(arr, cur)
            if i == len(arr):
                alive = False
                break
            cur = arr[i]
        if alive and cur - p1 - (k - 1) <= slop:
            count += 1
    return count


def explain(spark: SparkSession, index_path: str, plan: QueryPlan,
            doc_ids: list[str], cfg: RetrieveConfig | None = None) -> DataFrame:
    """Per-term score components for specific docs — the rebuild of the
    reference's debug explain logging (searcher.explain() for top-n hits,
    /root/reference/patapsco/retrieve.py:157-165).

    Returns (query_id, doc_id, clause, term, tf, dl, dlq, df, idf,
    contribution); summing `contribution` per doc reproduces the search
    score exactly (BM25 path).
    """
    cfg = cfg or RetrieveConfig()
    if cfg.name != "bm25":
        # the component decomposition below is the BM25 fold; emitting it
        # for another scorer would "explain" scores the search never
        # produced — refuse loudly rather than mislead
        raise ValueError(f"explain() is implemented for bm25 only, "
                         f"got {cfg.name!r}")
    meta = load_index_meta(index_path)
    num_docs = int(meta["num_docs"])
    avgdl = float(meta["avgdl"])

    if any(getattr(c, "first", None) is not None
           for c in iter_term_clauses(plan.clauses)):
        # the decomposition below reads whole posting lists; it cannot see
        # positions, so it would "explain" an unconstrained term score the
        # span-first search never produced — refuse loudly
        raise ValueError("explain() does not support span_first clauses")
    # wildcard/fuzzy/range plans explain their EXPANDED terms (same rewrite
    # as search — a literal 'te*' term would silently contribute nothing)
    if any(c.prefix or c.fuzzy is not None
           or getattr(c, "trange", None) is not None
           or getattr(c, "wild", None) is not None
           or getattr(c, "regex", None) is not None
           for c in iter_term_clauses(plan.clauses)):
        plan = _expand_multiterm_plans(
            spark, index_path, [plan], int(meta["num_shards"]),
            shard_base=int(meta.get("shard_base", 0)))[0]

    # live-shard gating, same as search(): without it an uncommitted or
    # superseded generation on disk (crashed compaction/append) maps a doc
    # id to TWO docids and explain() doubles every component row
    from .indexer import live_shard_pred
    live = live_shard_pred(meta)
    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live & F.col("id").isin(list(doc_ids)))
             .select("docid", "id", "dl"))
    want = {int(r["docid"]): (r["id"], int(r["dl"]))
            for r in norms.collect()}

    terms = sorted({t for c in iter_term_clauses(plan.clauses)
                    for t, _ in c.terms})
    from .indexer import read_term_stats
    stats = {r["term"]: int(r["df"]) for r in
             read_term_stats(spark, index_path,
                             num_shards=int(meta["num_shards"]))
             .where(F.col("term").isin(terms)).collect()}
    posts = (read_parquet(spark, f"{index_path}/postings")
             .where(live & F.col("term").isin(terms)).collect())

    docs_per_shard = int(meta["docs_per_shard"])
    tf_by = {}
    for row in posts:
        h = _TermHandle(bytes(row["postings"]),
                        np.asarray(row["block_last"], dtype=np.int64),
                        np.asarray(row["block_max_tf"], dtype=np.int64),
                        np.asarray(row["block_min_dlq"], dtype=np.int64),
                        np.asarray(row["block_off"], dtype=np.int64),
                        np.asarray(row["block_gap_len"], dtype=np.int64),
                        int(row["shard"]) * docs_per_shard)
        d, t = h.decode(np.arange(len(h.block_last)))
        for docid, tf in zip(d, t):
            if int(docid) in want:
                tf_by[(row["term"], int(docid))] = int(tf)

    # positional phrase clauses (when the index has a positions sidecar):
    # tf = exact phrase frequency in the doc, idf = Σ member idfs, reported
    # as one component row per clause with term = the quoted phrase.
    # Labels are nesting paths ("1", "2.0", …) so nested-group components
    # stay attributable.
    def leaves(clauses, prefix=""):
        for ci, c in enumerate(clauses):
            label = f"{prefix}{ci}"
            if c.group:
                yield from leaves(c.group, label + ".")
            else:
                yield label, c

    phrase_tf: dict[tuple[str, int], int] = {}
    phrase_leaves = [(lb, c) for lb, c in leaves(plan.clauses)
                     if c.phrase and len(c.terms) > 1]
    if phrase_leaves and meta.get("positions"):
        words_all = sorted({t for _, c in phrase_leaves for t, _ in c.terms})
        prows = (read_parquet(spark, f"{index_path}/positions")
                 .where(live & F.col("term").isin(words_all) &
                        F.col("docid").isin(list(want))).collect())
        pos_by = {(r["term"], int(r["docid"])): list(r["positions"])
                  for r in prows}
        for lb, c in phrase_leaves:
            words = [t for t, _ in c.terms]
            slop = getattr(c, "slop", 0)
            for docid in want:
                if slop:
                    lists = [sorted(pos_by.get((w, docid), ()))
                             for w in words]
                    phrase_tf[(lb, docid)] = (
                        _chain_count(lists, slop) if all(lists) else 0)
                else:
                    sets = [set(x - i for x in pos_by.get((w, docid), ()))
                            for i, w in enumerate(words)]
                    phrase_tf[(lb, docid)] = (
                        len(set.intersection(*sets)) if all(sets) else 0)

    def idf_of(df):
        return math.log(1.0 + (num_docs - df + 0.5) / (df + 0.5))

    def eval_doc(clauses, docid, ext_id, dl, dlq, kpart, prefix, scale):
        """Mirror of the scorer kernel for ONE doc: returns (rows, total,
        matched). A nested group's leaf rows are emitted only if the group
        itself matches (Lucene: non-matching clauses contribute nothing);
        ``scale`` carries the product of ancestor boosts so row
        contributions sum EXACTLY to the doc's search score."""
        rows, total = [], 0.0
        matched = False
        must_ok = True
        forbidden = False
        for ci, c in enumerate(clauses):
            label = f"{prefix}{ci}"
            if c.group:
                srows, stotal, smatch = eval_doc(
                    c.group, docid, ext_id, dl, dlq, kpart,
                    label + ".", scale * c.boost)
                if c.occur == MUST_NOT:
                    forbidden |= smatch
                    continue
                if c.occur == MUST:
                    must_ok &= smatch
                if smatch:
                    matched = True
                    total += c.boost * stotal
                    rows += srows
                continue
            is_phrase = (label, docid) in phrase_tf or any(
                k[0] == label for k in phrase_tf)
            if is_phrase:
                tf = phrase_tf.get((label, docid), 0)
                clause_total = 0.0
                crows = []
                if tf > 0:
                    words = [t for t, _ in c.terms]
                    idf_sum = sum(idf_of(stats[w]) for w in words
                                  if stats.get(w, 0) > 0)
                    clause_total = c.boost * idf_sum * tf / (tf + kpart)
                    ptxt = '"' + " ".join(words) + '"'
                    if getattr(c, "slop", 0):
                        ptxt += f"~{c.slop}"
                    crows = [(plan.qid, ext_id, label,
                              ptxt, tf, dl, dlq, 0,
                              idf_sum, scale * clause_total)]
                mask = tf > 0
            elif len(c.terms) > 1:
                # PSQ clause: expected statistics (etf = Σp·tf, edf = Σp·df)
                # — ONE component row, exactly the kernel's clause score
                etf = sum(p * tf_by.get((t, docid), 0) for t, p in c.terms)
                edf = sum(p * stats.get(t, 0) for t, p in c.terms
                          if stats.get(t, 0) > 0)
                clause_total = 0.0
                crows = []
                if etf > 0 and edf > 0:
                    idf = idf_of(edf)
                    clause_total = c.boost * idf * etf / (etf + kpart)
                    name = "(" + " ".join(f"{t}^{p:g}" for t, p in c.terms) + ")"
                    crows = [(plan.qid, ext_id, label, name, int(round(etf)),
                              dl, dlq, int(round(edf)), idf,
                              scale * clause_total)]
                mask = etf > 0
            else:
                term, p = c.terms[0]
                df_t = stats.get(term, 0)
                tf = tf_by.get((term, docid), 0)
                # expected statistics, matching the kernel: for p == 1 this
                # is exactly idf(df)·tf/(tf+kpart); for a PSQ probability p
                # the kernel scores idf(p·df)·(p·tf)/((p·tf)+kpart) — NOT
                # p·score, which a multiplicative shortcut here used to
                # report, breaking "components sum to the search score"
                # for single-term PSQ clauses
                etf, edf = p * tf, p * df_t
                clause_total = 0.0
                crows = []
                if df_t > 0 and tf > 0:
                    idf = idf_of(edf)
                    clause_total = c.boost * idf * etf / (etf + kpart)
                    name = term if p == 1.0 else f"{term}^{p:g}"
                    crows = [(plan.qid, ext_id, label, name, int(round(etf)),
                              dl, dlq, int(round(edf)), idf,
                              scale * clause_total)]
                mask = tf > 0
            if c.occur == MUST_NOT:
                forbidden |= mask
                continue
            if c.occur == MUST:
                must_ok &= mask
            if mask:
                matched = True
                total += clause_total
                rows += crows
        return rows, total, matched and must_ok and not forbidden

    rows = []
    for docid, (ext_id, dl) in want.items():
        dlq = float(quantize_length(np.array([dl]))[0])
        kpart = cfg.k1 * (1 - cfg.b + cfg.b * dlq / avgdl)
        drows, _total, _matched = eval_doc(plan.clauses, docid, ext_id, dl,
                                           dlq, kpart, "", 1.0)
        rows += drows
    return spark.createDataFrame(
        rows, "query_id string, doc_id string, clause string, term string, "
              "tf long, dl long, dlq double, df long, idf double, "
              "contribution double")
