"""Match-set aggregations (operators/aggs.py): the matches_only collector
must return EXACTLY the documents search() would rank (identity pinned
against an exhaustive k), and sort/stats/histogram must equal brute-force
Python over that set.
"""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.aggs import (field_histogram, field_stats,
                                           match_set_texts, sort_by_field)
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("a1", "alpha beta pad pad pad", "eng", 11),
    ("a2", "alpha pad pad pad pad", "eng", 37),
    ("a3", "alpha beta gamma pad pad", "eng", 23),
    ("a4", "beta pad pad pad pad", "eng", 37),
    ("a5", "gamma pad pad pad pad", "eng", 5),
    ("a6", "delta pad pad pad pad", "eng", 99),
]
QUERIES = [("q1", "alpha beta"), ("q2", "gamma")]
# bag-of-words match sets
WANT = {"q1": {"a1", "a2", "a3", "a4"}, "q2": {"a3", "a5"}}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aggs") / "idx")
    df = spark.createDataFrame([d[:3] for d in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    return path


@pytest.fixture(scope="module")
def fields(spark):
    return spark.createDataFrame([(d[0], d[3]) for d in DOCS],
                                 "doc_id string, n long")


@pytest.fixture(scope="module")
def matches(spark, idx):
    m = match_set_texts(spark, idx, QUERIES, text_cfg=RAW)
    m.cache().count()
    return m


def test_match_set_identity_with_search(spark, idx, matches):
    """matches_only ≡ search with k ≥ corpus: same docs, same scores."""
    exhaustive = search_texts(spark, idx, QUERIES, RetrieveConfig(k=100),
                              text_cfg=RAW)
    want = {(r["query_id"], r["doc_id"]): r["score"]
            for r in exhaustive.collect()}
    got = {(r["query_id"], r["doc_id"]): r["score"]
           for r in matches.collect()}
    assert got.keys() == want.keys()
    for key, s in got.items():
        assert math.isclose(s, want[key], rel_tol=1e-12)
    by_q = {}
    for (q, d) in got:
        by_q.setdefault(q, set()).add(d)
    assert by_q == WANT


def test_sort_by_field(spark, matches, fields):
    out = sort_by_field(matches, fields, "n", k=3)
    rows = [(r["query_id"], r["rank"], r["doc_id"], r["n"])
            for r in out.collect()]
    # q1 by n desc, doc_id asc tie-break: a2(37) < a4(37) lex; then a3(23)
    assert rows == [
        ("q1", 0, "a2", 37), ("q1", 1, "a4", 37), ("q1", 2, "a3", 23),
        ("q2", 0, "a3", 23), ("q2", 1, "a5", 5),
    ]
    up = sort_by_field(matches, fields, "n", k=1, ascending=True)
    assert [(r["query_id"], r["doc_id"]) for r in up.collect()] == [
        ("q1", "a1"), ("q2", "a5")]


def test_field_stats(spark, matches, fields):
    out = {r["query_id"]: r for r in
           field_stats(matches, fields, "n").collect()}
    n = {d[0]: d[3] for d in DOCS}
    for q, docs in WANT.items():
        vals = sorted(n[d] for d in docs)
        r = out[q]
        assert (r["cnt"], r["min_v"], r["max_v"], r["sum_v"]) == \
            (len(vals), vals[0], vals[-1], sum(vals))
        assert math.isclose(r["avg_v"], sum(vals) / len(vals))


def test_field_histogram(spark, matches, fields):
    out = {(r["query_id"], r["bucket"]): r["cnt"] for r in
           field_histogram(matches, fields, "n", interval=10).collect()}
    # q1: 11→10, 37→30, 23→20, 37→30 ; q2: 23→20, 5→0
    assert out == {("q1", 10.0): 1, ("q1", 30.0): 2, ("q1", 20.0): 1,
                   ("q2", 20.0): 1, ("q2", 0.0): 1}


def test_significant_terms(spark, idx, matches):
    """JLH scores against brute-force Python over the same corpus."""
    from patapsco_spark.operators.aggs import significant_terms

    store = spark.createDataFrame([d[:2] for d in DOCS],
                                  "id string, text string")
    out = significant_terms(spark, idx, matches, store, text_cfg=RAW,
                            k=5, min_doc_count=1, lang_col=None)
    got = {(r["query_id"], r["term"]): (r["fg_cnt"], r["bg_df"], r["score"])
           for r in out.collect()}

    toks = {d[0]: set(d[1].split()) for d in DOCS}
    n = float(len(DOCS))
    for q, fg_docs in WANT.items():
        fgt = float(len(fg_docs))
        for term in {t for d in fg_docs for t in toks[d]}:
            fg = sum(1 for d in fg_docs if term in toks[d])
            bg = sum(1 for d in toks if term in toks[d])
            fr, br = fg / fgt, bg / n
            score = (fr - br) * (fr / br)
            if score > 0 and (q, term) in got:
                g = got[(q, term)]
                assert g[0] == fg and g[1] == bg
                assert math.isclose(g[2], score, abs_tol=5e-7)
    # the query's own terms rank as significant for their own match set
    assert any(t == "alpha" for (q, t) in got if q == "q1")
    assert any(t == "gamma" for (q, t) in got if q == "q2")


def test_matches_only_excludes_pruner_and_rank(spark, idx, matches):
    assert set(matches.columns) == {"query_id", "doc_id", "docid", "score"}


def test_matches_only_plan_has_no_broadcast_of_match_side(spark, idx):
    """The matches_only id-resolution join must NOT broadcast the match
    side (it is unbounded at scale) — the k-bounded search path does, this
    path must stay a shuffle join. Guard: no BroadcastExchange/
    BroadcastHashJoin in the pre-AQE optimized plan (AQE may still choose
    one at runtime from observed sizes — that is the point of AQE)."""
    import io
    from contextlib import redirect_stdout

    m = match_set_texts(spark, idx, QUERIES, text_cfg=RAW)
    buf = io.StringIO()
    with redirect_stdout(buf):
        m.explain("formatted")
    assert "BroadcastExchange" not in buf.getvalue()


def test_count_only_consistency(spark, idx, matches):
    from patapsco_spark.operators.retrieve import process_queries, search
    plans = process_queries(QUERIES, RAW)
    counts = {r["query_id"]: r["total_hits"] for r in
              search(spark, idx, plans, count_only=True).collect()}
    sizes = {q: len(d) for q, d in WANT.items()}
    assert counts == sizes


def test_field_percentiles(spark, matches, fields):
    from patapsco_spark.operators.aggs import field_percentiles
    rows = field_percentiles(matches, fields, "n", [0.25, 0.5, 1.0]).collect()
    got = {(r["query_id"], r["p"]): r["value"] for r in rows}
    # q1 matches a1..a4 → n ∈ {11, 37, 23, 37} sorted [11,23,37,37]
    # percentile_disc = smallest v with cume_dist ≥ p
    assert got == {("q1", 0.25): 11.0, ("q1", 0.5): 23.0, ("q1", 1.0): 37.0,
                   ("q2", 0.25): 5.0, ("q2", 0.5): 5.0, ("q2", 1.0): 23.0}


def test_field_cardinality_exact_and_sketch(spark, matches, fields):
    import hashlib

    from patapsco_spark.operators.aggs import field_cardinality
    # exact path: fewer distinct values than k
    rows = field_cardinality(matches, fields, "n", k=16).collect()
    got = {r["query_id"]: (r["est"], r["is_exact"]) for r in rows}
    assert got == {"q1": (3.0, True), "q2": (2.0, True)}  # {11,23,37}, {5,23}
    # sketch path: k=2 < distinct → est = (k-1)/h_(k) over md5-unit hashes
    rows = field_cardinality(matches, fields, "n", k=2).collect()
    hs = sorted(int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                / float(16 ** 15) for v in (11, 23, 37))
    want_q1 = 1.0 / hs[1]
    got = {r["query_id"]: (r["est"], r["is_exact"]) for r in rows}
    assert got["q1"][1] is False
    assert abs(got["q1"][0] - want_q1) < 1e-12


def test_adjacency_matrix(spark, idx):
    """ES adjacency_matrix: per-filter and pairwise intersection counts
    over single-term filters, vs a brute Python reference over DOCS."""
    from itertools import combinations

    from patapsco_spark.operators.aggs import adjacency_matrix

    filters = ["alpha", "beta", "gamma"]
    m = match_set_texts(spark, idx, [(t, t) for t in filters], text_cfg=RAW)
    got = {r["key"]: r["doc_count"]
           for r in adjacency_matrix(m).collect()}
    sets = {t: {d[0] for d in DOCS if t in d[1].split()} for t in filters}
    want = {t: len(s) for t, s in sets.items() if s}
    for a, b in combinations(sorted(filters), 2):
        n = len(sets[a] & sets[b])
        if n:
            want[f"{a}&{b}"] = n
    assert got == want
    # empty intersection omitted: no doc holds both beta and gamma... check
    assert ("beta&gamma" in got) == bool(sets["beta"] & sets["gamma"])


def test_adjacency_matrix_filter_cap(spark, idx):
    from patapsco_spark.operators.aggs import adjacency_matrix

    m = match_set_texts(spark, idx, [(t, t) for t in ("alpha", "beta")],
                        text_cfg=RAW)
    with pytest.raises(Exception, match="adjacency_matrix"):
        adjacency_matrix(m, max_filters=1).collect()


def _brute_sample(matches_rows, dps, shard_size, values=None, cap=None):
    """Reference: the two-stage score-greedy spec over collected rows."""
    from collections import defaultdict

    by_qs = defaultdict(list)
    for r in matches_rows:
        by_qs[(r["query_id"], int(r["docid"]) // dps)].append(r)
    keep = set()
    for (q, s), rows in by_qs.items():
        rows = sorted(rows, key=lambda r: (-r["score"], r["docid"]))
        if values is not None:
            seen, survivors = defaultdict(int), []
            for r in rows:
                v = values.get(r["doc_id"])
                if v is None:
                    survivors.append(r)
                    continue
                seen[v] += 1
                if seen[v] <= cap:
                    survivors.append(r)
            rows = survivors
        keep |= {(q, r["doc_id"]) for r in rows[:shard_size]}
    return keep


def test_sampler_per_shard(spark, idx, matches):
    from patapsco_spark.operators.aggs import sampler
    from patapsco_spark.operators.retrieve import load_index_meta

    dps = int(load_index_meta(idx)["docs_per_shard"])
    rows = matches.collect()
    got = {(r["query_id"], r["doc_id"])
           for r in sampler(matches, shard_size=2,
                            docs_per_shard=dps).collect()}
    assert got == _brute_sample(rows, dps, 2)
    with pytest.raises(ValueError, match="shard_size"):
        sampler(matches, shard_size=0, docs_per_shard=dps)


def test_diversified_sampler(spark, idx, matches, fields):
    """Diversity cap: at most 1 doc per n-value per (query, shard), then
    the per-shard cut — vs the brute two-stage spec. n=37 is shared by
    a2/a4 (q1): only the better-scoring one may survive per shard."""
    from patapsco_spark.operators.aggs import diversified_sampler
    from patapsco_spark.operators.retrieve import load_index_meta

    dps = int(load_index_meta(idx)["docs_per_shard"])
    rows = matches.collect()
    vals = {d[0]: d[3] for d in DOCS}
    got = {(r["query_id"], r["doc_id"])
           for r in diversified_sampler(
               matches, fields, "n", shard_size=3, docs_per_shard=dps,
               max_docs_per_value=1).collect()}
    assert got == _brute_sample(rows, dps, 3, values=vals, cap=1)
    with pytest.raises(ValueError, match="max_docs_per_value"):
        diversified_sampler(matches, fields, "n", shard_size=3,
                            docs_per_shard=dps, max_docs_per_value=0)
