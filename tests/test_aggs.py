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


def test_extended_stats(spark, matches, fields):
    from patapsco_spark.operators.aggs import extended_stats
    rows = {r["query_id"]: r
            for r in extended_stats(matches, fields, "n",
                                    id_col="doc_id").collect()}
    for q, ids in WANT.items():
        vals = [n for d, _, _, n in DOCS if d in ids]
        n = len(vals)
        mean = sum(vals) / n
        var = sum(v * v for v in vals) / n - mean * mean
        r = rows[q]
        assert r["cnt"] == n
        assert r["min_v"] == min(vals) and r["max_v"] == max(vals)
        assert r["sum_v"] == sum(vals)
        assert r["sum_sq"] == sum(v * v for v in vals)
        assert r["avg_v"] == pytest.approx(mean, abs=1e-12)
        assert r["variance"] == pytest.approx(var, abs=1e-9)
        assert r["std_dev"] == pytest.approx(math.sqrt(var), abs=1e-9)
        assert r["std_upper"] == pytest.approx(mean + 2 * math.sqrt(var),
                                               abs=1e-9)
        assert r["std_lower"] == pytest.approx(mean - 2 * math.sqrt(var),
                                               abs=1e-9)


def test_matrix_stats(spark, matches, fields):
    from patapsco_spark.operators.aggs import matrix_stats
    # second field: doc length in tokens (5 for every doc here would make
    # var_b 0 and corr NaN — use per-doc distinct values instead)
    two = spark.createDataFrame(
        [(d, n, (i + 1) * 3) for i, (d, _, _, n) in enumerate(DOCS)],
        "doc_id string, a long, b long")
    rows = {r["query_id"]: r
            for r in matrix_stats(matches, two, "a", "b").collect()}
    bmap = {d: (i + 1) * 3 for i, (d, _, _, _) in enumerate(DOCS)}
    amap = {d: n for d, _, _, n in DOCS}
    for q, ids in WANT.items():
        a = [amap[d] for d in sorted(ids)]
        b = [bmap[d] for d in sorted(ids)]
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        va = sum(x * x for x in a) / n - ma * ma
        vb = sum(x * x for x in b) / n - mb * mb
        cov = sum(x * y for x, y in zip(a, b)) / n - ma * mb
        r = rows[q]
        assert r["cnt"] == n
        assert r["mean_a"] == pytest.approx(ma, abs=1e-12)
        assert r["mean_b"] == pytest.approx(mb, abs=1e-12)
        assert r["var_a"] == pytest.approx(va, abs=1e-9)
        assert r["var_b"] == pytest.approx(vb, abs=1e-9)
        assert r["covariance"] == pytest.approx(cov, abs=1e-9)
        assert r["correlation"] == pytest.approx(
            cov / math.sqrt(va * vb), abs=1e-9)


def test_weighted_avg(spark, matches, fields):
    from patapsco_spark.operators.aggs import weighted_avg
    w = spark.createDataFrame(
        [(d, n, len(t.split())) for d, t, _, n in DOCS],
        "doc_id string, v long, w long")
    rows = {r["query_id"]: r
            for r in weighted_avg(matches, w, "v", "w").collect()}
    vmap = {d: (n, len(t.split())) for d, t, _, n in DOCS}
    for q, ids in WANT.items():
        svw = sum(vmap[d][0] * vmap[d][1] for d in ids)
        sw = sum(vmap[d][1] for d in ids)
        assert rows[q]["sum_vw"] == svw
        assert rows[q]["sum_w"] == sw
        assert rows[q]["wavg"] == pytest.approx(svw / sw, abs=1e-12)


def test_weighted_avg_skips_null_sides(spark, matches):
    from patapsco_spark.operators.aggs import weighted_avg
    w = spark.createDataFrame(
        [("a1", 10, 2), ("a2", None, 3), ("a3", 7, None), ("a4", 4, 1)],
        "doc_id string, v long, w long")
    rows = {r["query_id"]: r
            for r in weighted_avg(matches, w, "v", "w").collect()}
    # q1 matches a1..a4 but a2 (null v) and a3 (null w) drop out
    assert rows["q1"]["sum_vw"] == 10 * 2 + 4 * 1
    assert rows["q1"]["sum_w"] == 3


def test_multi_terms(spark, matches):
    from patapsco_spark.operators.aggs import multi_terms
    kv = spark.createDataFrame(
        [("a1", "x", "p"), ("a2", "x", "p"), ("a3", "x", "q"),
         ("a4", "y", "p"), ("a5", "y", "q"), ("a6", "y", "q")],
        "doc_id string, k1 string, k2 string")
    got = [(r["query_id"], r["k1"], r["k2"], r["cnt"])
           for r in multi_terms(matches, kv, ["k1", "k2"],
                                size=2).collect()]
    # per-query buckets (one search context each):
    # q1 {a1,a2,a3,a4}: (x,p)=2, (x,q)=1, (y,p)=1 — size=2 keeps the
    # first two by (cnt desc, k1 asc, k2 asc)
    # q2 {a3,a5}: (x,q)=1, (y,q)=1
    assert got == [("q1", "x", "p", 2), ("q1", "x", "q", 1),
                   ("q2", "x", "q", 1), ("q2", "y", "q", 1)]
    with pytest.raises(ValueError, match="at least one key"):
        multi_terms(matches, kv, [], size=3)


def test_filters_agg(spark, matches, fields):
    from patapsco_spark.operators.aggs import filters_agg
    got = {(r["query_id"], r["bucket"]): r["cnt"]
           for r in filters_agg(matches, fields,
                                {"big": "n >= 30", "tiny": "n <= 11"},
                                other_bucket="other").collect()}
    # q1 = {a1:11, a2:37, a3:23, a4:37}, q2 = {a3:23, a5:5}
    assert got[("q1", "big")] == 2
    assert got[("q1", "tiny")] == 1
    assert got[("q1", "other")] == 1        # a3 (23) matches neither
    assert got[("q2", "big")] == 0
    assert got[("q2", "tiny")] == 1
    assert got[("q2", "other")] == 1
    with pytest.raises(ValueError, match="at least one named filter"):
        filters_agg(matches, fields, {})


def test_percentile_ranks(spark, matches, fields):
    from patapsco_spark.operators.aggs import percentile_ranks
    got = {(r["query_id"], r["value"]): r["pct"]
           for r in percentile_ranks(matches, fields, "n",
                                     [11.0, 30.0, 99.0]).collect()}
    # q1 values {11, 37, 23, 37}; q2 values {23, 5}
    assert got[("q1", 11.0)] == pytest.approx(25.0)
    assert got[("q1", 30.0)] == pytest.approx(50.0)
    assert got[("q1", 99.0)] == pytest.approx(100.0)
    assert got[("q2", 11.0)] == pytest.approx(50.0)
    assert got[("q2", 99.0)] == pytest.approx(100.0)
    with pytest.raises(ValueError, match="at least one value"):
        percentile_ranks(matches, fields, "n", [])


def test_range_agg(spark, matches, fields):
    from patapsco_spark.operators.aggs import range_agg
    got = {(r["query_id"], r["bucket"]): r["cnt"]
           for r in range_agg(matches, fields, "n",
                              [(None, 12.0), (12.0, 37.0),
                               (37.0, None)]).collect()}
    # from inclusive, to exclusive; q1 {11,37,23,37}: <12 → 1 (11),
    # [12,37) → 1 (23), >=37 → 2; q2 {23,5}: <12 → 1 (5), [12,37) → 1,
    # >=37 → 0 (bucket still present)
    assert got[("q1", "*-12.0")] == 1
    assert got[("q1", "12.0-37.0")] == 1
    assert got[("q1", "37.0-*")] == 2
    assert got[("q2", "37.0-*")] == 0
    assert len(got) == 6  # every bucket for every query, zeros included


def test_top_metrics(spark, matches, fields):
    from patapsco_spark.operators.aggs import top_metrics
    rows = [r for r in top_metrics(matches, fields, "n", ["n"], size=2)
            .collect() if r["query_id"] == "q1"]
    # q1 by n desc, doc_id asc: a2(37) before a4(37), then a3(23)
    assert [(r["pos"], r["doc_id"], r["n"]) for r in rows] == \
        [(1, "a2", 37), (2, "a4", 37)]
    asc = [r for r in top_metrics(matches, fields, "n", ["n"], size=1,
                                  descending=False).collect()
           if r["query_id"] == "q2"]
    assert [(r["doc_id"], r["n"]) for r in asc] == [("a5", 5)]


def test_value_count_missing(spark, matches):
    from patapsco_spark.operators.aggs import value_count
    partial = matches.sparkSession.createDataFrame(
        [("a1", 10), ("a2", None), ("a3", 7)], "doc_id string, v int")
    got = {r["query_id"]: r for r in
           value_count(matches, partial, "v").collect()}
    # q1 matches a1..a4: a1,a3 valued; a2 NULL; a4 absent (left join NULL)
    assert got["q1"]["value_cnt"] == 2
    assert got["q1"]["missing_cnt"] == 2
    # q2 matches a3,a5: a3 valued, a5 absent
    assert got["q2"]["value_cnt"] == 1
    assert got["q2"]["missing_cnt"] == 1
