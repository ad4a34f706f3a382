"""Ordered minimal intervals over the positions sidecar (Lucene
IntervalQuery: Intervals.maxgaps(g, Intervals.ordered(a, b)) with an
optional Intervals.notContaining exclusion). Semantics source of truth:
queryparse.Clause.gaps — tf counts MINIMAL intervals, the exact count the
sloppy-phrase docs note as Lucene's, so this family complements the
engine's anchored-greedy '"a b"~N'.
"""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import ParseError, interval_plan
from patapsco_spark.operators.retrieve import search

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "red fox jumps high today", "eng"),   # adjacent, ordered
    ("d2", "fox red jumps high today", "eng"),   # REVERSED — must not match
    ("d3", "red red fox jumps today", "eng"),    # minimality: ONE interval
    ("d4", "red wind fox jumps today", "eng"),   # 1 gap
    ("d5", "red bad fox jumps today", "eng"),    # 1 gap, 'bad' inside
    ("d6", "red fox red fox jumps", "eng"),      # two minimal intervals
    ("d7", "nothing relevant here at all", "eng"),
]
N = len(DOCS)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxintv"))
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path,
                IndexConfig(text=RAW, num_shards=2, positions=True))
    return path


def _run(spark, idx_path, plan, **cfg):
    res = search(spark, idx_path, [plan], RetrieveConfig(k=10, **cfg))
    return {r["doc_id"]: r["score"] for r in res.collect()}


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _count(text, a, b, g, x=None):
    """Reference minimal-interval counter: plain Python over the tokens."""
    toks = text.split()
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    pxs = [i for i, t in enumerate(toks) if x is not None and t == x]
    n = 0
    for p in pa:
        nxt = [q for q in pb if q > p]
        if not nxt:
            continue
        q = min(nxt)
        if q - p - 1 > g:
            continue
        if any(p < p2 < q for p2 in pa):
            continue  # not minimal: a later first-word starts a tighter one
        if any(p <= xx <= q for xx in pxs):
            continue
        n += 1
    return n


def test_ordered_only_and_gap_cap(spark, idx):
    rows = _run(spark, idx, interval_plan("q", [("red", "fox", 0)]))
    # d2 reversed and d4/d5 have a gap — only adjacent ordered pairs match
    assert set(rows) == {"d1", "d3", "d6"}
    rows1 = _run(spark, idx, interval_plan("q", [("red", "fox", 1)]))
    assert set(rows1) == {"d1", "d3", "d4", "d5", "d6"}


def test_minimality_and_tf(spark, idx):
    """d3's 'red red fox' holds ONE minimal interval (the inner red..fox);
    d6 holds two. Scores follow the hand BM25 with idf(red)+idf(fox)."""
    rows = _run(spark, idx, interval_plan("q", [("red", "fox", 0)]))
    df_red = sum(1 for d in DOCS if "red" in d[1].split())
    df_fox = sum(1 for d in DOCS if "fox" in d[1].split())
    idf = _idf(N, df_red) + _idf(N, df_fox)

    def bm25(tf):  # every doc dl=5=avgdl → K = k1 = 0.9
        return idf * tf / (tf + 0.9)

    for did, text in (("d1", DOCS[0][1]), ("d3", DOCS[2][1]),
                      ("d6", DOCS[5][1])):
        tf = _count(text, "red", "fox", 0)
        assert rows[did] == pytest.approx(bm25(tf), rel=1e-9), did
    assert _count(DOCS[2][1], "red", "fox", 0) == 1  # minimality pinned
    assert _count(DOCS[5][1], "red", "fox", 0) == 2


def test_not_containing(spark, idx):
    """Excluding 'bad' drops d5 (bad sits inside its only interval) but
    keeps d4 (wind is not the exclusion term)."""
    rows = _run(spark, idx,
                interval_plan("q", [("red", "fox", 1, "bad")]))
    assert set(rows) == {"d1", "d3", "d4", "d6"}
    # weight is idf(red)+idf(fox) — the exclusion term contributes none:
    # scores for surviving docs match the exclusion-free run's
    base = _run(spark, idx, interval_plan("q", [("red", "fox", 1)]))
    for did in rows:
        assert rows[did] == pytest.approx(base[did], rel=1e-12)


def test_qld_scores_pseudo_stats(spark, idx):
    rows = _run(spark, idx, interval_plan("q", [("red", "fox", 1)]),
                name="qld", mu=1000.0)
    assert set(rows) == {"d1", "d3", "d4", "d5", "d6"}
    # qld scores the pseudo-term's own (df, cf) through the engine's
    # LMDirichlet (+1-smoothed p(t|C), clamped ≥ 0): hand-check d6 (tf=2)
    cf = sum(_count(d[1], "red", "fox", 1) for d in DOCS)
    total_tf = sum(len(d[1].split()) for d in DOCS)
    mu, dl = 1000.0, 5
    pc = (cf + 1.0) / (total_tf + 1.0)
    want_d6 = max(0.0, math.log(1.0 + 2 / (mu * pc))
                  + math.log(mu / (dl + mu)))
    assert rows["d6"] == pytest.approx(want_d6, rel=1e-9)


def test_mixed_with_plain_terms(spark, idx):
    rows = _run(spark, idx, interval_plan(
        "q", [("red", "fox", 0)], extra_terms=["today"]))
    # d4/d5 match only 'today'; d7 matches nothing
    assert "d4" in rows and "d7" not in rows
    only_term = _run(spark, idx, interval_plan("q", [], ["today"]))
    assert rows["d4"] == pytest.approx(only_term["d4"], rel=1e-12)


def test_validation(spark, idx):
    with pytest.raises(ParseError, match="distinct"):
        interval_plan("q", [("red", "red", 1)])
    with pytest.raises(ParseError, match="collides"):
        interval_plan("q", [("red", "fox", 1, "fox")])
    with pytest.raises(ParseError, match="max_gaps"):
        interval_plan("q", [("red", "fox", -1)])
    with pytest.raises(ParseError, match="single terms"):
        interval_plan("q", [("red fox", "fox", 1)])
    with pytest.raises(ParseError, match="spec"):
        interval_plan("q", [("red",)])


def test_positionless_index_refuses(spark, tmp_path):
    path = str(tmp_path / "nopos")
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=1))
    with pytest.raises(ValueError, match="positions sidecar"):
        _run(spark, path, interval_plan("q", [("red", "fox", 0)]))


def test_unsupported_scorer_refuses(spark, idx):
    with pytest.raises(ValueError, match="not implemented for scorer"):
        _run(spark, idx, interval_plan("q", [("red", "fox", 0)]),
             name="classic")


def test_containing_required(spark, idx):
    """containing='wind': only intervals holding a 'wind' occurrence
    survive — d4 alone ('red wind fox'); weight stays idf(red)+idf(fox)."""
    from patapsco_spark.operators.queryparse import interval_plan as ip
    rows = _run(spark, idx, ip("q", [("red", "fox", 1)],
                               containing="wind"))
    assert set(rows) == {"d4"}
    base = _run(spark, idx, ip("q", [("red", "fox", 1)]))
    assert rows["d4"] == pytest.approx(base["d4"], rel=1e-12)


def test_containing_and_not_containing_compose(spark, idx):
    from patapsco_spark.operators.queryparse import interval_plan as ip
    # containing 'bad' keeps only d5's interval; excluding 'bad' at the
    # same time is refused at plan build
    rows = _run(spark, idx, ip("q", [("red", "fox", 1)], containing="bad"))
    assert set(rows) == {"d5"}
    with pytest.raises(ParseError, match="both"):
        ip("q", [("red", "fox", 1, "bad")], containing="bad")


def _count_n(text, words, g, x=None):
    """Reference n-term minimal-interval counter (greedy chains)."""
    toks = text.split()
    pos = {w: [i for i, t in enumerate(toks) if t == w]
           for w in set(words) | ({x} if x else set())}

    def chain(p):
        acc = p
        for w in words[1:]:
            nxt = [j for j in pos[w] if j > acc]
            if not nxt:
                return None
            acc = min(nxt)
        return acc

    n = 0
    pa = pos[words[0]]
    for p in pa:
        q = chain(p)
        if q is None or q - p - (len(words) - 1) > g:
            continue
        if any(p2 > p and chain(p2) == q for p2 in pa):
            continue  # a later start reaches the same end: not minimal
        if x and any(p <= xx <= q for xx in pos[x]):
            continue
        n += 1
    return n


NDOCS = [
    ("n1", "big red fox runs fast away", "eng"),     # exact chain
    ("n2", "big fox red runs fast away", "eng"),     # order broken
    ("n3", "big red big red fox runs", "eng"),       # nested starts
    ("n4", "big pad red pad fox runs", "eng"),       # 2 gaps
    ("n5", "big red fox big red fox", "eng"),        # two chains
    ("n6", "red fox runs pad pad pad", "eng"),       # missing first word
]


@pytest.fixture(scope="module")
def nidx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxintvn"))
    df = spark.createDataFrame(NDOCS, "id string, text string, lang string")
    build_index(spark, df, path,
                IndexConfig(text=RAW, num_shards=2, positions=True))
    return path


@pytest.mark.parametrize("g", [0, 2])
def test_three_term_ordered_chain(spark, nidx, g):
    words = ["big", "red", "fox"]
    rows = _run(spark, nidx, interval_plan("q", [(words, g)]))
    want_tf = {d[0]: _count_n(d[1], words, g) for d in NDOCS}
    assert set(rows) == {d for d, tf in want_tf.items() if tf > 0}
    # scores: idf = Σ member idfs, every doc dl=6=avgdl → K = 0.9
    n = len(NDOCS)
    idf = sum(_idf(n, sum(1 for d in NDOCS if w in d[1].split()))
              for w in words)
    for did, s in rows.items():
        tf = want_tf[did]
        assert s == pytest.approx(idf * tf / (tf + 0.9), rel=1e-9), did


def test_three_term_minimality_pinned(spark, nidx):
    """n3 'big red big red fox' — chains from both 'big's end at the one
    'fox'; only the LATER start is minimal → tf must be 1 (at gap cap 2,
    admitting the inner chain big@2..fox@4)."""
    assert _count_n(NDOCS[2][1], ["big", "red", "fox"], 2) == 1
    rows = _run(spark, nidx,
                interval_plan("q", [(["big", "red", "fox"], 2)]))
    assert "n3" in rows


def test_repeated_word_list_form(spark, nidx):
    """'big … big' (repeats legal in the list form): n3 and n5 hold two
    'big's; minimal chains counted by the brute reference."""
    words = ["big", "big"]
    rows = _run(spark, nidx, interval_plan("q", [(words, 3)]))
    want = {d[0]: _count_n(d[1], words, 3) for d in NDOCS}
    assert set(rows) == {d for d, tf in want.items() if tf > 0}
    with pytest.raises(ParseError, match="list form"):
        interval_plan("q", [("big", "big", 3)])  # pair form still refuses
