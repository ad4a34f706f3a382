"""Property-based coverage for multi-term expansion — prefix wildcards,
general wildcards, fuzzy terms, and term ranges — against a brute-force
reference over the corpus dictionary.

Hypothesis drives the PATTERN space; the fixed corpus packs a dictionary
with shared prefixes, near-miss spellings (edit distance 1-2), and
lexicographic adjacency so every expansion kind has real work to do.
Expected semantics per the engine's documentation
(retrieve._expand_multiterm_plans): SCORING_BOOLEAN_REWRITE — the
expansion is a SHOULD group, each matched dictionary term scores plain
BM25 with its OWN df, a doc matches if it contains ≥ 1 expanded term.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import load_index_meta, search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

TEXTS = [
    "data date dart dare dog",
    "stream street strap straw",
    "cat car care cart",
    "data stream data street",
    "dog dot don dock",
    "care card cart cat cat",
    "dare dart data",
    "straw strap stream",
]
DOCS = [(f"d{i:02d}", t, "eng") for i, t in enumerate(TEXTS)]
TOKS = {f"d{i:02d}": t.split() for i, t in enumerate(TEXTS)}
DICT = sorted({w for t in TOKS.values() for w in t})


@pytest.fixture(scope="module")
def mt_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxmt"))
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    meta = load_index_meta(path)
    return path, float(meta["avgdl"]), int(meta["num_docs"])


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _df(word):
    return sum(1 for t in TOKS.values() if word in t)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expected(matched_terms, avgdl, n, k1=0.9, b=0.4):
    want = {}
    for did, toks in TOKS.items():
        dl = len(toks)
        score = 0.0
        for w in sorted(matched_terms):
            tf = toks.count(w)
            if tf:
                score += (_idf(n, _df(w)) * tf
                          / (tf + k1 * (1 - b + b * dl / avgdl)))
        if any(w in toks for w in matched_terms):
            want[did] = score
    return want


def _got(spark, idx, q):
    res = search_texts(spark, idx, [("q", q)], RetrieveConfig(k=50),
                       text_cfg=RAW, mode="boolean")
    return {r["doc_id"]: r["score"] for r in res.collect()}


def _check(spark, mt_index, q, matched):
    idx, avgdl, n = mt_index
    got = _got(spark, idx, q)
    want = _expected(matched, avgdl, n)
    assert got.keys() == want.keys(), (q, sorted(matched))
    for did in want:
        assert got[did] == pytest.approx(want[did], rel=1e-9), (q, did)


SET = settings(max_examples=10, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


class TestMultitermProperties:
    @SET
    @given(word=st.sampled_from(DICT), cut=st.integers(1, 4))
    def test_prefix_wildcard(self, spark, mt_index, word, cut):
        p = word[:cut]
        _check(spark, mt_index, f"{p}*",
               {w for w in DICT if w.startswith(p)})

    @SET
    @given(word=st.sampled_from([w for w in DICT if len(w) >= 3]),
           hole=st.integers(1, 2))
    def test_general_wildcard(self, spark, mt_index, word, hole):
        pat = word[:hole] + "?" + word[hole + 1:]
        matched = {w for w in DICT if len(w) == len(pat)
                   and all(pc in ("?", wc) for pc, wc in zip(pat, w))}
        _check(spark, mt_index, pat, matched)

    @SET
    @given(word=st.sampled_from(DICT), dist=st.integers(1, 2))
    def test_fuzzy(self, spark, mt_index, word, dist):
        _check(spark, mt_index, f"{word}~{dist}",
               {w for w in DICT if _lev(w, word) <= dist})

    @SET
    @given(i=st.integers(0, len(DICT) - 1), j=st.integers(0, len(DICT) - 1))
    def test_term_range(self, spark, mt_index, i, j):
        lo, hi = min(DICT[i], DICT[j]), max(DICT[i], DICT[j])
        _check(spark, mt_index, f"[{lo} TO {hi}]",
               {w for w in DICT if lo <= w <= hi})
