"""Property-based adversarial coverage for the positional kernels —
exact phrases, ordered sloppy phrases, unordered NEAR, and NOT-NEAR —
against an independent brute-force reference over the raw token lists.

The corpus is fixed (one index build) and deliberately nasty: repeated
words, adjacent and reversed pairs, self-overlapping runs, words at doc
edges. Hypothesis drives the QUERY space (word pairs/triples × slops);
every example's full score set must equal the closed-form BM25 over the
brute-force tf, using the index's own collection stats.

The brute-force references implement the ENGINE'S DOCUMENTED semantics
(queryparse.Clause.slop / .near / .near_not), independently rewritten
from those docstrings — not copied from the kernel code.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import (span_near_plan,
                                                 span_not_plan)
from patapsco_spark.operators.retrieve import (load_index_meta, search,
                                               search_texts)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)
VOCAB = ["a", "b", "c", "d", "e"]

TEXTS = [
    "a b c d e",
    "e d c b a",
    "a a a b b",
    "a b a b a b",
    "c c c c c c c c",
    "a e e e e b",
    "b a",
    "a",
    "d e a b c a b",
    "b b b a",
    "a c b d a c b d",
    "e",
]
DOCS = [(f"d{i:02d}", t, "eng") for i, t in enumerate(TEXTS)]
TOKS = {f"d{i:02d}": t.split() for i, t in enumerate(TEXTS)}


@pytest.fixture(scope="module")
def prop_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxprop"))
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path,
                IndexConfig(text=RAW, num_shards=3, positions=True))
    meta = load_index_meta(path)
    return path, float(meta["avgdl"]), int(meta["num_docs"])


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _bm25(tf, dl, avgdl, idf, k1=0.9, b=0.4):
    return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def _df(word):
    return sum(1 for t in TOKS.values() if word in t)


def _phrase_tf(toks, words):
    n = len(words)
    return sum(1 for i in range(len(toks) - n + 1)
               if toks[i:i + n] == words)


def _sloppy_tf(toks, words, slop):
    # anchored-greedy, ordered (Clause.slop): from each first-word
    # occurrence, each next word chains to the EARLIEST position strictly
    # after the current link; the anchor matches iff the total width
    # excess is within slop
    pos = {w: [i for i, t in enumerate(toks) if t == w] for w in set(words)}
    count = 0
    for start in pos.get(words[0], []):
        cur, ok = start, True
        for w in words[1:]:
            nxt = [p for p in pos.get(w, []) if p > cur]
            if not nxt:
                ok = False
                break
            cur = min(nxt)
        if ok and (cur - start - (len(words) - 1)) <= slop:
            count += 1
    return count


def _near_tf(toks, a, b, slop, inv=False):
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    def hit(p):
        return any(abs(p - q) - 1 <= slop for q in pb)
    if inv:
        return sum(1 for p in pa if not hit(p))
    return sum(1 for p in pa if hit(p))


def _scores(res):
    return {r["doc_id"]: r["score"] for r in res.collect()}


SET = settings(max_examples=10, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


class TestPositionalProperties:
    @SET
    @given(words=st.lists(st.sampled_from(VOCAB), min_size=2, max_size=3),
           slop=st.integers(0, 3))
    def test_sloppy_phrase_matches_reference(self, spark, prop_index,
                                             words, slop):
        idx, avgdl, n = prop_index
        q = f'"{" ".join(words)}"~{slop}' if slop else \
            f'"{" ".join(words)}"'
        res = search_texts(spark, idx, [("q", q)], RetrieveConfig(k=50),
                           text_cfg=RAW, mode="boolean")
        got = _scores(res)
        # Σ member idfs over the word LIST (a repeated word counts twice,
        # the engine's phrase convention)
        idf = sum(_idf(n, _df(w)) for w in words if _df(w))
        want = {}
        for did, toks in TOKS.items():
            tf = (_sloppy_tf(toks, words, slop) if slop
                  else _phrase_tf(toks, words))
            if tf > 0:
                want[did] = _bm25(tf, len(toks), avgdl, idf)
        assert got.keys() == want.keys()
        for did in want:
            assert got[did] == pytest.approx(want[did], rel=1e-9), did

    @SET
    @given(pair=st.tuples(st.sampled_from(VOCAB), st.sampled_from(VOCAB)),
           slop=st.integers(0, 3), inv=st.booleans())
    def test_near_and_not_match_reference(self, spark, prop_index,
                                          pair, slop, inv):
        a, b = pair
        if a == b:
            return  # rejected by the engine, covered in test_span_near
        idx, avgdl, n = prop_index
        plan = (span_not_plan if inv else span_near_plan)(
            "q", [(a, b, slop)])
        got = _scores(search(spark, idx, [plan], RetrieveConfig(k=50)))
        idf = _idf(n, _df(a)) if inv else \
            sum(_idf(n, _df(w)) for w in (a, b) if _df(w))
        want = {}
        for did, toks in TOKS.items():
            tf = _near_tf(toks, a, b, slop, inv)
            if tf > 0:
                want[did] = _bm25(tf, len(toks), avgdl, idf)
        assert got.keys() == want.keys()
        for did in want:
            assert got[did] == pytest.approx(want[did], rel=1e-9), did
