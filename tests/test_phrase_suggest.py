"""Phrase suggester (operators/suggest.py:suggest_phrase): hand-computed
stupid-backoff bigram scores, candidate generation with the original
token included at distance 0, the no-candidate fallback, and combo-cap
validation."""

import math

import pytest

from patapsco_spark.config import IndexConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.suggest import suggest_phrase

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

# corpus: "data stream" is a frequent bigram; "dump stream" never occurs
TEXTS = [
    "data stream data stream data stream",
    "data stream runs fast",
    "dump truck dump truck",
    "data dump data",
    "dumb dumb stream",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(str(i), t) for i, t in enumerate(TEXTS)],
                                 "doc_id string, text string")


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("psugg") / "idx")
    df = corpus.selectExpr("doc_id as id", "text", "'eng' as lang")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


def test_bigram_lm_ranks_seen_bigram_first(spark, idx, corpus):
    # "damp" → candidates {dump d=1, data d=2}; "stream" is itself indexed.
    out = suggest_phrase(spark, idx, "damp stream", corpus, k=4,
                         max_candidates=3, min_cf=1).collect()
    sugg = [r["suggestion"] for r in out]
    assert sugg[0] == "data stream"           # seen bigram wins
    assert "dump stream" in sugg              # unseen bigram backed off
    # hand-compute both scores
    toks = " ".join(TEXTS).split()
    total = len(toks)
    c1 = {w: toks.count(w) for w in set(toks)}
    bigrams = [(a, b) for t in TEXTS
               for a, b in zip(t.split(), t.split()[1:])]
    c2 = {}
    for ab in bigrams:
        c2[ab] = c2.get(ab, 0) + 1
    got = {r["suggestion"]: r["logp"] for r in out}
    want_seen = (math.log(c1["data"] / total)
                 + math.log(c2[("data", "stream")] / c1["data"]))
    want_backoff = (math.log(c1["dump"] / total)
                    + math.log(0.4 * (c1["stream"] / total)))
    assert got["data stream"] == pytest.approx(want_seen, abs=1e-12)
    assert got["dump stream"] == pytest.approx(want_backoff, abs=1e-12)


def test_original_token_kept_when_no_neighbour(spark, idx, corpus):
    # "zzzqqq" has no dictionary neighbour: position keeps the original
    out = suggest_phrase(spark, idx, "zzzqqq stream", corpus, k=1,
                         min_cf=1).collect()
    assert out[0]["suggestion"] == "zzzqqq stream"


def test_validation(spark, idx, corpus):
    with pytest.raises(ValueError, match="tokens"):
        suggest_phrase(spark, idx, "   ", corpus)
    with pytest.raises(ValueError, match="max_combos"):
        suggest_phrase(spark, idx, "dum dum dum dum", corpus,  # {dump,dumb}^4
                       max_candidates=3, min_cf=1, max_combos=10)
