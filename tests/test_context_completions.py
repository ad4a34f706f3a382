"""Context-aware completions (operators/suggest.py): LM evidence beats
static frequency, hand-computed probabilities, and validation."""

import pytest

from patapsco_spark.config import IndexConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.suggest import suggest_completions_context

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

# 'story' is globally more frequent than 'stream', but after 'data' the
# corpus only ever says 'data stream' — context must flip the order.
TEXTS = [
    "data stream data stream",
    "story story story story story",
    "a story here",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(str(i), t) for i, t in enumerate(TEXTS)],
                                 "doc_id string, text string")


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ctx") / "idx")
    build_index(spark, corpus.selectExpr("doc_id as id", "text",
                                         "'eng' as lang"), p,
                IndexConfig(text=RAW, num_shards=2))
    return p


def test_context_flips_static_order(spark, idx, corpus):
    out = suggest_completions_context(spark, idx, "st", "data", corpus,
                                      k=5).collect()
    sugg = [r["suggestion"] for r in out]
    assert sugg == ["stream", "story"]  # static cf order would be reversed
    toks = " ".join(TEXTS).split()
    total = len(toks)
    pairs = []
    for t in TEXTS:
        ws = t.split()
        pairs += list(zip(ws, ws[1:]))
    p_stream = pairs.count(("data", "stream")) / toks.count("data")
    p_story = 0.4 * (toks.count("story") / total)  # unseen bigram backoff
    got = {r["suggestion"]: r["prob"] for r in out}
    assert got["stream"] == pytest.approx(p_stream, abs=1e-12)
    assert got["story"] == pytest.approx(p_story, abs=1e-12)


def test_validation(spark, idx, corpus):
    with pytest.raises(ValueError, match="prefix"):
        suggest_completions_context(spark, idx, "", "data", corpus)
    with pytest.raises(ValueError, match="context word"):
        suggest_completions_context(spark, idx, "st", "", corpus)
    assert suggest_completions_context(spark, idx, "zz", "data",
                                       corpus).count() == 0
