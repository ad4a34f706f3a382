"""Multinomial NB classifier (operators/textstats.py): hand-computed
log-odds on a tiny corpus (including OOV smoothing), sign sanity, and
degenerate-label validation."""

import math

import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators.textstats import nb_classifier_scores

# train: 2 positive docs of clean text, 2 negative docs of spam text
ROWS = [
    ("t1", "good clean text text", 1, 1),
    ("t2", "good clean words", 1, 1),
    ("t3", "spam spam buy", 0, 1),
    ("t4", "spam buy buy now", 0, 1),
    ("e1", "good text", 1, 0),          # eval: clean-looking
    ("e2", "buy spam novel", 0, 0),     # eval: spammy + one OOV term
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id string, text string, y int, tr int")


def _hand_log_odds():
    train = [(r[1].split(), bool(r[2])) for r in ROWS if r[3]]
    pos = [t for toks, y in train if y for t in toks]
    neg = [t for toks, y in train if not y for t in toks]
    vocab = set(pos) | set(neg)
    t1, t0, v = len(pos), len(neg), len(vocab)
    d1 = sum(1 for _, y in train if y)
    d0 = sum(1 for _, y in train if not y)
    prior = math.log(d1 / d0)
    kappa = math.log(1.0 / (t1 + v)) - math.log(1.0 / (t0 + v))

    def llr(t):
        if t not in vocab:
            return kappa
        return (math.log((pos.count(t) + 1.0) / (t1 + v))
                - math.log((neg.count(t) + 1.0) / (t0 + v)))

    out = {}
    for did, text, _, tr in ROWS:
        if tr:
            continue
        toks = text.split()
        s = 0.0
        for t in sorted(set(toks)):
            s += toks.count(t) * llr(t)
        out[did] = prior + s
    return out


def test_matches_hand_computation(spark, docs):
    res = nb_classifier_scores(docs, F.col("y") == 1, F.col("tr") == 1)
    got = {r["doc_id"]: r["log_odds"] for r in res.collect()}
    want = _hand_log_odds()
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12), d
    assert got["e1"] > 0 > got["e2"]  # clean scores positive, spam negative


def test_single_class_raises(spark, docs):
    with pytest.raises(ValueError, match="both classes"):
        nb_classifier_scores(docs, F.lit(True), F.col("tr") == 1)
