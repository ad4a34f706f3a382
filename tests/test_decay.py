"""Function-score decay (Elasticsearch decay-function semantics): factor 1
at origin, exactly `decay` at distance `scale`; multiply/sum blends over the
text-score cascade; missing fields take factor 1.0."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.functions.smallfloat import quantize_length
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import (decay_factor, process_queries,
                                               search_with_decay)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "car pad pad pad"),
    ("d2", "car car pad pad"),
    ("d3", "car pad pad pad pad"),
    ("d4", "pad pad pad pad"),
]
AGES = {"d1": 180.0, "d2": 10.0, "d3": 0.0}  # d4 missing → factor 1.0
K1, B = 0.9, 0.4
SCALE, DECAY = 90.0, 0.5


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("decay") / "idx")
    df = spark.createDataFrame([(i, t, "eng") for i, t in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


@pytest.fixture(scope="module")
def ages(spark):
    return spark.createDataFrame(list(AGES.items()),
                                 "doc_id string, age double")


def _bm25(tf, df, dl, n, avgdl):
    import numpy as np
    dlq = float(quantize_length(np.array([dl], dtype="int64"))[0])
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + K1 * (1 - B + B * dlq / avgdl))


def _gauss(d):
    sigma2 = -(SCALE * SCALE) / (2.0 * math.log(DECAY))
    return math.exp(-(d * d) / (2.0 * sigma2))


def _text_scores():
    import numpy as np
    n = len(DOCS)
    avgdl = float(np.float32(sum(len(t.split()) for _, t in DOCS) / n))
    return {"d1": _bm25(1, 3, 4, n, avgdl),
            "d2": _bm25(2, 3, 4, n, avgdl),
            "d3": _bm25(1, 3, 5, n, avgdl)}


def _run(spark, idx, ages, **kw):
    plans = process_queries([("q1", "car")], RAW, lang="eng")
    res = search_with_decay(spark, idx, plans, ages,
                            RetrieveConfig(k=10, k1=K1, b=B),
                            origin=0.0, scale=SCALE, decay=DECAY,
                            field_col="age", **kw)
    return {r["doc_id"]: r["score"] for r in res.collect()}


def test_gauss_multiply_golden(spark, idx, ages):
    got = _run(spark, idx, ages, shape="gauss", mode="multiply")
    text = _text_scores()
    want = {d: s * _gauss(AGES[d]) for d, s in text.items()}
    assert got.keys() == want.keys()
    for d in want:
        assert math.isclose(got[d], want[d], rel_tol=1e-12), d


def test_decay_at_scale_is_decay(spark, idx, ages):
    """The defining identity: factor(scale) == decay, for every shape."""
    for shape in ("gauss", "exp", "linear"):
        got = _run(spark, idx, ages, shape=shape, mode="sum", weight=1.0)
        text = _text_scores()
        # d1 sits exactly at... no: d1 age 180 = 2*scale; use identity math
        f = {"gauss": _gauss, "exp":
             lambda d: math.exp(d * math.log(DECAY) / SCALE),
             "linear": lambda d: max(0.0, 1.0 - d * (1 - DECAY) / SCALE)}[shape]
        assert math.isclose(f(SCALE), DECAY, rel_tol=1e-12), shape
        want = {d: s + f(AGES[d]) for d, s in text.items()}
        for d in want:
            assert math.isclose(got[d], want[d], rel_tol=1e-12), (shape, d)


def test_missing_field_factor_one(spark, idx, ages):
    """'pad' matches d4 too; d4 has no age row → factor 1.0 (ES missing-
    field behavior), so its multiply-blended score equals its text score."""
    plans = process_queries([("q1", "pad")], RAW, lang="eng")
    blended = search_with_decay(spark, idx, plans, ages,
                                RetrieveConfig(k=10, k1=K1, b=B),
                                origin=0.0, scale=SCALE, decay=DECAY,
                                field_col="age")
    from patapsco_spark.operators.retrieve import search
    text = search(spark, idx, plans, RetrieveConfig(k=10, k1=K1, b=B))
    b = {r["doc_id"]: r["score"] for r in blended.collect()}
    t = {r["doc_id"]: r["score"] for r in text.collect()}
    assert math.isclose(b["d4"], t["d4"], rel_tol=1e-12)
    assert b["d1"] < t["d1"]  # aged doc really shrank


def test_depth_cut_is_by_text_score(spark, idx, ages):
    """rescore_depth=2 keeps only the top-2 TEXT candidates; the fresher
    but lower-text d3 cannot enter, even though its blended score would
    beat d1's heavily decayed one."""
    plans = process_queries([("q1", "car")], RAW, lang="eng")
    res = search_with_decay(spark, idx, plans, ages,
                            RetrieveConfig(k=2, k1=K1, b=B),
                            origin=0.0, scale=SCALE, decay=DECAY,
                            field_col="age", rescore_depth=2)
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    text = _text_scores()
    top2 = sorted(text, key=lambda d: -text[d])[:2]
    assert set(got) == set(top2)


def test_bad_args_raise(spark, idx, ages):
    for kw in ({"decay": 1.0}, {"decay": 0.0}, {"scale": 0.0}):
        with pytest.raises(ValueError):
            decay_factor("x", origin=0.0,
                         **{"scale": SCALE, "decay": DECAY, **kw})
    with pytest.raises(ValueError):
        _run(spark, idx, ages, shape="cosine")
    with pytest.raises(ValueError):
        _run(spark, idx, ages, mode="max")
