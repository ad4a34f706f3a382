"""ES rank_feature scoring functions (retrieve.feature_factor /
search_with_rank_feature): saturation/log/sigmoid/linear identities and
the never-penalizing additive blend."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import (feature_factor,
                                               process_queries, search,
                                               search_with_rank_feature)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [("d1", "car pad"), ("d2", "car pad pad"), ("d3", "pad pad")]
FEATS = {"d1": 2.0, "d2": 8.0}  # d3/d missing → contributes 0


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rf") / "idx")
    df = spark.createDataFrame([(i, t, "eng") for i, t in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=1))
    return p


def _factors(spark, **kw):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(k, v) for k, v in FEATS.items()],
                               "doc_id string, x double")
    out = df.select("doc_id", feature_factor(F.col("x"), **kw).alias("f"))
    return {r["doc_id"]: r["f"] for r in out.collect()}


def test_function_identities(spark):
    """saturation(pivot) = 0.5; sigmoid(pivot) = 0.5; log = ln(sf+x);
    linear = x."""
    sat = _factors(spark, fn="saturation", pivot=2.0)
    assert math.isclose(sat["d1"], 0.5, rel_tol=1e-12)
    assert math.isclose(sat["d2"], 0.8, rel_tol=1e-12)
    sig = _factors(spark, fn="sigmoid", pivot=2.0, exponent=3.0)
    assert math.isclose(sig["d1"], 0.5, rel_tol=1e-12)
    assert math.isclose(sig["d2"], 8.0**3 / (8.0**3 + 8.0), rel_tol=1e-12)
    lg = _factors(spark, fn="log", scaling_factor=1.0)
    assert math.isclose(lg["d2"], math.log(9.0), rel_tol=1e-12)
    lin = _factors(spark, fn="linear")
    assert lin == {"d1": 2.0, "d2": 8.0}


def test_bad_args(spark):
    for kw in ({"fn": "saturation"}, {"fn": "saturation", "pivot": 0.0},
               {"fn": "log"}, {"fn": "sigmoid", "pivot": 2.0},
               {"fn": "sigmoid", "pivot": 2.0, "exponent": 0.0},
               {"fn": "tanh"}):
        with pytest.raises(ValueError):
            _factors(spark, **kw)


def test_blend_never_penalizes(spark, idx):
    """Missing-feature docs keep their text score exactly; present docs
    gain boost·f(x)."""
    feats = spark.createDataFrame([(k, v) for k, v in FEATS.items()],
                                  "doc_id string, feature double")
    plans = process_queries([("q1", "pad")], RAW, lang="eng")
    cfg = RetrieveConfig(k=10)
    blended = {r["doc_id"]: r["score"]
               for r in search_with_rank_feature(
                   spark, idx, plans, feats, cfg, fn="saturation",
                   pivot=2.0, boost=1.5).collect()}
    text = {r["doc_id"]: r["score"]
            for r in search(spark, idx, plans, cfg).collect()}
    assert math.isclose(blended["d3"], text["d3"], rel_tol=1e-12)
    assert math.isclose(blended["d1"], text["d1"] + 1.5 * 0.5,
                        rel_tol=1e-12)
    assert math.isclose(blended["d2"], text["d2"] + 1.5 * 0.8,
                        rel_tol=1e-12)
