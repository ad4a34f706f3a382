"""Temperature mixing (operators/sampling.py): fraction math against a
hand construction, α=1 reduction to proportional rates, cap at 1.0 for
rare strata, nesting under budget growth, and validation."""

import pytest

from patapsco_spark.operators.sampling import (temperature_fractions,
                                               temperature_sample)


@pytest.fixture(scope="module")
def docs(spark):
    rows = ([(f"a{i}", "en") for i in range(80)]
            + [(f"b{i}", "de") for i in range(16)]
            + [(f"c{i}", "yo") for i in range(4)])
    return spark.createDataFrame(rows, "doc_id string, lang string")


def test_fractions_match_hand_math(spark, docs):
    fr = temperature_fractions(docs, "lang", alpha=0.5, budget_rows=50)
    n = 100
    w = {"de": (16 / n) ** 0.5, "en": (80 / n) ** 0.5, "yo": (4 / n) ** 0.5}
    z = w["de"] + w["en"] + w["yo"]  # sorted-stratum fold order
    for s in w:
        want = min(1.0, 50 * w[s] / z / {"en": 80, "de": 16, "yo": 4}[s])
        assert fr[s] == want, s
    # α<1 upsamples rare strata: yo's keep RATE exceeds en's
    assert fr["yo"] > fr["de"] > fr["en"]


def test_alpha_one_is_proportional(spark, docs):
    fr = temperature_fractions(docs, "lang", alpha=1.0, budget_rows=50)
    # p_s = n_s/N ⇒ every stratum keeps the same budget/N fraction
    assert fr["en"] == pytest.approx(0.5)
    assert fr["de"] == pytest.approx(0.5)
    assert fr["yo"] == pytest.approx(0.5)


def test_cap_and_underfill(spark, docs):
    # huge budget: every fraction caps at 1.0 — sample = whole corpus
    fr = temperature_fractions(docs, "lang", alpha=0.5, budget_rows=10_000)
    assert set(fr.values()) == {1.0}
    out = temperature_sample(docs, "lang", "doc_id", alpha=0.5,
                             budget_rows=10_000)
    assert out.count() == 100


def test_nested_under_budget_growth(spark, docs):
    small = {r["doc_id"] for r in temperature_sample(
        docs, "lang", "doc_id", alpha=0.5, budget_rows=30).collect()}
    big = {r["doc_id"] for r in temperature_sample(
        docs, "lang", "doc_id", alpha=0.5, budget_rows=60).collect()}
    assert small <= big  # same salt, larger fractions ⇒ superset


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="alpha"):
        temperature_fractions(docs, "lang", alpha=0.0, budget_rows=10)
    with pytest.raises(ValueError, match="budget_rows"):
        temperature_fractions(docs, "lang", alpha=0.5, budget_rows=-1)
    empty = docs.where("lang IS NULL")
    assert temperature_fractions(empty, "lang", alpha=0.5,
                                 budget_rows=10) == {}
