"""Deterministic hash-threshold sampling (round 5): placement-independent
decisions, nested-sample property, stratified training-mix rates."""

import pytest

from patapsco_spark.operators.sampling import (deterministic_sample,
                                               stratified_sample)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else "de", f"text {i}") for i in range(600)],
        "doc_id long, lang string, text string")


class TestDeterministicSample:
    def test_rate_and_determinism(self, docs):
        kept = deterministic_sample(docs, 0.25, "doc_id")
        ids1 = {r["doc_id"] for r in kept.collect()}
        # md5 uniformity: 600 draws at 0.25 land well inside [0.13, 0.38]
        assert 80 <= len(ids1) <= 230
        ids2 = {r["doc_id"]
                for r in deterministic_sample(docs, 0.25, "doc_id").collect()}
        assert ids1 == ids2

    def test_partitioning_independent(self, docs):
        base = {r["doc_id"]
                for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
        reparted = {r["doc_id"]
                    for r in deterministic_sample(
                        docs.repartition(13, "lang"), 0.3,
                        "doc_id").collect()}
        assert base == reparted

    def test_nested_samples(self, docs):
        small = {r["doc_id"]
                 for r in deterministic_sample(docs, 0.1, "doc_id").collect()}
        large = {r["doc_id"]
                 for r in deterministic_sample(docs, 0.4, "doc_id").collect()}
        assert small <= large

    def test_salt_redraws(self, docs):
        a = {r["doc_id"]
             for r in deterministic_sample(docs, 0.3, "doc_id", "s0").collect()}
        b = {r["doc_id"]
             for r in deterministic_sample(docs, 0.3, "doc_id", "s1").collect()}
        assert a != b

    def test_bounds(self, docs):
        with pytest.raises(ValueError):
            deterministic_sample(docs, 1.5, "doc_id")
        assert deterministic_sample(docs, 0.0, "doc_id").count() == 0
        assert deterministic_sample(docs, 1.0, "doc_id").count() == 600


class TestStratifiedSample:
    def test_per_stratum_rates(self, docs):
        out = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.0},
                                key_col="doc_id")
        rows = out.collect()
        assert {r["lang"] for r in rows} == {"en"}
        assert len(rows) == 200  # every en row, no de rows

    def test_default_fraction_drops_unlisted(self, docs):
        out = stratified_sample(docs, "lang", {"en": 0.5}, key_col="doc_id")
        assert {r["lang"] for r in out.collect()} == {"en"}

    def test_matches_uniform_within_stratum(self, docs):
        # a stratum at fraction f must keep exactly the same keys as a
        # uniform sample at f over that stratum (same salt, same hash)
        strat = {r["doc_id"]
                 for r in stratified_sample(docs, "lang", {"de": 0.3},
                                            key_col="doc_id").collect()}
        uni = {r["doc_id"]
               for r in deterministic_sample(
                   docs.where("lang = 'de'"), 0.3, "doc_id").collect()}
        assert strat == uni


class TestNullKeys:
    def test_null_key_rows_not_silently_dropped(self, spark):
        # regression: md5(concat(salt, NULL)) is NULL and NULL < threshold
        # filters false, so NULL-key rows vanished even at fraction=1.0
        df = spark.createDataFrame(
            [(None, "a"), (None, "b"), (1, "c")],
            "doc_id long, text string")
        assert deterministic_sample(df, 1.0, "doc_id").count() == 3
        # all NULL keys share one decision (documented: they hash as '')
        kept = deterministic_sample(df, 0.5, "doc_id") \
            .where("doc_id IS NULL").count()
        assert kept in (0, 2)
