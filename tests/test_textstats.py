"""Training-data text analysis operators (textstats) — edge cases the
corpus-level oracles can't hit (empty/short docs, tie-breaks)."""

import pytest

from patapsco_spark.operators import textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionStats:
    def test_known_values(self, spark):
        # "a b a b c": bigrams [a b, b a, a b, b c] → top "a b" cnt 2 →
        # frac 2*2/5 = 0.8; trigrams [a b a, b a b, a b c] all distinct → 0
        out = {r["doc_id"]: r for r in textstats.repetition_stats(
            _docs(spark, [(1, "a b a b c")])).collect()}
        r = out[1]
        assert r["top_bigram"] == "a b"
        assert r["top_bigram_frac"] == pytest.approx(0.8)
        assert r["dup_trigram_frac"] == 0.0

    def test_fully_repetitive_doc(self, spark):
        # "x x x x": bigrams all "x x" (3) → frac 3*2/4 = 1.5 capped? No —
        # Gopher reports raw coverage (can exceed 1 for overlapping grams);
        # trigrams: 2 occurrences, 1 distinct → dup frac 0.5
        r = textstats.repetition_stats(_docs(spark, [(1, "x x x x")])).first()
        assert r["top_bigram_frac"] == pytest.approx(1.5)
        assert r["dup_trigram_frac"] == pytest.approx(0.5)

    def test_short_docs_do_not_crash(self, spark):
        rows = {r["doc_id"]: r for r in textstats.repetition_stats(
            _docs(spark, [(1, ""), (2, "solo"), (3, "two words")])).collect()}
        assert rows[1]["top_bigram"] is None
        assert rows[1]["top_bigram_frac"] == 0.0
        assert rows[2]["top_bigram"] is None
        assert rows[3]["top_bigram"] == "two words"
        assert all(rows[i]["dup_trigram_frac"] == 0.0 for i in (1, 2, 3))

    def test_tie_breaks_lexicographic(self, spark):
        # "b c a d b c a d": "b c", "a d", "c a", "d b" — counts 2,2,1,1 →
        # tie between "a d" and "b c" → lexicographically smallest wins
        r = textstats.repetition_stats(_docs(spark, [(1, "b c a d b c a d")])).first()
        assert r["top_bigram"] == "a d"


class TestTopNgrams:
    def test_counts_and_order(self, spark):
        docs = _docs(spark, [(1, "a b a b"), (2, "a b c")])
        got = [(r["ngram"], r["cnt"]) for r in
               textstats.top_ngrams(docs, n=2, k=10).collect()]
        # "a b": 2 (doc1) + 1 (doc2) = 3; "b a": 1; "b c": 1 (ties → asc)
        assert got == [("a b", 3), ("b a", 1), ("b c", 1)]

    def test_trigram_mode_and_k(self, spark):
        docs = _docs(spark, [(1, "a b c d"), (2, "")])
        got = [(r["ngram"], r["cnt"]) for r in
               textstats.top_ngrams(docs, n=3, k=1).collect()]
        assert got == [("a b c", 1)]
