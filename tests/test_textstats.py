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


class TestLanguageIdMulti:
    def test_script_and_stopword_routing(self, spark):
        from patapsco_spark.operators.textstats import language_id_multi
        docs = spark.createDataFrame([
            (1, "the quick brown fox is on the hill and it is quiet there"),
            (2, "el perro y el gato están en la casa de la abuela con los niños"),
            (3, "yang ini adalah rumah besar dan kami akan pergi ke pasar itu"),
            (4, "这是一个非常大的房子我们今天去市场买东西然后回家吃饭"),
            (5, "오늘은 날씨가 좋아서 우리는 공원에 갔다가 집으로 돌아왔다"),
            (6, "זה בית גדול מאוד ואנחנו הולכים לשוק היום עם המשפחה שלנו"),
            (7, "это очень большой дом и мы сегодня идем на рынок за продуктами"),
            (8, "هذا بيت كبير جدا ونحن ذاهبون الى السوق اليوم مع كل العائلة"),
            (9, "این خانه بسیار بزرگ است و ما امروز با خانواده به بازار می رویم"),
            (10, "zzz qqq xxx vvv kkk jjj www yyy hhh ggg fff ddd sss aaa"),
        ], "doc_id long, text string")
        got = {r["doc_id"]: r["lang_guess"]
               for r in language_id_multi(docs).collect()}
        assert got == {1: "eng", 2: "spa", 3: "ind", 4: "zho", 5: "kor",
                       6: "heb", 7: "rus", 8: "ara", 9: "fas", 10: "und"}
