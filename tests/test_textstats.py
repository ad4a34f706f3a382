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


class TestUlmPerplexity:
    def test_pinned_small_corpus(self, spark):
        from patapsco_spark.operators.textstats import ulm_perplexity
        # corpus: a a a b  /  b c  /  (empty) → total 6 tokens
        # p(a)=3/6, p(b)=2/6, p(c)=1/6
        docs = spark.createDataFrame([
            (1, "a a a b"), (2, "b c"), (3, "   ")],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in ulm_perplexity(docs).collect()}
        import math
        nll = {"a": -math.log2(3 / 6), "b": -math.log2(2 / 6),
               "c": -math.log2(1 / 6)}
        ce1 = (3 * nll["a"] + nll["b"]) / 4
        ce2 = (nll["b"] + nll["c"]) / 2
        assert got[1]["n_tokens"] == 4
        assert abs(got[1]["cross_entropy"] - round(ce1, 6)) < 1e-9
        assert abs(got[1]["perplexity"] - round(2 ** ce1, 4)) < 1e-9
        assert got[2]["n_tokens"] == 2
        assert abs(got[2]["cross_entropy"] - round(ce2, 6)) < 1e-9
        # whitespace-only doc keeps its row with NULL scores
        assert got[3]["n_tokens"] == 0
        assert got[3]["cross_entropy"] is None
        assert got[3]["perplexity"] is None

    def test_boilerplate_scores_lower_than_rare_soup(self, spark):
        from patapsco_spark.operators.textstats import ulm_perplexity
        common = " ".join(["the quick brown fox"] * 5)
        docs = spark.createDataFrame(
            [(i, common) for i in range(1, 9)]
            + [(9, "zyx qwv jkl pqr")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["perplexity"]
               for r in ulm_perplexity(docs).collect()}
        assert got[9] > got[1]  # rare-token soup = high perplexity


class TestSbPerplexity:
    def test_pinned_self_lm(self, spark):
        """Self-corpus form (lm_docs=None): hand-checked trigram hits and
        doc-head positions at their own order unpenalized."""
        import math

        from patapsco_spark.operators.textstats import sb_perplexity
        # corpus: "a b c a b d" / "c b"  → total 8 tokens
        docs = spark.createDataFrame(
            [(1, "a b c a b d"), (2, "c b"), (3, None)],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in sb_perplexity(docs).collect()}
        c1 = {"a": 2, "b": 3, "c": 2, "d": 1}
        c2 = {("a", "b"): 2, ("b", "c"): 1, ("c", "a"): 1, ("b", "d"): 1,
              ("c", "b"): 1}
        c3 = {("a", "b", "c"): 1, ("b", "c", "a"): 1, ("c", "a", "b"): 1,
              ("a", "b", "d"): 1}
        tot, al = 8.0, 0.4
        uni = lambda w: c1[w] / tot
        bi = lambda a, b: (c2[(a, b)] / c1[a] if (a, b) in c2
                           else al * uni(b))
        tri = lambda a, b, c: (c3[(a, b, c)] / c2[(a, b)]
                               if (a, b, c) in c3 else al * bi(b, c))
        # doc 1: pos0 uni(a), pos1 bi(a,b), then trigram chain
        s1 = [uni("a"), bi("a", "b"), tri("a", "b", "c"), tri("b", "c", "a"),
              tri("c", "a", "b"), tri("a", "b", "d")]
        ce1 = -sum(math.log2(x) for x in s1) / len(s1)
        assert got[1]["n_tokens"] == 6
        assert abs(got[1]["sb_cross_entropy"] - round(ce1, 6)) < 1e-9
        # doc 2: uni(c), bi(c,b) — (c,b) seen, no penalty at doc head
        s2 = [uni("c"), bi("c", "b")]
        ce2 = -sum(math.log2(x) for x in s2) / 2
        assert abs(got[2]["sb_cross_entropy"] - round(ce2, 6)) < 1e-9
        assert abs(got[2]["sb_perplexity"] - round(2 ** ce2, 4)) < 1e-9
        # NULL text keeps its row with NULL scores
        assert got[3]["n_tokens"] == 0
        assert got[3]["sb_cross_entropy"] is None

    def test_pinned_external_lm_backoff_and_oov(self, spark):
        """External-LM form: every backoff branch hit and hand-checked —
        trigram miss→alpha·bigram, bigram miss→alpha²·unigram, OOV hapax
        floor (unseen word scores 1/total)."""
        import math

        from patapsco_spark.operators.textstats import sb_perplexity
        lm = spark.createDataFrame([(100, "a b c a b d")],
                                   "doc_id long, text string")
        # LM counts: c1 a2 b2 c1 d1 (tot 6); c2 (a,b)2 (b,c)1 (c,a)1 (b,d)1
        # c3 (a,b,c)1 (b,c,a)1 (c,a,b)1 (a,b,d)1
        docs = spark.createDataFrame(
            [(1, "a b c"),     # uni(a), bi(a,b), tri(a,b,c) — all hits
             (2, "b c d"),     # uni(b), bi(b,c), tri miss → α·bi(c,d) miss
                               #   → α·(α·uni(d))
             (3, "z a q")],    # OOV uni(z)=1/6; bi(z,a) miss → α·uni(a);
                               #   tri(z,a,q) miss → bi(a,q) miss
                               #   → α·(α·uni(q)) with q OOV
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               sb_perplexity(docs, lm_docs=lm).collect()}
        tot, al = 6.0, 0.4
        uni = {"a": 2 / tot, "b": 2 / tot, "c": 1 / tot, "d": 1 / tot,
               "z": 1 / tot, "q": 1 / tot}  # z,q = OOV hapax floor
        s1 = [uni["a"], 2 / 2, 1 / 2]
        s2 = [uni["b"], 1 / 2, al * (al * uni["d"])]
        s3 = [uni["z"], al * uni["a"], al * (al * uni["q"])]
        for doc, s in ((1, s1), (2, s2), (3, s3)):
            ce = -sum(math.log2(x) for x in s) / len(s)
            assert got[doc]["n_tokens"] == 3
            assert abs(got[doc]["sb_cross_entropy"] - round(ce, 6)) < 1e-9, doc

    def test_lm_artifact_round_trip(self, spark, tmp_path):
        """Persisted LM artifact scores identically to the inline lm_docs
        path, and a matching rebuild is a manifest-gated no-op."""
        import os

        from patapsco_spark.operators.textstats import (sb_lm_write,
                                                        sb_perplexity)
        from patapsco_spark.plans import manifest as mf
        lm = spark.createDataFrame(
            [(100, "a b c a b d"), (101, "c b a")],
            "doc_id long, text string")
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d"), (3, "z a q")],
            "doc_id long, text string")
        path = str(tmp_path / "sblm")
        sb_lm_write(spark, lm, path)
        assert mf.is_complete(path, "sb_lm",
                              {"op": "sb_lm", "n": 3, "id_col": "doc_id",
                               "text_col": "text"})
        inline = sorted(map(tuple, sb_perplexity(docs, lm_docs=lm).collect()))
        stored = sorted(map(tuple,
                            sb_perplexity(docs, lm_path=path).collect()))
        assert inline == stored
        # warm rebuild: manifest-gated no-op (artifact files untouched)
        before = {f: os.path.getmtime(os.path.join(r, f))
                  for r, _, fs in os.walk(path) for f in fs}
        sb_lm_write(spark, lm, path)
        after = {f: os.path.getmtime(os.path.join(r, f))
                 for r, _, fs in os.walk(path) for f in fs}
        assert before == after

    def test_backoff_penalizes_unseen_order(self, spark):
        """A doc whose trigrams never occur in the corpus (shuffled words)
        scores strictly higher than the doc that supplies the n-grams."""
        from patapsco_spark.operators.textstats import sb_perplexity
        flow = "the quick brown fox jumps over the lazy dog"
        docs = spark.createDataFrame(
            [(i, flow) for i in range(1, 6)]
            + [(6, "dog the over quick lazy jumps fox brown the")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["sb_perplexity"]
               for r in sb_perplexity(docs).collect()}
        assert got[6] > got[1]


class TestBpeTokenCounts:
    def test_piece_counts_pinned(self, spark):
        from patapsco_spark.operators.textstats import bpe_token_counts
        docs = spark.createDataFrame([
            (1, "it's a test, isn't it?"),      # contractions split as 's/'t
            (2, "hello   world 123 foo-bar"),   # space runs = 1 piece
            (3, ""),
            (4, "价格是100元"),                  # CJK letters / digits split
        ], "doc_id long, text string")
        got = {r["doc_id"]: (r["n_pieces"], r["n_words"], r["fertility"])
               for r in bpe_token_counts(docs).collect()}
        assert got[1] == (9, 5, 1.8)
        assert got[2] == (7, 4, 1.75)
        assert got[3] == (0, 0, 0.0)
        assert got[4] == (3, 1, 3.0)


class TestNullTextRows:
    def test_null_text_counts_are_zero_not_negative(self, spark):
        # regression: size(regexp_extract_all(NULL)) / size(split(NULL))
        # is -1 under legacy sizeOfNull — NULL-text docs published -1
        # counts into funnels/filters instead of 0
        from patapsco_spark.operators.textstats import (bpe_token_counts,
                                                        pii_scrub)
        from patapsco_spark.operators.dedup import line_dedup
        docs = spark.createDataFrame(
            [(1, None), (2, "a@b.co mail")], "doc_id long, text string")
        pii = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
        assert (pii[1]["n_emails"], pii[1]["n_ips"], pii[1]["n_phones"]) \
            == (0, 0, 0)
        assert pii[1]["clean_text"] == ""
        assert pii[2]["n_emails"] == 1
        bpe = {r["doc_id"]: r for r in bpe_token_counts(docs).collect()}
        assert bpe[1]["n_pieces"] == 0 and bpe[1]["n_words"] == 0
        ld = {r["doc_id"]: r for r in line_dedup(docs).collect()}
        assert ld[1]["n_lines"] == 1 and ld[1]["n_removed"] == 0
        assert ld[1]["clean_text"] == ""


class TestPiiScrub:
    def test_counts_and_redaction_pinned(self, spark):
        from patapsco_spark.operators.textstats import pii_scrub
        docs = spark.createDataFrame([
            (1, "mail a.b+c@x-corp.io or d@e.org, host 192.168.0.1"),
            (2, "call +44 20 7946 0958 or +1 555 0199"),
            (3, "no pii here 12.34 and half-ip 1.2.3"),
            (4, ""),
        ], "doc_id long, text string")
        got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
        r1 = got[1]
        assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (2, 1, 0)
        assert r1["clean_text"] == "mail [EMAIL] or [EMAIL], host [IP]"
        r2 = got[2]
        assert (r2["n_emails"], r2["n_ips"], r2["n_phones"]) == (0, 0, 2)
        assert r2["clean_text"] == "call [PHONE] or [PHONE]"
        r3 = got[3]
        assert (r3["n_emails"], r3["n_ips"], r3["n_phones"]) == (0, 0, 0)
        assert r3["clean_text"] == docs.collect()[2]["text"]
        assert got[4]["clean_text"] == ""


class TestGopherRules:
    def test_rule_battery_pinned(self, spark):
        from patapsco_spark.operators.textstats import gopher_rules
        good = "the cat and dog have fun with that mat now " * 6  # 60 words
        docs = spark.createDataFrame([
            (1, good),
            (2, "- one\n- two\n- three"),          # all-bullet lines
            (3, "wait for it...\nmore soon..."),    # all-ellipsis lines
            (4, "# # # # spam word here ok"),       # symbol soup
            (5, "short doc only"),                  # under min words
        ], "doc_id long, text string")
        got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
        g = got[1]
        assert g["n_words"] == 60
        assert abs(g["mean_word_len"] - 3.3) < 1e-9
        assert g["stop_hits"] == 5 and g["alpha_word_frac"] == 1.0
        assert g["pass_all"]
        assert not got[2]["bullet_ok"] and got[2]["bullet_frac"] == 1.0
        assert not got[3]["ellipsis_ok"] and got[3]["ellipsis_frac"] == 1.0
        assert not got[4]["symbol_ok"] and got[4]["symbol_ratio"] > 0.1
        assert not got[5]["words_ok"] and not got[5]["pass_all"]

    def test_thresholds_are_parameters(self, spark):
        from patapsco_spark.operators.textstats import gopher_rules
        docs = spark.createDataFrame([(1, "tiny text with the and")],
                                     "doc_id long, text string")
        relaxed = gopher_rules(docs, min_words=3).collect()[0]
        assert relaxed["words_ok"]


class TestDsirLogweights:
    def test_target_like_scores_higher(self, spark):
        from patapsco_spark.operators.textstats import dsir_logweights
        docs = spark.createDataFrame([
            (1, "spark query engine spark query plan"),
            (2, "cooking pasta with tomato sauce tonight"),
            (3, "spark query engine optimization notes"),
            (4, "x"),                # one token -> zero bigrams
        ], "doc_id long, text string")
        target = docs.where("doc_id = 1")
        got = {r["doc_id"]: r for r in dsir_logweights(docs, target,
                                                       n_buckets=64)
               .collect()}
        # docs sharing the target's bigrams outweigh disjoint ones
        assert got[1]["log_weight"] > got[2]["log_weight"]
        assert got[3]["log_weight"] > got[2]["log_weight"]
        assert got[4]["n_bigrams"] == 0 and got[4]["log_weight"] == 0.0
        assert got[1]["n_bigrams"] == 5
