"""End-to-end index + retrieve goldens.

The exact-score anchors come from the reference's pinned Lucene values on the
canonical 4-doc corpus (/root/reference/tests/test_psq.py:29-67). These pin
Lucene-8 BM25 semantics including the SmallFloat norm quantization and the
expected-statistics PSQ scoring.
"""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search, search_texts
from patapsco_spark.operators.queryparse import parse_query

FOUR_DOCS = [
    ("1", "gato felino", "eng"),
    ("2", "gato and some extra words gato", "eng"),
    ("3", "felino", "eng"),
    ("4", "gato", "eng"),
]

# no stemming/stopwords: the reference indexes these docs verbatim through
# the WhitespaceAnalyzer (test constructs Docs directly)
RAW_TEXT = TextConfig(stem=None, stopwords=None, lowercase=True)


@pytest.fixture(scope="module")
def four_doc_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx4"))
    df = spark.createDataFrame(FOUR_DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW_TEXT, num_shards=2))
    return path


class TestPsqGoldens:
    QUERY = "psq AND (gato^0.8 felino^0.2) AND (extra^0.9 words^0.1)"

    def test_golden_k1_1_2_b_075(self, spark, four_doc_index):
        plan = parse_query("123", self.QUERY, mode="psq")
        res = search(spark, four_doc_index, [plan],
                     RetrieveConfig(k1=1.2, b=0.75)).collect()
        assert len(res) == 4
        top = res[0]
        assert top["doc_id"] == "2"
        assert top["score"] == pytest.approx(0.5117189, rel=1e-5)

    def test_golden_k1_5_b_01(self, spark, four_doc_index):
        plan = parse_query("123", self.QUERY, mode="psq")
        res = search(spark, four_doc_index, [plan],
                     RetrieveConfig(k1=5, b=0.1)).collect()
        assert len(res) == 4
        assert res[0]["doc_id"] == "2"
        assert res[0]["score"] == pytest.approx(0.270769, rel=1e-5)


class TestBm25:
    def test_hand_computed_scores(self, spark, four_doc_index):
        # BM25 with reference defaults k1=0.9, b=0.4 for query "gato":
        # N=4, df=3, idf=ln(1+1.5/3.5); avgdl=float32(10/4)=2.5
        # doc4: dl=1, K=0.9*(0.6+0.4*1/2.5)=0.684, s=idf*1/1.684
        import math
        idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r for r in res.collect()}
        assert set(rows) == {"1", "2", "4"}
        assert rows["4"]["score"] == pytest.approx(idf / (1 + 0.9 * (0.6 + 0.4 / 2.5)), rel=1e-6)
        k2 = 0.9 * (0.6 + 0.4 * 6 / 2.5)
        assert rows["2"]["score"] == pytest.approx(idf * 2 / (2 + k2), rel=1e-6)
        # ranks: doc4 (dl=1, tf=1) vs doc2 (tf=2, dl=6): compute both
        order = [r["doc_id"] for r in sorted(rows.values(), key=lambda r: r["rank"])]
        assert order[0] == max(rows.values(), key=lambda r: r["score"])["doc_id"]

    def test_multi_term_sum(self, spark, four_doc_index):
        import math
        res = search_texts(spark, four_doc_index, [("q1", "gato felino")],
                           RetrieveConfig(), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        assert set(rows) == {"1", "2", "3", "4"}
        idf_g = math.log(1 + 1.5 / 3.5)
        idf_f = math.log(1 + 2.5 / 2.5)
        k1doc = 0.9 * (0.6 + 0.4 * 2 / 2.5)
        want1 = idf_g / (1 + k1doc) + idf_f / (1 + k1doc)
        assert rows["1"] == pytest.approx(want1, rel=1e-6)

    def test_tie_break_by_docid(self, spark, four_doc_index):
        # docs 3 ("felino") and 4 ("gato") have identical dl; query both
        # terms → equal per-term structure is not tied, but a single-term
        # query over two same-length docs with same tf ties exactly:
        res = search_texts(spark, four_doc_index, [("q", "felino")],
                           RetrieveConfig(), text_cfg=RAW_TEXT).collect()
        assert [r["doc_id"] for r in res][:1] == ["3"]  # dl=1 beats dl=2


class TestQld:
    def test_qld_hand_computed(self, spark, four_doc_index):
        import math
        # QLD mu=1000; p(gato|C)=(4+1)/(10+1); doc4 dl=1
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="qld"), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        p_c = (4 + 1) / (10 + 1)
        want4 = math.log(1 + 1 / (1000 * p_c)) + math.log(1000 / (1 + 1000))
        want4 = max(want4, 0.0)
        if want4 == 0.0:
            assert rows.get("4", 0.0) == pytest.approx(0.0, abs=1e-9)
        else:
            assert rows["4"] == pytest.approx(want4, rel=1e-6)


class TestAltSimilarities:
    """qljm (LMJelinekMercer) and classic (TF-IDF) over the same corpus
    and quantized norms as bm25/qld — hand-computed from the published
    Lucene formulas (new r5)."""

    def test_qljm_hand_computed(self, spark, four_doc_index):
        import math
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="qljm", lam=0.1),
                           text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        p_c = (4 + 1) / (10 + 1)  # cf(gato)=4, total_tf=10, +1 smoothing
        def jm(tf, dl):
            return math.log(1 + (0.9 * tf * (1.0 / dl)) / (0.1 * p_c))
        assert rows["4"] == pytest.approx(jm(1, 1), rel=1e-9)
        assert rows["1"] == pytest.approx(jm(1, 2), rel=1e-9)
        assert rows["2"] == pytest.approx(jm(2, 6), rel=1e-9)
        assert "3" not in rows  # no 'gato'
        # longer doc scores lower at equal tf; tf helps within a doc
        assert rows["4"] > rows["1"] > rows["2"]

    def test_classic_hand_computed(self, spark, four_doc_index):
        import math
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="classic"),
                           text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        idf = 1 + math.log((4 + 1) / (3 + 1))
        assert rows["4"] == pytest.approx(idf * idf, rel=1e-9)
        assert rows["1"] == pytest.approx(idf * idf / math.sqrt(2), rel=1e-9)
        assert rows["2"] == pytest.approx(
            math.sqrt(2) * idf * idf / math.sqrt(6), rel=1e-9)

    def test_dfr_inl2_hand_computed(self, spark, four_doc_index):
        import math
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="dfr_inl2"),
                           text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        idf2 = math.log2((4 + 1) / (3 + 0.5))
        def inl2(tf, dl):  # avgdl = 10/4 = 2.5, c = 1
            tfn = tf * math.log2(1 + 2.5 / dl)
            return (1 / (tfn + 1)) * tfn * idf2
        assert rows["4"] == pytest.approx(inl2(1, 1), rel=1e-9)
        assert rows["1"] == pytest.approx(inl2(1, 2), rel=1e-9)
        assert rows["2"] == pytest.approx(inl2(2, 6), rel=1e-9)
        assert "3" not in rows
        # normalization 2: shorter doc wins at equal tf
        assert rows["4"] > rows["1"]

    def test_dfi_hand_computed(self, spark, four_doc_index):
        import math
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="dfi"), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        def dfi(tf, dl):  # e = cf·dl/total_tf = 4·dl/10
            e = 4 * dl / 10
            return math.log2(1 + (tf - e) / math.sqrt(e)) if tf > e else 0.0
        assert rows["4"] == pytest.approx(dfi(1, 1), rel=1e-9)
        assert rows["1"] == pytest.approx(dfi(1, 2), rel=1e-9)
        # doc2: tf=2 ≤ e=2.4 — over-long doc's tf is BELOW chance, the
        # DFI stopword effect zeroes it but the doc still matched
        assert rows["2"] == 0.0
        assert "3" not in rows

    def test_pl2_hand_computed(self, spark, four_doc_index):
        import math
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="pl2"), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        lam = 4 / 4  # λ = cf/N
        def pl2(tf, dl):  # avgdl = 2.5, c = 1
            tfn = tf * math.log2(1 + 2.5 / dl)
            g = (1 / (tfn + 1)) * (tfn * math.log2(tfn / lam)
                                   + (lam - tfn) * math.log2(math.e)
                                   + 0.5 * math.log2(2 * math.pi * tfn))
            return max(g, 0.0)
        for d, tf, dl in (("4", 1, 1), ("1", 1, 2), ("2", 2, 6)):
            want = pl2(tf, dl)
            if want == 0.0:
                assert rows.get(d, 0.0) == pytest.approx(0.0, abs=1e-12)
            else:
                assert rows[d] == pytest.approx(want, rel=1e-9)
        assert "3" not in rows

    def test_f2exp_hand_computed(self, spark, four_doc_index):
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="f2exp"), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        idf = ((4 + 1) / 3) ** 0.35
        def f2(tf, dl):  # s = 0.5, avgdl = 2.5
            return idf * tf / (tf + 0.5 + 0.5 * dl / 2.5)
        assert rows["4"] == pytest.approx(f2(1, 1), rel=1e-9)
        assert rows["1"] == pytest.approx(f2(1, 2), rel=1e-9)
        assert rows["2"] == pytest.approx(f2(2, 6), rel=1e-9)
        assert "3" not in rows
        # axiomatic TFLN: shorter doc wins at equal tf
        assert rows["4"] > rows["1"]

    def test_ib_ll_hand_computed(self, spark, four_doc_index):
        import math
        res = search_texts(spark, four_doc_index, [("q1", "gato")],
                           RetrieveConfig(name="ib_ll"), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        lam = (3 + 1) / (4 + 1)  # LambdaDF = (df+1)/(N+1)
        def ib(tf, dl):
            tfn = tf * math.log2(1 + 2.5 / dl)
            return math.log(1 + tfn / lam)
        assert rows["4"] == pytest.approx(ib(1, 1), rel=1e-9)
        assert rows["1"] == pytest.approx(ib(1, 2), rel=1e-9)
        assert rows["2"] == pytest.approx(ib(2, 6), rel=1e-9)
        assert "3" not in rows
        assert rows["4"] > rows["1"]

    def test_bool_hand_computed(self, spark, four_doc_index):
        """BooleanSimilarity: each matching clause contributes exactly its
        boost — score = number of matching query terms (per occurrence),
        no tf saturation (doc 2's double 'gato' counts once per clause)."""
        res = search_texts(spark, four_doc_index,
                           [("q1", "gato felino felino")],
                           RetrieveConfig(name="bool"), text_cfg=RAW_TEXT)
        rows = {r["doc_id"]: r["score"] for r in res.collect()}
        # doc1 matches gato + felino×2 clauses = 3; doc2/4 gato only = 1;
        # doc3 felino×2 = 2
        assert rows == {"1": 3.0, "3": 2.0, "2": 1.0, "4": 1.0}
        order = [r["doc_id"] for r in sorted(
            res.collect(), key=lambda r: r["rank"])]
        assert order == ["1", "3", "2", "4"]  # score desc, doc_id asc

    def test_unknown_scorer_rejected(self, spark, four_doc_index):
        with pytest.raises(ValueError, match="unknown scorer"):
            search_texts(spark, four_doc_index, [("q1", "gato")],
                         RetrieveConfig(name="dfr"), text_cfg=RAW_TEXT)

    def test_explain_gated_to_bm25(self, spark, four_doc_index):
        from patapsco_spark.operators.retrieve import explain
        plan = parse_query("q", "gato", mode="boolean")
        with pytest.raises(ValueError, match="bm25 only"):
            explain(spark, four_doc_index, plan, ["4"],
                    RetrieveConfig(name="qld"))


class TestBoolean:
    def test_must_not(self, spark, four_doc_index):
        plan = parse_query("q", "gato NOT extra", mode="boolean")
        res = search(spark, four_doc_index, [plan], RetrieveConfig()).collect()
        ids = {r["doc_id"] for r in res}
        assert ids == {"1", "4"}  # doc2 contains 'extra'; doc3 lacks 'gato'

    def test_and(self, spark, four_doc_index):
        plan = parse_query("q", "gato AND felino", mode="boolean")
        res = search(spark, four_doc_index, [plan], RetrieveConfig()).collect()
        assert {r["doc_id"] for r in res} == {"1"}

    def test_boost(self, spark, four_doc_index):
        import math
        plan = parse_query("q", "gato^2.0", mode="boolean")
        res = search(spark, four_doc_index, [plan], RetrieveConfig()).collect()
        rows = {r["doc_id"]: r["score"] for r in res}
        idf = math.log(1 + 1.5 / 3.5)
        assert rows["4"] == pytest.approx(2.0 * idf / (1 + 0.9 * (0.6 + 0.4 / 2.5)), rel=1e-6)


class TestIndexStructure:
    def test_docid_assignment_is_sorted_order(self, spark, four_doc_index):
        norms = spark.read.parquet(f"{four_doc_index}/norms").orderBy("docid")
        rows = norms.collect()
        assert [r["id"] for r in rows] == ["1", "2", "3", "4"]
        assert [r["docid"] for r in rows] == [0, 1, 2, 3]
        assert [r["dl"] for r in rows] == [2, 6, 1, 1]

    def test_term_stats(self, spark, four_doc_index):
        stats = {r["term"]: (r["df"], r["cf"])
                 for r in spark.read.parquet(f"{four_doc_index}/term_stats").collect()}
        assert stats["gato"] == (3, 4)
        assert stats["felino"] == (2, 2)
        assert stats["extra"] == (1, 1)

    def test_manifest(self, four_doc_index):
        from patapsco_spark.plans import manifest as mf
        man = mf.read_manifest(four_doc_index)
        assert man["config"]["num_docs"] == 4
        assert man["config"]["total_tf"] == 10
        assert man["config"]["avgdl"] == pytest.approx(2.5)
        # lineage recorded for analyzed stage
        sub = mf.read_manifest(f"{four_doc_index}/analyzed")
        assert sub["metrics"]["rows"] == 4
        assert all("rows" in r for r in sub["lineage"])


class TestSearchWithPrior:
    def _plans(self):
        from patapsco_spark.operators.retrieve import process_queries
        return process_queries([("q1", "gato")], RAW_TEXT, mode="plain")

    def test_prior_reorders_text_ranking(self, spark, four_doc_index):
        from patapsco_spark.operators.retrieve import (search,
                                                       search_with_prior)
        plans = self._plans()
        base = search(spark, four_doc_index, plans, RetrieveConfig(k=4))
        text_order = [r.doc_id for r in base.collect()]
        # a big prior on the LAST text hit must promote it to rank 0
        last = text_order[-1]
        assert last != text_order[0]
        priors = spark.createDataFrame([(last, 100.0)],
                                       "doc_id string, prior double")
        blended = search_with_prior(spark, four_doc_index, plans, priors,
                                    RetrieveConfig(k=4), weight=1.0,
                                    rescore_depth=4)
        rows = blended.collect()
        assert rows[0].doc_id == last
        assert rows[0].rank == 0
        # docs without a prior keep their text score (prior treated as 0)
        base_scores = {r.doc_id: r.score for r in base.collect()}
        for r in rows[1:]:
            assert r.score == pytest.approx(base_scores[r.doc_id])

    def test_zero_weight_is_text_ranking(self, spark, four_doc_index):
        from patapsco_spark.operators.retrieve import (search,
                                                       search_with_prior)
        plans = self._plans()
        priors = spark.createDataFrame([("1", 50.0)],
                                       "doc_id string, prior double")
        blended = search_with_prior(spark, four_doc_index, plans, priors,
                                    RetrieveConfig(k=4), weight=0.0,
                                    rescore_depth=4)
        base = search(spark, four_doc_index, plans, RetrieveConfig(k=4))
        assert [r.doc_id for r in blended.collect()] == \
            [r.doc_id for r in base.collect()]

    def test_depth_below_k_refused(self, spark, four_doc_index):
        from patapsco_spark.operators.retrieve import search_with_prior
        priors = spark.createDataFrame([("1", 1.0)],
                                       "doc_id string, prior double")
        with pytest.raises(ValueError, match="rescore_depth"):
            search_with_prior(spark, four_doc_index, self._plans(), priors,
                              RetrieveConfig(k=10), rescore_depth=5)

    def test_priors_side_never_shuffled(self, spark, four_doc_index):
        from patapsco_spark.operators.retrieve import search_with_prior
        priors = spark.createDataFrame([("1", 1.0), ("2", 2.0)],
                                       "doc_id string, prior double")
        out = search_with_prior(spark, four_doc_index, self._plans(), priors,
                                RetrieveConfig(k=4), rescore_depth=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # both prior joins are broadcast: semi-reduce + blend-back
        assert plan.count("BroadcastHashJoin") >= 2
