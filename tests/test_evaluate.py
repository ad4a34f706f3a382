"""Evaluation metrics vs a pure-Python trec_eval-semantics oracle, plus the
reference's query-set edge cases (run-not-in-qrels dropped, qrels-not-in-run
scored as zero, ndcg' judged-only filtering)."""

import math

import pytest

from patapsco_spark.operators.evaluate import evaluate_run
from patapsco_spark.sources.trec import read_qrels, read_trec_run, write_trec_run

RUN = [
    # query_id, doc_id, score
    ("q1", "d1", 5.0), ("q1", "d2", 4.0), ("q1", "d3", 3.0), ("q1", "d4", 2.0),
    ("q2", "d1", 2.0), ("q2", "d5", 2.0), ("q2", "d6", 1.0),
    ("q3", "d9", 1.0),          # q3 not in qrels -> dropped
]
QRELS = [
    ("q1", "d1", 2), ("q1", "d3", 1), ("q1", "d7", 1), ("q1", "d2", 0),
    ("q2", "d5", 1), ("q2", "d6", 2),
    ("q4", "d1", 1),            # q4 has no run rows -> all zeros
]


def _oracle():
    """Independent trec_eval-convention computation."""
    from collections import defaultdict
    qrels = defaultdict(dict)
    for q, d, r in QRELS:
        qrels[q][d] = r
    runs = defaultdict(list)
    for q, d, s in RUN:
        if q in qrels:
            runs[q].append((d, s))
    out = {}
    for q in qrels:
        # trec_eval tie-break: score desc, doc_id DESC (stable two-pass sort)
        ranked = sorted(runs.get(q, []), key=lambda ds: ds[0], reverse=True)
        ranked = sorted(ranked, key=lambda ds: -ds[1])
        rels = [qrels[q].get(d, 0) for d, _ in ranked]
        R = sum(1 for r in qrels[q].values() if r > 0)
        # AP
        cum = 0
        ap = 0.0
        for i, r in enumerate(rels, 1):
            if r > 0:
                cum += 1
                ap += cum / i
        ap = ap / R if R else 0.0
        # nDCG (linear gain)
        dcg = sum(r / math.log2(i + 1) for i, r in enumerate(rels, 1))
        ideal = sorted(qrels[q].values(), reverse=True)
        idcg = sum(r / math.log2(i + 1) for i, r in enumerate(ideal, 1))
        ndcg = dcg / idcg if idcg else 0.0
        # ndcg': restrict run to judged docs, re-rank compactly
        judged = [(d, s) for d, s in ranked if d in qrels[q]]
        jrels = [qrels[q][d] for d, _ in judged]
        jdcg = sum(r / math.log2(i + 1) for i, r in enumerate(jrels, 1))
        ndcg_p = (jdcg / idcg if idcg else 0.0) if judged else ndcg
        # recall@100, P@10
        rec = (sum(1 for r in rels[:100] if r > 0) / R) if R else 0.0
        p10 = sum(1 for r in rels[:10] if r > 0) / 10.0
        out[q] = dict(map=ap, ndcg=ndcg, ndcg_prime=ndcg_p,
                      recall_100=rec, P_10=p10)
    out["all"] = {m: sum(v[m] for v in out.values()) / len(out)
                  for m in next(iter(out.values()))}
    return out


@pytest.fixture(scope="module")
def frames(spark):
    run = spark.createDataFrame(RUN, "query_id string, doc_id string, score double")
    qrels = spark.createDataFrame(QRELS, "query_id string, doc_id string, relevance int")
    return run, qrels


def test_metrics_match_oracle(spark, frames):
    run, qrels = frames
    got = {r["query_id"]: r.asDict() for r in evaluate_run(run, qrels).collect()}
    want = _oracle()
    assert set(got) == set(want)
    for q, metrics in want.items():
        for m, v in metrics.items():
            assert got[q][m] == pytest.approx(v, abs=1e-12), (q, m)


def test_dropped_and_empty_queries(spark, frames):
    run, qrels = frames
    got = {r["query_id"]: r.asDict() for r in evaluate_run(run, qrels).collect()}
    assert "q3" not in got                      # run query not in qrels
    assert got["q4"]["map"] == 0.0              # qrels query with empty run
    assert got["q4"]["ndcg"] == 0.0


def test_trec_run_roundtrip(spark, frames, tmp_path):
    run, _ = frames
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    ranked = run.withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))) - 1)
    path = str(tmp_path / "run.txt")
    write_trec_run(ranked, path, system="testsys")
    back = read_trec_run(spark, path)
    assert back.count() == len(RUN)
    assert back.where("system <> 'testsys'").count() == 0
    a = sorted((r.query_id, r.doc_id, r.rank, r.score) for r in back.collect())
    b = sorted((r.query_id, r.doc_id, r["rank"], r.score) for r in ranked.collect())
    assert a == b


def test_qrels_reader_sniffs_separators(spark, tmp_path):
    p1 = tmp_path / "qrels_space.txt"
    p1.write_text("q1 0 d1 2\nq1 0 d2 0\n")
    p2 = tmp_path / "qrels_tab.txt"
    p2.write_text("q2\t0\td3\t1\n")
    got = sorted((r.query_id, r.doc_id, r.relevance)
                 for r in read_qrels(spark, str(tmp_path / "qrels_*.txt")).collect())
    assert got == [("q1", "d1", 2), ("q1", "d2", 0), ("q2", "d3", 1)]


class TestReferenceSemantics:
    """Depth truncation, num_rel==0 topic exclusion, parameterized and
    validated metric names — all pinned to trec_eval conventions."""

    def test_run_depth_truncation(self, spark):
        # 1500-deep run for one query; the only relevant doc sits at rank
        # 1200 — with the reference's depth-1000 truncation it contributes
        # NOTHING (trec_eval scores the truncated run)
        rows = [("q1", f"d{i:05d}", float(2000 - i)) for i in range(1500)]
        run = spark.createDataFrame(rows, "query_id string, doc_id string, score double")
        qrels = spark.createDataFrame([("q1", "d01199", 1)],
                                      "query_id string, doc_id string, relevance int")
        got = {r["query_id"]: r.asDict()
               for r in evaluate_run(run, qrels, metrics=("map", "recall_1000")).collect()}
        assert got["q1"]["map"] == 0.0
        assert got["q1"]["recall_1000"] == 0.0
        # depth=None disables truncation: the doc at rank 1200 now counts
        got = {r["query_id"]: r.asDict()
               for r in evaluate_run(run, qrels, metrics=("map",), depth=None).collect()}
        assert got["q1"]["map"] == pytest.approx(1 / 1200)

    def test_num_rel_zero_topic_excluded(self, spark):
        run = spark.createDataFrame(
            [("q1", "d1", 2.0), ("q2", "d1", 2.0)],
            "query_id string, doc_id string, score double")
        qrels = spark.createDataFrame(
            [("q1", "d1", 1), ("q2", "d1", 0), ("q2", "d2", 0)],
            "query_id string, doc_id string, relevance int")
        got = {r["query_id"]: r.asDict()
               for r in evaluate_run(run, qrels, metrics=("map",)).collect()}
        assert "q2" not in got          # only rel=0 judgments -> not evaluated
        assert got["q1"]["map"] == 1.0
        assert got["all"]["map"] == 1.0  # mean over evaluated topics only

    def test_parameterized_cutoffs(self, spark):
        # 5 docs ranked d5..d1 (score desc); rels: d5=1, d3=2, d1=1 -> R=3
        run = spark.createDataFrame(
            [("q1", f"d{i}", float(i)) for i in range(1, 6)],
            "query_id string, doc_id string, score double")
        qrels = spark.createDataFrame(
            [("q1", "d5", 1), ("q1", "d3", 2), ("q1", "d1", 1)],
            "query_id string, doc_id string, relevance int")
        got = {r["query_id"]: r.asDict() for r in evaluate_run(
            run, qrels,
            metrics=("P_2", "recall@2", "recall_3", "ndcg_cut_3")).collect()}
        q = got["q1"]
        assert q["P_2"] == pytest.approx(1 / 2)        # hits in top-2: d5
        assert q["recall_2"] == pytest.approx(1 / 3)   # '@' normalized to '_'
        assert q["recall_3"] == pytest.approx(2 / 3)   # d5, d3
        import math
        dcg3 = 1 / math.log2(2) + 0 + 2 / math.log2(4)
        idcg3 = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert q["ndcg_cut_3"] == pytest.approx(dcg3 / idcg3)

    def test_recip_rank_and_judged_k(self, spark):
        # round-4 breadth: recip_rank = 1/rank of first rel>0 hit (0 when
        # none retrieved); judged_k = |top-k ∩ qrels| / k, counting rel=0
        # (judged non-relevant) pairs as judged — trec_eval conventions
        run = spark.createDataFrame(
            [("q1", "d1", 5.0), ("q1", "d2", 4.0), ("q1", "d3", 3.0),
             ("q1", "d4", 2.0), ("q2", "d1", 1.0)],
            "query_id string, doc_id string, score double")
        qrels = spark.createDataFrame(
            [("q1", "d2", 0), ("q1", "d3", 2), ("q1", "d9", 1),
             ("q2", "d9", 1)],
            "query_id string, doc_id string, relevance int")
        got = {r["query_id"]: r.asDict() for r in evaluate_run(
            run, qrels,
            metrics=("recip_rank", "judged_2", "judged_10")).collect()}
        # q1 ranked d1,d2,d3,d4: first rel>0 is d3 at rank 3
        assert got["q1"]["recip_rank"] == pytest.approx(1 / 3)
        assert got["q1"]["judged_2"] == pytest.approx(1 / 2)    # d2 only
        assert got["q1"]["judged_10"] == pytest.approx(2 / 10)  # d2, d3
        # q2 retrieved nothing relevant/judged
        assert got["q2"]["recip_rank"] == 0.0
        assert got["q2"]["judged_10"] == 0.0
        assert got["all"]["recip_rank"] == pytest.approx(1 / 6)

    def test_rprec_bpref_success(self, spark):
        # q1 ranked d1..d5 by score desc; qrels: d2=0, d4=0 (judged nonrel),
        # d3=2, d5=1, d9=1 (unretrieved) -> R=3, N(nonrel)=2
        run = spark.createDataFrame(
            [("q1", f"d{i}", float(6 - i)) for i in range(1, 6)] +
            [("q2", "d1", 1.0)],
            "query_id string, doc_id string, score double")
        qrels = spark.createDataFrame(
            [("q1", "d2", 0), ("q1", "d4", 0), ("q1", "d3", 2),
             ("q1", "d5", 1), ("q1", "d9", 1),
             # q2: all-positive qrels -> N=0 exercises bpref's
             # no-nonrel-above branch (trec_eval adds 1.0, no div by 0)
             ("q2", "d1", 1), ("q2", "d7", 2)],
            "query_id string, doc_id string, relevance int")
        got = {r["query_id"]: r.asDict() for r in evaluate_run(
            run, qrels,
            metrics=("Rprec", "bpref", "success_1", "success_5")).collect()}
        q = got["q1"]
        assert q["Rprec"] == pytest.approx(1 / 3)     # top-3 rel hits: d3
        # bpref: judged retrieved in order d2(0), d3(2), d4(0), d5(1):
        #   d3 -> 1 - min(1,3)/min(2,3) = 0.5 ; d5 -> 1 - min(2,3)/min(2,3) = 0
        assert q["bpref"] == pytest.approx(0.5 / 3)
        assert q["success_1"] == 0.0 and q["success_5"] == 1.0
        assert got["q2"]["bpref"] == pytest.approx(1 / 2)  # 1.0 / R=2
        assert got["q2"]["Rprec"] == pytest.approx(1 / 2)

    def test_unsupported_metric_raises(self, spark):
        from patapsco_spark.config import ConfigError
        run = spark.createDataFrame([("q1", "d1", 1.0)],
                                    "query_id string, doc_id string, score double")
        qrels = spark.createDataFrame([("q1", "d1", 1)],
                                      "query_id string, doc_id string, relevance int")
        with pytest.raises(ConfigError, match="unsupported metric"):
            evaluate_run(run, qrels, metrics=("gm_map",)).collect()
