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
