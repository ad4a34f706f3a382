"""Dis-max best_fields (operators/bm25f.py:search_dismax): brute-force
golden over per-field BM25 (each field its own stats), tie_breaker
boundary behaviors (0 → pure max, 1 → per-field sum), single-field
reduction to plain BM25, and input validation."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.bm25f import search_dismax
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "alpha news", "beta gamma pad pad pad pad"),
    ("d2", "beta report", "alpha alpha pad pad pad pad pad"),
    ("d3", "pad digest", "gamma pad pad pad"),
    ("d4", "alpha beta", "pad pad pad pad pad pad pad pad"),
]
QUERIES = [("q1", "alpha beta"), ("q2", "gamma")]
K1, B = 0.9, 0.4
BOOSTS = {"title": 2.0, "body": 1.0}


@pytest.fixture(scope="module")
def idxs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dismax")
    paths = {}
    for fld, col in (("title", 1), ("body", 2)):
        p = str(root / fld)
        df = spark.createDataFrame([(d[0], d[col], "eng") for d in DOCS],
                                   "id string, text string, lang string")
        build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
        paths[fld] = p
    return paths


def _field_bm25(col):
    """Per-field plain BM25 with that field's own df/avgdl/norms."""
    from patapsco_spark.functions.smallfloat import quantize_length
    import numpy as np

    toks = {d[0]: d[col].split() for d in DOCS}
    n = len(DOCS)
    avg = float(np.float32(sum(len(t) for t in toks.values()) / n))

    def dlq(did):
        return int(quantize_length(
            np.array([len(toks[did])], dtype=np.int64))[0])

    out = {}
    for qid, qtext in QUERIES:
        scores = {}
        for did in toks:
            s = 0.0
            for t in sorted(set(qtext.split())):
                tf = toks[did].count(t)
                if tf == 0:
                    continue
                df = sum(1 for o in toks.values() if t in o)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf / (tf + K1 * (1 - B + B * dlq(did) / avg))
            if s > 0.0:
                scores[did] = s
        out[qid] = scores
    return out


def _brute_dismax(tie):
    per = {"body": _field_bm25(2), "title": _field_bm25(1)}
    out = {}
    for qid, _ in QUERIES:
        combined = {}
        for did in {d for f in per.values() for d in f[qid]}:
            vs = [BOOSTS[f] * per[f][qid][did]
                  for f in sorted(per) if did in per[f][qid]]
            combined[did] = max(vs) + tie * (sum(vs) - max(vs))
        out[qid] = sorted(combined.items(),
                          key=lambda kv: (-kv[1], kv[0]))
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_matches_brute(spark, idxs, tie):
    res = search_dismax(spark, idxs, QUERIES, text_cfg=RAW,
                        tie_breaker=tie, boosts=BOOSTS, k1=K1, b=B, k=10)
    got = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
           for r in res.collect()}
    want = _brute_dismax(tie)
    assert {q for q, _ in got} == {q for q in want if want[q]}
    for qid, ranked in want.items():
        for rank, (did, score) in enumerate(ranked):
            grank, gscore = got[(qid, did)]
            assert grank == rank, (qid, did)
            assert gscore == pytest.approx(score, abs=1e-12), (qid, did)


def test_single_field_reduces_to_bm25(spark, idxs):
    """With one field and boost 1, dis_max IS that field's BM25 run."""
    res = search_dismax(spark, {"body": idxs["body"]}, QUERIES,
                        text_cfg=RAW, tie_breaker=0.5, k1=K1, b=B, k=10)
    plain = search_texts(spark, idxs["body"], QUERIES,
                         RetrieveConfig(k=10, k1=K1, b=B), text_cfg=RAW)
    a = sorted(map(tuple, res.select(
        "query_id", "doc_id", "rank", "score").collect()))
    b = sorted(map(tuple, plain.select(
        "query_id", "doc_id", "rank", "score").collect()))
    assert a == b


def test_tie_breaker_validation(spark, idxs):
    with pytest.raises(ValueError, match="tie_breaker"):
        search_dismax(spark, idxs, QUERIES, text_cfg=RAW, tie_breaker=1.5)
    with pytest.raises(ValueError, match="at least one field"):
        search_dismax(spark, {}, QUERIES, text_cfg=RAW)
