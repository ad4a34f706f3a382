"""cross_fields (operators/bm25f.py search_cross_fields): hand-computed
golden with blended df (the term-centric semantics that distinguish it
from best_fields/dismax), single-field reduction to plain BM25, the
tie_breaker=1 sum identity, and validation errors."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.bm25f import search_cross_fields
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

# titles short, bodies longer; 'alpha' is COMMON in titles but rare in
# bodies — the df skew cross_fields' blended df exists to fix
DOCS = [
    ("d1", "alpha news", "beta gamma pad pad pad pad"),
    ("d2", "beta report", "alpha alpha pad pad pad pad pad"),
    ("d3", "alpha digest", "gamma pad pad pad"),
    ("d4", "alpha beta", "pad pad pad pad pad pad pad pad"),
]
QUERIES = [("q1", "alpha beta"), ("q2", "gamma")]
K1, B = 0.9, 0.4


@pytest.fixture(scope="module")
def idxs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("crossf")
    paths = {}
    for fld, col in (("title", 1), ("body", 2)):
        p = str(root / fld)
        df = spark.createDataFrame([(d[0], d[col], "eng") for d in DOCS],
                                   "id string, text string, lang string")
        build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
        paths[fld] = p
    return paths


def _brute(boosts, tie):
    """Reference implementation: plain Python over DOCS with blended df."""
    from patapsco_spark.functions.smallfloat import quantize_length
    import numpy as np

    fields = {"title": 1, "body": 2}
    toks = {f: {d[0]: d[i].split() for d in DOCS}
            for f, i in fields.items()}
    avg = {f: float(np.float32(sum(len(t) for t in toks[f].values())
                               / len(DOCS))) for f in fields}
    n = len(DOCS)

    def dlq(f, did):
        return int(quantize_length(
            np.array([len(toks[f][did])], dtype=np.int64))[0])

    out = {}
    for qid, qtext in QUERIES:
        scores = {}
        for d in DOCS:
            did = d[0]
            s = 0.0
            for t in sorted(set(qtext.split())):
                df_blend = max(
                    sum(1 for e in DOCS if t in toks[f][e[0]])
                    for f in fields)
                idf = math.log(1 + (n - df_blend + 0.5) / (df_blend + 0.5))
                vs = {}
                for f in sorted(fields):
                    tf = toks[f][did].count(t)
                    if tf:
                        sat = tf / (tf + K1 * (1 - B
                                               + B * dlq(f, did) / avg[f]))
                        vs[f] = boosts[f] * sat * idf
                if not vs:
                    continue
                mx, sm = max(vs.values()), sum(vs[f] for f in sorted(vs))
                s += mx + tie * (sm - mx)
            if s > 0.0:
                scores[did] = s
        out[qid] = scores
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_golden_blended_df(spark, idxs, tie):
    boosts = {"title": 2.0, "body": 1.0}
    res = search_cross_fields(spark, idxs, QUERIES, text_cfg=RAW,
                              tie_breaker=tie, boosts=boosts,
                              k1=K1, b=B, k=10)
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in res.collect()}
    want = _brute(boosts, tie)
    assert {q for q, _ in got} == {q for q in want if want[q]}
    for (q, d), s in got.items():
        assert math.isclose(s, want[q][d], rel_tol=1e-12), (q, d)


def test_blended_df_differs_from_field_local(spark, idxs):
    """'alpha' appears in 3/4 titles but 1/4 bodies: the blended idf must
    use df=3 for BOTH fields — d2 (alpha only in body) must score LOWER
    under cross_fields than a body-local-idf scorer would give it."""
    res = search_cross_fields(spark, idxs, [("q1", "alpha")], text_cfg=RAW,
                              k1=K1, b=B, k=10).collect()
    got = {r["doc_id"]: r["score"] for r in res}
    n = len(DOCS)
    idf_blend = math.log(1 + (n - 3 + 0.5) / (3 + 0.5))
    idf_local = math.log(1 + (n - 1 + 0.5) / (1 + 0.5))
    assert got["d2"] < idf_local  # body-local idf alone would exceed this
    # and the actual value carries the blended idf
    from patapsco_spark.functions.smallfloat import quantize_length
    import numpy as np
    body_len = {d[0]: len(d[2].split()) for d in DOCS}
    avg_body = float(np.float32(sum(body_len.values()) / n))
    q = int(quantize_length(np.array([body_len["d2"]], dtype=np.int64))[0])
    sat = 2 / (2 + K1 * (1 - B + B * q / avg_body))
    assert math.isclose(got["d2"], sat * idf_blend, rel_tol=1e-12)


def test_single_field_reduces_to_bm25(spark, idxs):
    """One field, boost 1: blended df = local df and the per-term dismax
    is the identity — cross_fields must equal plain BM25 over that index."""
    res = search_cross_fields(spark, {"body": idxs["body"]}, QUERIES,
                              text_cfg=RAW, k1=K1, b=B, k=10)
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in res.collect()}
    ref = search_texts(spark, idxs["body"], QUERIES,
                       RetrieveConfig(name="bm25", k1=K1, b=B, k=10),
                       text_cfg=RAW)
    want = {(r["query_id"], r["doc_id"]): r["score"] for r in ref.collect()}
    assert set(got) == set(want)
    for key, s in got.items():
        assert math.isclose(s, want[key], rel_tol=1e-9), key


def test_validation_errors(spark, idxs, tmp_path):
    with pytest.raises(ValueError, match="tie_breaker"):
        search_cross_fields(spark, idxs, QUERIES, text_cfg=RAW,
                            tie_breaker=1.5)
    with pytest.raises(ValueError, match="at least one field"):
        search_cross_fields(spark, {}, QUERIES, text_cfg=RAW)
    other = str(tmp_path / "other")
    df = spark.createDataFrame([("x1", "alpha", "eng")],
                               "id string, text string, lang string")
    build_index(spark, df, other, IndexConfig(text=RAW, num_shards=1))
    with pytest.raises(ValueError, match="corpus shape"):
        search_cross_fields(spark, {"title": idxs["title"], "o": other},
                            QUERIES, text_cfg=RAW)


def test_empty_query_terms(spark, idxs):
    assert search_cross_fields(spark, idxs, [("q1", "")],
                               text_cfg=RAW).count() == 0
