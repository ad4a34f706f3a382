"""RM3 pseudo-relevance feedback vs an independent pure-Python oracle.

The oracle re-derives the whole two-pass computation (Lucene-quantized BM25
pass-1, RM1 estimate, RM3 interpolation, boosted pass-2) from the raw corpus
with plain dicts — no shared code with the Spark implementation beyond the
norm-quantization table it is pinned to elsewhere.
"""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.functions.smallfloat import quantize_length
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.rm3 import search_rm3

CORPUS = [
    ("d1", "stream window join stream aggregate"),
    ("d2", "window aggregate filter window window"),
    ("d3", "stream filter scan table scan"),
    ("d4", "join table scan join stream window"),
    ("d5", "vector index probe cache node"),
    ("d6", "stream stream stream window cache"),
]
CFG = TextConfig(stem=None, stopwords=None, lowercase=True)
K1, B = 0.9, 0.4
FB_DOCS, FB_TERMS, OQW = 3, 4, 0.5


def _bm25_oracle(query_terms, k1=K1, b=B, boosts=None):
    """Quantized-length Lucene BM25 over CORPUS for weighted terms."""
    docs = {i: t.split() for i, t in CORPUS}
    n = len(docs)
    dls = {i: float(quantize_length([len(t)])[0]) for i, t in docs.items()}
    avgdl = float(__import__("numpy").float32(
        sum(len(t) for t in docs.values()) / n))
    scores = {}
    for i, toks in docs.items():
        s = 0.0
        for qi, t in enumerate(query_terms):
            df = sum(1 for d in docs.values() if t in d)
            tf = toks.count(t)
            if tf == 0 or df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            w = 1.0 if boosts is None else boosts[qi]
            s += w * idf * tf / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        if s > 0:
            scores[i] = s
    return scores


def _rm3_oracle(query):
    qterms = query.split()
    pass1 = _bm25_oracle(qterms)
    fb = sorted(pass1.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_DOCS]
    docs = {i: t.split() for i, t in CORPUS}
    rm1 = {}
    for doc_id, score in fb:
        toks = docs[doc_id]
        for t in set(toks):
            rm1[t] = rm1.get(t, 0.0) + toks.count(t) / len(toks) * score
    top = sorted(rm1.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_TERMS]
    l1 = sum(w for _, w in top)
    rm1n = {t: w / l1 for t, w in top}
    pq = {t: qterms.count(t) / len(qterms) for t in set(qterms)}
    terms = sorted(set(rm1n) | set(pq))
    weights = {t: OQW * pq.get(t, 0.0) + (1 - OQW) * rm1n.get(t, 0.0) for t in terms}
    pass2 = _bm25_oracle(terms, boosts=[weights[t] for t in terms])
    return sorted(pass2.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def rm3_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rm3idx"))
    docs = spark.createDataFrame([(i, t, "eng") for i, t in CORPUS],
                                 "id string, text string, lang string")
    build_index(spark, docs, path, IndexConfig(text=CFG, num_shards=2),
                resume=False)
    return path


def test_rm3_matches_oracle(spark, rm3_index):
    cfg = RetrieveConfig(k=10, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
                         original_query_weight=OQW)
    got = search_rm3(spark, rm3_index, [("q1", "stream window")], cfg,
                     text_cfg=CFG)
    rows = sorted(got.collect(), key=lambda r: r.rank)
    want = _rm3_oracle("stream window")
    assert [r.doc_id for r in rows] == [d for d, _ in want]
    for r, (_, s) in zip(rows, want):
        assert r.score == pytest.approx(s, abs=1e-9)


def test_rm3_expands_beyond_query_terms(spark, rm3_index):
    """Docs matching only expansion terms (not the original query) can enter
    pass-2 results — the defining property of feedback."""
    cfg = RetrieveConfig(k=10, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
                         original_query_weight=OQW)
    got = search_rm3(spark, rm3_index, [("q1", "cache")], cfg, text_cfg=CFG)
    ids = {r.doc_id for r in got.collect()}
    # d4 has no 'cache' but shares expansion terms with the fb docs d5/d6
    assert any(d not in ("d5", "d6") for d in ids)


def test_rm3_multiple_queries(spark, rm3_index):
    cfg = RetrieveConfig(k=5, fb_docs=2, fb_terms=3, original_query_weight=0.6)
    got = search_rm3(spark, rm3_index,
                     [("a", "stream"), ("b", "table scan")], cfg, text_cfg=CFG)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {"a", "b"}
    for rows in by_q.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(len(rows)))
