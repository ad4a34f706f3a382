"""Rocchio pseudo-relevance feedback vs an independent pure-Python oracle.

Covers what the DuckDB entry oracle (rocchio_topk) does not: the γ > 0
negative-feedback path (pseudo-non-relevant centroid subtracted, IIR's
negative-weight clamp) and the nr_results contract error. The oracle
re-derives both passes and the vector algebra from the raw corpus with
plain dicts — no shared code with the Spark implementation beyond the
norm-quantization table it is pinned to elsewhere.
"""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.rm3 import (estimate_rocchio_terms,
                                          search_rocchio)
from tests.test_rm3 import CORPUS, _bm25_oracle

CFG = TextConfig(stem=None, stopwords=None, lowercase=True)


def _rocchio_oracle(query, *, alpha, beta, gamma=0.0, fb_docs, fb_terms,
                    nr_docs=0, k=10):
    qterms = query.split()
    depth = fb_docs + (nr_docs if gamma > 0 else 0)
    ranked = sorted(_bm25_oracle(qterms).items(),
                    key=lambda kv: (-kv[1], kv[0]))[:depth]
    fb, nr = ranked[:fb_docs], ranked[fb_docs:]
    docs = {i: t.split() for i, t in CORPUS}

    def centroid(ds):
        c = {}
        for d, _ in ds:
            toks = docs[d]
            for t in set(toks):
                c[t] = c.get(t, 0.0) + toks.count(t) / len(toks)
        return {t: v / len(ds) for t, v in c.items()} if ds else {}

    crel, cnr = centroid(fb), centroid(nr)
    qtf = {}
    for t in qterms:
        qtf[t] = qtf.get(t, 0) + 1
    w = {t: alpha * qtf.get(t, 0) + beta * crel.get(t, 0.0)
         - gamma * cnr.get(t, 0.0)
         for t in set(crel) | set(qtf) | set(cnr)}
    top = sorted(((t, v) for t, v in w.items() if v > 0),
                 key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    terms = sorted(t for t, _ in top)
    wmap = dict(top)
    pass2 = _bm25_oracle(terms, boosts=[wmap[t] for t in terms])
    return sorted(pass2.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def rocchio_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rocchio_idx"))
    docs = spark.createDataFrame([(i, t, "eng") for i, t in CORPUS],
                                 "id string, text string, lang string")
    build_index(spark, docs, path, IndexConfig(text=CFG, num_shards=2),
                resume=False)
    return path


def _run(spark, idx, query, **kw):
    cfg = RetrieveConfig(k=10, fb_docs=kw.pop("fb_docs"),
                         fb_terms=kw.pop("fb_terms"))
    got = search_rocchio(spark, idx, [("q1", query)], cfg, text_cfg=CFG,
                         **kw)
    return sorted(got.collect(), key=lambda r: r.rank)


def test_rocchio_matches_oracle(spark, rocchio_index):
    rows = _run(spark, rocchio_index, "stream window",
                fb_docs=3, fb_terms=4, alpha=1.0, beta=0.75)
    want = _rocchio_oracle("stream window", alpha=1.0, beta=0.75,
                           fb_docs=3, fb_terms=4)
    assert [r.doc_id for r in rows] == [d for d, _ in want]
    for r, (_, s) in zip(rows, want):
        assert r.score == pytest.approx(s, abs=1e-9)


def test_rocchio_negative_feedback(spark, rocchio_index):
    """γ > 0 subtracts the bottom-of-pass-1 centroid; terms pushed ≤ 0 are
    clamped out of the expansion vector (IIR's convention)."""
    rows = _run(spark, rocchio_index, "stream window",
                fb_docs=2, fb_terms=4, alpha=1.0, beta=0.75,
                gamma=0.5, nr_docs=2)
    want = _rocchio_oracle("stream window", alpha=1.0, beta=0.75, gamma=0.5,
                           fb_docs=2, fb_terms=4, nr_docs=2)
    assert [r.doc_id for r in rows] == [d for d, _ in want]
    for r, (_, s) in zip(rows, want):
        assert r.score == pytest.approx(s, abs=1e-9)
    # and the γ=0 run over the same split differs — the subtraction bites
    base = _run(spark, rocchio_index, "stream window",
                fb_docs=2, fb_terms=4, alpha=1.0, beta=0.75)
    assert [(r.doc_id, r.score) for r in rows] != \
        [(r.doc_id, r.score) for r in base]


def test_rocchio_repeated_query_term(spark, rocchio_index):
    """α multiplies the RAW query tf (Rocchio keeps the query vector
    unnormalized, unlike RM3's MLE p(t|q))."""
    rows = _run(spark, rocchio_index, "stream stream window",
                fb_docs=3, fb_terms=3, alpha=1.0, beta=0.75)
    want = _rocchio_oracle("stream stream window", alpha=1.0, beta=0.75,
                           fb_docs=3, fb_terms=3)
    assert [r.doc_id for r in rows] == [d for d, _ in want]
    for r, (_, s) in zip(rows, want):
        assert r.score == pytest.approx(s, abs=1e-9)


def test_rocchio_gamma_needs_nr_results(spark, rocchio_index):
    fb = spark.createDataFrame([("q1", "d1", 1.0)],
                               "query_id string, doc_id string, score double")
    with pytest.raises(ValueError, match="nr_results"):
        estimate_rocchio_terms(spark, rocchio_index, fb,
                               {"q1": ["stream"]}, gamma=0.5)
