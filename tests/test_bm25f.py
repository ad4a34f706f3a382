"""BM25F (operators/bm25f.py): single-field reduction to BM25 (exact
algebraic identity), multi-field hand-computed golden, and the tf-frame
building block (decode identity + tombstone masking)."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.bm25f import search_bm25f, term_postings_frame
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

# (id, title, body) — titles short, bodies longer, some terms title-only
DOCS = [
    ("d1", "alpha news", "beta gamma pad pad pad pad"),
    ("d2", "beta report", "alpha alpha pad pad pad pad pad"),
    ("d3", "pad digest", "gamma pad pad pad"),
    ("d4", "alpha beta", "pad pad pad pad pad pad pad pad"),
]
QUERIES = [("q1", "alpha beta"), ("q2", "gamma")]
K1, B = 0.9, 0.4


@pytest.fixture(scope="module")
def idxs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bm25f")
    paths = {}
    for fld, col in (("title", 1), ("body", 2)):
        p = str(root / fld)
        df = spark.createDataFrame([(d[0], d[col], "eng") for d in DOCS],
                                   "id string, text string, lang string")
        build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
        paths[fld] = p
    return paths


def _brute_bm25f(weights, bs):
    """Reference implementation: plain Python over DOCS."""
    from patapsco_spark.functions.smallfloat import quantize_length
    import numpy as np

    fields = {"title": 1, "body": 2}
    toks = {f: {d[0]: d[i].split() for d in DOCS} for f, i in fields.items()}
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
                tfn = 0.0
                for f in sorted(fields):
                    tf = toks[f][did].count(t)
                    if tf:
                        tfn += (weights[f] * tf
                                / (1 - bs[f] + bs[f] * dlq(f, did) / avg[f]))
                if tfn == 0.0:
                    continue
                df = sum(1 for e in DOCS
                         if t in e[1].split() or t in e[2].split())
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tfn / (K1 + tfn)
            if s > 0.0:
                scores[did] = s
        out[qid] = scores
    return out


def test_multi_field_golden(spark, idxs):
    weights = {"title": 2.0, "body": 1.0}
    bs = {"title": B, "body": B}
    res = search_bm25f(spark, idxs, QUERIES, text_cfg=RAW,
                       weights=weights, field_b=bs, k1=K1, k=10)
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in res.collect()}
    want = _brute_bm25f(weights, bs)
    assert {q for q, _ in got} == {q for q in want if want[q]}
    for (q, d), s in got.items():
        assert math.isclose(s, want[q][d], rel_tol=1e-12), (q, d)
    # title weight dominates: d4 (both terms in title) must outrank d1/d2
    q1 = sorted(((r, d) for (q, d), s in got.items() if q == "q1"
                 for r in [got[(q, d)]]), reverse=True)
    assert q1[0][1] == "d4"


def test_single_field_reduces_to_bm25(spark, idxs):
    """w=1, one field ⇒ BM25F ≡ BM25 algebraically; scores must agree to
    float-roundoff (different op order) and ranks exactly."""
    res_f = search_bm25f(spark, {"body": idxs["body"]}, QUERIES,
                         text_cfg=RAW, k1=K1, k=10).collect()
    res_b = search_texts(spark, idxs["body"], QUERIES,
                         RetrieveConfig(k=10, k1=K1, b=B),
                         text_cfg=RAW).collect()
    fm = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"]) for r in res_f}
    bm = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"]) for r in res_b}
    assert fm.keys() == bm.keys()
    for key, (rank, score) in fm.items():
        assert rank == bm[key][0], key
        assert math.isclose(score, bm[key][1], rel_tol=1e-9), key


def test_tf_frame_decode_identity(spark, idxs):
    """term_postings_frame returns exactly the corpus term frequencies."""
    rows = term_postings_frame(spark, idxs["body"],
                               ["alpha", "gamma"]).collect()
    # resolve docids via norms
    norms = {r["docid"]: r["id"] for r in spark.read.parquet(
        f"{idxs['body']}/norms").collect()}
    got = {(r["term"], norms[r["docid"]]): r["tf"] for r in rows}
    assert got == {("alpha", "d2"): 2,
                   ("gamma", "d1"): 1, ("gamma", "d3"): 1}


def test_corpus_shape_mismatch_raises(spark, idxs, tmp_path):
    other = str(tmp_path / "other")
    df = spark.createDataFrame([("x1", "alpha", "eng")],
                               "id string, text string, lang string")
    build_index(spark, df, other, IndexConfig(text=RAW, num_shards=1))
    with pytest.raises(ValueError, match="corpus shape"):
        search_bm25f(spark, {"title": idxs["title"], "other": other},
                     QUERIES, text_cfg=RAW)


def test_deleted_docs_masked(spark, idxs, tmp_path):
    """Tombstoned docs vanish from the tf frame (and so from BM25F)."""
    import shutil

    from patapsco_spark.operators.deletes import delete_docs

    p = str(tmp_path / "bodydel")
    shutil.copytree(idxs["body"], p)
    delete_docs(spark, p, ["d1"])
    rows = term_postings_frame(spark, p, ["gamma"]).collect()
    norms = {r["docid"]: r["id"] for r in spark.read.parquet(
        f"{p}/norms").collect()}
    assert {norms[r["docid"]] for r in rows} == {"d3"}
