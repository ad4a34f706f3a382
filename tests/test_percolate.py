"""Percolation (operators/percolate.py) — reverse search: stored boolean
queries compiled to Catalyst predicates over the analyzed token array.
Match semantics must equal search(): for each (doc, query) pair, percolate
says "match" iff indexing the docs and running the query returns that doc.
That identity is pinned directly against search_texts on the same corpus.
"""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.percolate import percolate_texts
from patapsco_spark.operators.queryparse import ParseError
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("p1", "Alpha beta gamma pad pad", "eng"),
    ("p2", "alpha delta pad pad pad", "eng"),
    ("p3", "beta gamma delta pad pad", "eng"),
    ("p4", "gamma pad pad pad pad", "eng"),
    ("p5", "alpha beta delta pad pad", "eng"),
]

QUERIES = [
    ("sq1", "alpha AND beta NOT delta"),
    ("sq2", "gamma delta"),                      # OR
    ("sq3", "gamma NOT (alpha OR delta)"),       # nested NOT group
    ("sq4", '"beta gamma" AND pad'),             # phrase → bag-of-words
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "id string, text string, lang string")


def _pairs(df):
    return {(r["doc_id"], r["query_id"]) for r in df.collect()}


def test_matches(spark, docs):
    got = _pairs(percolate_texts(docs, QUERIES, text_cfg=RAW))
    assert got == {
        ("p1", "sq1"),                       # alpha+beta, no delta
        ("p1", "sq2"), ("p2", "sq2"), ("p3", "sq2"),
        ("p4", "sq2"), ("p5", "sq2"),        # any of gamma/delta
        ("p4", "sq3"),                       # gamma, no alpha/delta
        # phrase → bag-of-words: ANY of beta/gamma (plus pad) matches
        ("p1", "sq4"), ("p3", "sq4"), ("p4", "sq4"), ("p5", "sq4"),
    }


def test_identity_with_search(spark, docs, tmp_path):
    """percolate(docs, q) ≡ {(d, q) : d ∈ search(index(docs), q)}."""
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, IndexConfig(text=RAW, num_shards=2))
    want = set()
    for qid, q in QUERIES:
        res = search_texts(spark, idx, [(qid, q)], RetrieveConfig(k=100),
                           text_cfg=RAW, mode="boolean")
        want |= {(r["doc_id"], qid) for r in res.collect()}
    got = _pairs(percolate_texts(docs, QUERIES, text_cfg=RAW))
    assert got == want


def test_min_should_match(spark, docs):
    got = _pairs(percolate_texts(docs, [("m", "alpha beta gamma")],
                                 text_cfg=RAW, min_should_match=2))
    assert got == {("p1", "m"), ("p3", "m"), ("p5", "m")}


def test_index_backed_expansions_rejected(spark, docs):
    with pytest.raises(ParseError, match="index-free"):
        percolate_texts(docs, [("w", "alp*")], text_cfg=RAW).collect()
    with pytest.raises(ParseError, match="index-free"):
        percolate_texts(docs, [("f", "alpha~2")], text_cfg=RAW).collect()


def test_no_shuffle_no_python_in_plan(spark, docs):
    plan = percolate_texts(docs, QUERIES, text_cfg=RAW)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_indexed_identity(spark, docs):
    """percolate_indexed ≡ percolate on every query shape the module
    supports (MUST/SHOULD/NOT, nested groups, phrases, mm)."""
    from patapsco_spark.operators.percolate import percolate_indexed
    from patapsco_spark.operators.queryparse import parse_query

    plans = [parse_query(qid, q, mode="boolean") for qid, q in QUERIES]
    want = _pairs(percolate_texts(docs, QUERIES, text_cfg=RAW))
    got = _pairs(percolate_indexed(docs, plans, text_cfg=RAW))
    assert got == want

    mm_plans = [parse_query("m", "alpha beta gamma", mode="boolean")]
    got_mm = _pairs(percolate_indexed(docs, mm_plans, text_cfg=RAW,
                                      min_should_match=2))
    assert got_mm == {("p1", "m"), ("p3", "m"), ("p5", "m")}


def test_indexed_identity_randomized(spark):
    """Randomized corpus × generated boolean queries: the two paths must
    agree pair-for-pair."""
    import random

    from patapsco_spark.operators.percolate import percolate_indexed
    from patapsco_spark.operators.queryparse import parse_query

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(f"d{i}", " ".join(rng.choices(vocab, k=rng.randint(3, 9))), "eng")
            for i in range(60)]
    df = spark.createDataFrame(docs, "id string, text string, lang string")

    def gen_query():
        ts = rng.sample(vocab, 4)
        shape = rng.randrange(4)
        if shape == 0:
            return f"{ts[0]} AND {ts[1]} NOT {ts[2]}"
        if shape == 1:
            return f"{ts[0]} {ts[1]} {ts[2]}"
        if shape == 2:
            return f"{ts[0]} AND ({ts[1]} OR {ts[2]}) NOT ({ts[3]})"
        return f'"{ts[0]} {ts[1]}" OR {ts[2]}'

    queries = [(f"g{i}", gen_query()) for i in range(25)]
    plans = [parse_query(qid, q, mode="boolean") for qid, q in queries]
    want = _pairs(percolate_texts(df, queries, text_cfg=RAW))
    got = _pairs(percolate_indexed(df, plans, text_cfg=RAW))
    assert got == want
    assert len(want) > 0


def test_streaming_percolation(spark, tmp_path):
    """percolate is a narrow transformation, so it runs unchanged inside a
    Structured Streaming micro-batch — the crawl-alerting deployment shape.
    Two files → availableNow processes them as micro-batches; the memory
    sink must hold exactly the batch-mode pairs."""
    import os

    src = str(tmp_path / "pdocs")
    os.makedirs(src, exist_ok=True)
    half1, half2 = DOCS[:3], DOCS[3:]
    for name, rows in (("b0.parquet", half1), ("b1.parquet", half2)):
        df = spark.createDataFrame(rows,
                                   "id string, text string, lang string")
        df.coalesce(1).write.mode("overwrite").parquet(src + "/_stage")
        import glob
        import shutil
        part = glob.glob(src + "/_stage/part-*.parquet")[0]
        shutil.copy(part, os.path.join(src, name))
    shutil.rmtree(src + "/_stage")

    stream = (spark.readStream
              .schema("id string, text string, lang string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/*.parquet"))
    out = percolate_texts(stream, QUERIES, text_cfg=RAW)
    q = (out.writeStream.format("memory").queryName("perc_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = _pairs(spark.table("perc_out"))
    batch_df = spark.createDataFrame(DOCS,
                                     "id string, text string, lang string")
    want = _pairs(percolate_texts(batch_df, QUERIES, text_cfg=RAW))
    assert got == want and len(want) > 0


def test_triggers_extraction():
    from patapsco_spark.operators.percolate import _extract_triggers
    from patapsco_spark.operators.queryparse import parse_query

    def trig(q):
        return _extract_triggers(parse_query("t", q, mode="boolean").clauses)

    # MUST present → smallest single must-clause extraction
    assert trig("alpha AND beta gamma") in ({"alpha"}, {"beta"})
    # pure SHOULD → union
    assert trig("alpha beta") == {"alpha", "beta"}
    # nested group as the only MUST
    assert trig("(alpha OR beta) AND (gamma OR delta OR eps)") == \
        {"alpha", "beta"}
    # only MUST_NOT → can never match → empty
    assert trig("NOT alpha") == set()
    # phrase members are all triggers (bag-of-words semantics)
    assert trig('"alpha beta"') == {"alpha", "beta"}
