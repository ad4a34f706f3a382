"""Shard-count invariance — the distributed-correctness property: the
SAME corpus indexed at 1 shard and at 3 shards must answer every query
identically (scores and ids; shard boundaries are an execution detail,
never a semantics input). Covers the operators added in the round-5
continuation sessions: phrase-prefix, unordered NEAR / NOT-NEAR, and
the blocked sorted view.
"""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.facets import build_value_sidecar
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import (phrase_prefix_plan,
                                                 span_near_plan,
                                                 span_not_plan)
from patapsco_spark.operators.retrieve import search
from patapsco_spark.operators.sortedview import (build_sorted_view,
                                                 sorted_topk)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [(f"d{i:02d}",
         " ".join(["alpha", "beta", "gamma", "delta"][j % 4]
                  for j in range(i, i + 3 + i % 5)),
         "eng") for i in range(17)]


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    out = []
    for shards in (1, 3):
        path = str(tmp_path_factory.mktemp(f"inv{shards}"))
        df = spark.createDataFrame(
            DOCS, "id string, text string, lang string")
        build_index(spark, df, path,
                    IndexConfig(text=RAW, num_shards=shards,
                                positions=True))
        vals = spark.createDataFrame(
            [(d[0], float(len(d[1]))) for d in DOCS], "id string, v double")
        build_value_sidecar(spark, path, vals, "v",
                            id_col="id", value_col="v")
        build_sorted_view(spark, path, "v", ascending=False, block_size=4)
        out.append(path)
    return out


def _srch(spark, idx, plan):
    return sorted((r["doc_id"], r["rank"], r["score"]) for r in
                  search(spark, idx, [plan], RetrieveConfig(k=30))
                  .collect())


class TestShardInvariance:
    def test_span_near_and_not(self, spark, pair):
        i1, i3 = pair
        for plan_of in (lambda: span_near_plan("q", [("alpha", "gamma", 1)]),
                        lambda: span_not_plan("q", [("alpha", "beta", 0)])):
            a, b = _srch(spark, i1, plan_of()), _srch(spark, i3, plan_of())
            assert a == b and a

    def test_phrase_prefix(self, spark, pair):
        i1, i3 = pair
        plan = lambda: phrase_prefix_plan("q", ["alpha"], "be")  # noqa: E731
        a, b = _srch(spark, i1, plan()), _srch(spark, i3, plan())
        assert a == b and a

    def test_sorted_view(self, spark, pair):
        i1, i3 = pair
        def run(idx):
            return sorted((r["doc_id"], r["rank"], r["value"]) for r in
                          sorted_topk(spark, idx, "v", k=9).collect())
        a, b = run(i1), run(i3)
        assert a == b and len(a) == 9
