"""Index aliases — atomic reindex cutover (plans/aliases.py).

The contract under test: a search through the alias sees exactly one
committed index at any time; the swap is compare-and-set so a concurrent
cutover fails loudly instead of silently undoing the winner.
"""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts
from patapsco_spark.plans import aliases

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("alias_idx")
    v1, v2 = str(base / "v1"), str(base / "v2")
    build_index(spark, spark.createDataFrame(
        [("d1", "old corpus only", "eng")],
        "id string, text string, lang string"), v1,
        IndexConfig(text=RAW, num_shards=1))
    build_index(spark, spark.createDataFrame(
        [("d1", "new corpus only", "eng")],
        "id string, text string, lang string"), v2,
        IndexConfig(text=RAW, num_shards=1))
    return str(base), v1, v2


def _hits(spark, idx, q):
    res = search_texts(spark, idx, [("q", q)], RetrieveConfig(k=5),
                       text_cfg=RAW)
    return {r["doc_id"] for r in res.collect()}


class TestAliases:
    def test_cutover_repoints_searches(self, spark, two_indexes):
        reg, v1, v2 = two_indexes
        aliases.set_alias(reg, "prod", v1)
        assert _hits(spark, aliases.resolve_alias(reg, "prod"), "old") == \
            {"d1"}
        assert _hits(spark, aliases.resolve_alias(reg, "prod"), "new") == \
            set()
        aliases.swap_alias(reg, "prod", v2, expect=v1)
        assert _hits(spark, aliases.resolve_alias(reg, "prod"), "new") == \
            {"d1"}
        assert _hits(spark, aliases.resolve_alias(reg, "prod"), "old") == \
            set()

    def test_stale_swap_refused(self, two_indexes):
        reg, v1, v2 = two_indexes
        aliases.set_alias(reg, "cas", v1)
        aliases.swap_alias(reg, "cas", v2, expect=v1)  # winner
        with pytest.raises(RuntimeError, match="refusing the swap"):
            aliases.swap_alias(reg, "cas", v1, expect=v1)  # loser
        assert aliases.resolve_alias(reg, "cas") == v2

    def test_swap_of_unset_alias_refused(self, two_indexes):
        reg, v1, _v2 = two_indexes
        with pytest.raises(RuntimeError, match="points at None"):
            aliases.swap_alias(reg, "ghost", v1, expect=v1)

    def test_unknown_resolve_and_drop_are_loud(self, two_indexes):
        reg, v1, _v2 = two_indexes
        with pytest.raises(KeyError, match="unknown alias"):
            aliases.resolve_alias(reg, "nope")
        aliases.set_alias(reg, "temp", v1)
        aliases.drop_alias(reg, "temp")
        with pytest.raises(KeyError):
            aliases.resolve_alias(reg, "temp")
        with pytest.raises(KeyError):
            aliases.drop_alias(reg, "temp")

    def test_registry_lists_committed_state(self, two_indexes):
        reg, v1, v2 = two_indexes
        aliases.set_alias(reg, "a1", v1)
        aliases.set_alias(reg, "a2", v2)
        got = aliases.list_aliases(reg)
        assert got["a1"] == v1 and got["a2"] == v2
