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


class TestReindex:
    def test_reindex_excludes_deleted_and_cuts_over(self, spark, tmp_path):
        from patapsco_spark.operators.deletes import delete_docs
        from patapsco_spark.operators.indexer import build_index, reindex

        v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
        reg = str(tmp_path)
        docs = spark.createDataFrame(
            [("d1", "Alpha Body Text", "eng"),
             ("d2", "beta body text", "eng"),
             ("d3", "gamma body text", "eng")],
            "id string, text string, lang string")
        build_index(spark, docs, v1, IndexConfig(text=RAW, num_shards=1))
        delete_docs(spark, v1, ["d2"])
        aliases.set_alias(reg, "prod", v1)

        # reindex under a DIFFERENT analyzer (lowercase off) + cutover
        cfg2 = IndexConfig(text=TextConfig(stem=None, stopwords=None,
                                           lowercase=False), num_shards=1)
        reindex(spark, v1, v2, cfg2, registry=reg, alias="prod")
        assert aliases.resolve_alias(reg, "prod") == v2

        # the new analyzer is live through the alias: 'Alpha' now matches
        # case-sensitively, and the tombstoned d2 did NOT resurrect
        live = aliases.resolve_alias(reg, "prod")
        got = {r["doc_id"] for r in search_texts(
            spark, live, [("q", "Alpha")], RetrieveConfig(k=5),
            text_cfg=cfg2.text).collect()}
        assert got == {"d1"}
        # lowercase 'body' exists only in d2 (dead) and d3 under the
        # case-sensitive analyzer (d1 has 'Body') — d2 must NOT resurrect
        body = {r["doc_id"] for r in search_texts(
            spark, live, [("q", "body")], RetrieveConfig(k=5),
            text_cfg=cfg2.text).collect()}
        assert body == {"d3"}

    def test_reindex_without_raw_text_refuses(self, spark, tmp_path):
        from patapsco_spark.operators.indexer import build_index, reindex

        v1 = str(tmp_path / "noraw")
        docs = spark.createDataFrame(
            [("d1", "alpha body", "eng")],
            "id string, text string, lang string")
        build_index(spark, docs, v1,
                    IndexConfig(text=RAW, num_shards=1, store_raw=False))
        with pytest.raises(ValueError, match="stores no raw text"):
            reindex(spark, v1, str(tmp_path / "v2"),
                    IndexConfig(text=RAW, num_shards=1))

    def test_reindex_refuses_appended_index(self, spark, tmp_path):
        # an index whose manifest census exceeds its analyzed store (the
        # streaming-append state) must refuse: reindexing from the store
        # would silently drop every appended doc
        import json
        import pathlib

        from patapsco_spark.operators.indexer import build_index, reindex

        v1 = str(tmp_path / "appended")
        docs = spark.createDataFrame(
            [("d1", "alpha body", "eng"), ("d2", "beta body", "eng")],
            "id string, text string, lang string")
        build_index(spark, docs, v1, IndexConfig(text=RAW, num_shards=1))
        man = pathlib.Path(v1) / "_manifest.json"
        doc = json.loads(man.read_text())
        key = "num_docs" if "num_docs" in doc.get("config", {}) else None
        # bump the census the way an append's manifest commit does
        tgt = doc["config"] if key else doc["metrics"]
        tgt["num_docs"] = int(tgt["num_docs"]) + 3
        man.write_text(json.dumps(doc))
        with pytest.raises(ValueError, match="appended documents"):
            reindex(spark, v1, str(tmp_path / "v2"),
                    IndexConfig(text=RAW, num_shards=1))


def _race_writer(args):
    reg, i = args
    from patapsco_spark.plans import aliases as al
    for j in range(5):
        al.set_alias(reg, f"a{i}_{j}", f"/idx/{i}/{j}")
    return i


class TestRegistryConcurrency:
    def test_different_alias_writers_never_lose_updates(self, tmp_path):
        # the whole-registry read-modify-write is flocked: 6 processes
        # x 5 aliases each, every one must survive (the lost-update race
        # the CAS alone cannot see — it only guards same-alias swaps)
        import multiprocessing as mp
        reg = str(tmp_path)
        with mp.get_context("spawn").Pool(6) as pool:
            pool.map(_race_writer, [(reg, i) for i in range(6)])
        got = aliases.list_aliases(reg)
        assert len(got) == 30
        assert got["a3_2"] == "/idx/3/2"
