"""Near-dup cluster resolution (round 5): connected components over a
verified pair frame + keep-one representative selection — the step that
turns pairwise near-dup output into an actual dedup decision."""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators.dedup import (connected_components,
                                            dedup_clusters,
                                            token_jaccard_pairs)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


class TestConnectedComponents:
    def test_chain_merges_transitively(self, spark):
        # A~B, B~C, C~D but never A~D: one component labeled min=1
        cc = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
        got = {r["node"]: r["comp"] for r in cc.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_separate_components(self, spark):
        cc = connected_components(
            _pairs(spark, [(10, 20), (30, 40), (40, 50)]))
        got = {r["node"]: r["comp"] for r in cc.collect()}
        assert got == {10: 10, 20: 10, 30: 30, 40: 30, 50: 30}

    def test_order_independent(self, spark):
        # min label must flow against edge direction too (50,1) merges all
        cc = connected_components(
            _pairs(spark, [(20, 30), (30, 50), (50, 1)]))
        got = {r["node"]: r["comp"] for r in cc.collect()}
        assert set(got.values()) == {1}

    def test_string_ids_chain_converges(self, spark):
        # regression: convergence was tested via F.sum(comp), which casts
        # string labels to double -> NULL, and NULL==NULL exited after
        # round 1 with the chain half-merged (d labeled 'b'). Node ids in
        # real corpora ARE strings (the index schema is `id string`).
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")],
            "id_a string, id_b string")
        cc = connected_components(pairs)
        got = {r["node"]: r["comp"] for r in cc.collect()}
        assert got == {n: "a" for n in "abcdef"}

    def test_empty_pairs(self, spark):
        assert connected_components(_pairs(spark, [])).count() == 0

    def test_nonconvergence_raises(self, spark, monkeypatch):
        # diameter-3 chain cannot settle in one round; force the
        # distributed rounds (the driver fast path always converges)
        from patapsco_spark.operators import dedup as dd
        monkeypatch.setattr(dd, "CC_DRIVER_EDGE_CAP", 0)
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), max_iter=1)

    def test_driver_and_distributed_paths_agree(self, spark, monkeypatch):
        import random

        from patapsco_spark.operators import dedup as dd
        rng = random.Random(9)
        pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
        pairs = [(a, b) for a, b in pairs if a != b]
        fast = {(r["node"], r["comp"])
                for r in connected_components(_pairs(spark, pairs)).collect()}
        monkeypatch.setattr(dd, "CC_DRIVER_EDGE_CAP", 0)
        slow = {(r["node"], r["comp"])
                for r in connected_components(_pairs(spark, pairs)).collect()}
        assert fast == slow


class TestDedupClusters:
    def test_representative_and_size(self, spark):
        out = dedup_clusters(
            _pairs(spark, [(7, 3), (3, 9), (100, 200)])).collect()
        got = {r["doc_id"]: (r["cluster"], r["cluster_size"])
               for r in out}
        assert got == {3: (3, 3), 7: (3, 3), 9: (3, 3),
                       100: (100, 2), 200: (100, 2)}
        # keep-one policy: exactly one doc per cluster has doc_id == cluster
        keeps = [d for d, (c, _) in got.items() if d == c]
        assert sorted(keeps) == [3, 100]

    def test_end_to_end_from_jaccard_pairs(self, spark):
        # three mutually-similar docs + one unrelated: the pair frame may
        # miss one of the three edges, the cluster must still be whole
        docs = spark.createDataFrame([
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "a quick brown fox jumps over the lazy dog today"),
            (4, "completely different text about spark query engines"),
        ], "doc_id long, text string")
        pairs = token_jaccard_pairs(docs, threshold=0.3, shingle=3)
        out = dedup_clusters(pairs).collect()
        clustered = {r["doc_id"] for r in out}
        assert clustered == {1, 2, 3}
        assert {r["cluster"] for r in out} == {1}
        assert all(r["cluster_size"] == 3 for r in out)


class TestJaccardBoundary:
    def test_pair_at_exact_threshold_is_kept(self, spark):
        # regression: PPJoin's alpha bound used float ceil, which overshoots
        # the exact rational ceiling at some (threshold, size) points —
        # ceil(0.8/1.8 * 63) read 29 instead of 28 — silently dropping
        # pairs whose Jaccard equals the threshold exactly (28/35 = 0.8)
        shared = " ".join(f"w{i:02d}" for i in range(28))
        extra = " ".join(f"x{i}" for i in range(7))
        docs = spark.createDataFrame(
            [(1, shared), (2, shared + " " + extra)],
            "doc_id long, text string")
        pairs = token_jaccard_pairs(docs, threshold=0.8, shingle=1).collect()
        assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
        assert abs(pairs[0]["jaccard"] - 0.8) < 1e-9


class TestLineDedup:
    def test_boilerplate_removed_structure_kept(self, spark):
        from patapsco_spark.operators.dedup import line_dedup
        banner = "COOKIES ACCEPT"
        docs = spark.createDataFrame([
            (1, f"{banner}\nalpha beta\n\ngamma"),
            (2, f"{banner}\ndelta"),
            (3, f"{banner}\nalpha beta"),   # 'alpha beta' in 2 docs only
            (4, "epsilon\n  COOKIES ACCEPT  "),  # trimmed form matches
        ], "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               line_dedup(docs, min_docs=3).collect()}
        assert got[1]["clean_text"] == "alpha beta\n\ngamma"
        assert (got[1]["n_lines"], got[1]["n_removed"]) == (4, 1)
        assert got[2]["clean_text"] == "delta"
        assert got[3]["clean_text"] == "alpha beta"  # below min_docs: kept
        assert got[4]["clean_text"] == "epsilon"
        assert got[4]["n_removed"] == 1

    def test_all_lines_removed_keeps_row(self, spark):
        from patapsco_spark.operators.dedup import line_dedup
        docs = spark.createDataFrame(
            [(i, "nav bar") for i in range(1, 4)],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in line_dedup(docs, min_docs=2).collect()}
        assert len(got) == 3
        for r in got.values():
            assert (r["n_lines"], r["n_removed"], r["clean_text"]) \
                == (1, 1, "")


class TestSimhashAndExactEdges:
    def test_simhash_max_hamming_validated(self, spark):
        from patapsco_spark.operators.dedup import simhash_near_pairs
        docs = spark.createDataFrame([(1, "a b"), (2, "a c")],
                                     "doc_id long, text string")
        with pytest.raises(ValueError, match="4-chunk blocking"):
            simhash_near_pairs(docs, max_hamming=4)

    def test_exact_duplicates_ignore_null_text(self, spark):
        # regression: md5(NULL) grouped ALL null-text docs into one fake
        # byte-identical group; a keep-one policy would delete them
        from patapsco_spark.operators.dedup import exact_duplicates
        docs = spark.createDataFrame(
            [(1, None), (2, None), (3, "same"), (4, "same")],
            "doc_id long, text string")
        got = exact_duplicates(docs).collect()
        assert len(got) == 1 and got[0]["canonical_id"] == 3
