"""Sequence packing (round 5): scale-safe global prefix sum vs the
closed-form layout, window math, and edge cases."""

import pytest

from patapsco_spark.operators.packing import pack_sequences


class TestPackSequences:
    def test_layout_matches_closed_form(self, spark):
        # docs of 3, 5, 0, 7 tokens in id order, sep=1:
        # offsets: 0, 4, 10, 11 (each advances n+1)
        docs = spark.createDataFrame([
            (1, "a b c"), (2, "d e f g h"), (3, "   "), (4, "i j k l m n o"),
        ], "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               pack_sequences(docs, seq_len=4).collect()}
        assert [out[i]["offset"] for i in (1, 2, 3, 4)] == [0, 4, 10, 11]
        assert [out[i]["n_tokens"] for i in (1, 2, 3, 4)] == [3, 5, 0, 7]
        # doc 2 spans tokens 4..8 -> sequences 1..2; empty doc 3 claims
        # the window at its own offset only
        assert (out[2]["first_seq"], out[2]["last_seq"]) == (1, 2)
        assert (out[3]["first_seq"], out[3]["last_seq"]) == (2, 2)
        assert (out[4]["first_seq"], out[4]["last_seq"]) == (2, 4)

    def test_null_text_advances_like_empty(self, spark):
        # regression: a NULL text row got NULL n_tokens (size(split(NULL))),
        # every sum ignored it, and all downstream offsets shifted by its
        # missing separator — NULL must behave exactly like an empty doc
        docs = spark.createDataFrame([
            (1, "a b c"), (2, None), (3, "d e"),
        ], "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               pack_sequences(docs, seq_len=4).collect()}
        assert out[2]["n_tokens"] == 0
        assert [out[i]["offset"] for i in (1, 2, 3)] == [0, 4, 5]
        assert out[2]["last_seq"] is not None

    def test_exact_boundary_does_not_claim_next(self, spark):
        # doc of 4 tokens at offset 0 with seq_len 4: last own token is
        # index 3 -> last_seq 0, not 1
        docs = spark.createDataFrame([(1, "a b c d"), (2, "e")],
                                     "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               pack_sequences(docs, seq_len=4).collect()}
        assert (out[1]["first_seq"], out[1]["last_seq"]) == (0, 0)
        assert out[2]["offset"] == 5

    def test_matches_single_window_plan(self, spark):
        # the scale-safe two-phase sum must equal the naive global window
        import random
        rng = random.Random(7)
        rows = [(i, " ".join("tok" for _ in range(rng.randrange(0, 40))))
                for i in range(500)]
        docs = spark.createDataFrame(rows, "doc_id long, text string") \
                    .repartition(16)
        got = {r["doc_id"]: (r["offset"], r["first_seq"], r["last_seq"])
               for r in pack_sequences(docs, seq_len=128).collect()}
        acc = {}
        off = 0
        for i, text in rows:
            n = len([t for t in text.split() if t])
            acc[i] = (off, off // 128, max(off, off + n - 1) // 128)
            off += n + 1
        assert got == acc

    def test_bad_seq_len(self, spark):
        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            pack_sequences(docs, seq_len=0)
