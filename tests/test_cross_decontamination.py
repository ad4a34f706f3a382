"""Cross-corpus fuzzy decontamination (operators/dedup.py): an edited
benchmark copy is caught, unrelated docs are not, within-side near-dups
never surface, and colliding id spaces stay distinct."""

import pytest

from patapsco_spark.operators.dedup import cross_decontamination

BASE = ("the quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing in the tall green trees every single morning")

TRAIN = [
    ("t1", BASE),
    ("t2", BASE),  # train-train near-dup: must NOT appear in the output
    ("t3", "completely different text about spark shuffles and parquet "
           "row groups and columnar compression and partition pruning"),
]
EVAL = [
    # t1 with the first two words dropped — a lightly-edited copy
    ("e1", BASE.split(" ", 2)[2]),
    ("e2", "unrelated benchmark question about astronomy and the orbital "
           "period of jupiter moons and kepler laws of planetary motion"),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TRAIN, "doc_id string, text string")
    e = spark.createDataFrame(EVAL, "doc_id string, text string")
    return t, e


def test_edited_copy_caught_unrelated_not(spark, frames):
    t, e = frames
    out = cross_decontamination(t, e, threshold=0.7, shingle=3).collect()
    pairs = {(r["train_id"], r["eval_id"]) for r in out}
    assert ("t1", "e1") in pairs and ("t2", "e1") in pairs
    assert all(ev != "e2" for _, ev in pairs)   # unrelated eval doc clean
    # only cross-side pairs: train ids on the left, eval ids on the right
    assert all(tr.startswith("t") and ev.startswith("e")
               for tr, ev in pairs)
    for r in out:
        assert 0.7 <= r["jaccard"] <= 1.0


def test_colliding_id_spaces_stay_distinct(spark):
    # same external id "x" on both sides must not alias into one doc
    t = spark.createDataFrame([("x", BASE)], "doc_id string, text string")
    e = spark.createDataFrame([("x", BASE)], "doc_id string, text string")
    out = cross_decontamination(t, e, threshold=0.9, shingle=3).collect()
    assert [(r["train_id"], r["eval_id"], r["jaccard"])
            for r in out] == [("x", "x", 1.0)]
