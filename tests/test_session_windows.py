"""Session windows (streaming/windows.py sessionize): events of one key
merge while consecutive gaps are strictly less than `gap`; session_end =
last event time + gap; the same plan runs on batch and streams."""

import datetime
import glob
import os
import shutil

from patapsco_spark.streaming.windows import sessionize

SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _ts(h, m=0, s=0):
    return datetime.datetime(2026, 1, 1, h, m, s)


def _sessions(spark, rows, gap="30 minutes"):
    df = spark.createDataFrame(rows, SCHEMA)
    out = sessionize(df, gap=gap).collect()
    return {(r["user_id"], r["session_start"], r["session_end"]):
            (r["n"], r["sum_value"]) for r in out}


def test_gap_boundaries_golden(spark):
    """diff ≤ gap merges (an event landing exactly at the previous
    session's expiry instant still extends it — Spark's inclusive merge);
    only diff > gap starts a new session; session_end = last event + gap."""
    rows = [
        (1, 7, _ts(9, 0), 1.0),
        (2, 7, _ts(9, 30), 2.0),      # exactly 30m → still merges
        (3, 7, _ts(10, 0, 1), 4.0),   # 30m01s > gap → NEW session
    ]
    got = _sessions(spark, rows)
    assert got == {
        (7, _ts(9, 0), _ts(10, 0)): (2, 3.0),
        (7, _ts(10, 0, 1), _ts(10, 30, 1)): (1, 4.0),
    }


def test_keys_do_not_merge(spark):
    """Sessions are per-key: simultaneous events of different users stay
    separate sessions."""
    rows = [(1, 1, _ts(9), 1.0), (2, 2, _ts(9), 1.0), (3, 1, _ts(9, 10), 1.0)]
    got = _sessions(spark, rows)
    assert len(got) == 2
    assert got[(1, _ts(9), _ts(9, 40))] == (2, 2.0)
    assert got[(2, _ts(9), _ts(9, 30))] == (1, 1.0)


def _write_rows(spark, path, rows, fname):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(os.path.join(path, "_stage"))
    os.makedirs(path, exist_ok=True)
    src = glob.glob(os.path.join(path, "_stage", "part-*.parquet"))[0]
    shutil.copy(src, os.path.join(path, fname))


def test_streaming_complete_equals_batch_plan(spark, tmp_path):
    """The identical sessionize plan over a stream (complete mode, so the
    watermark finalizes nothing away) equals the batch result — sessions
    spanning micro-batch boundaries must merge in the state store."""
    src = str(tmp_path / "events")
    rows = [(i, i % 3, _ts(9 + (i // 6), (7 * i) % 60), float(i))
            for i in range(36)]
    # split across two files → ≥2 micro-batches with maxFilesPerTrigger=1
    _write_rows(spark, src, rows[:18], "b0.parquet")
    _write_rows(spark, src, rows[18:], "b1.parquet")

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = sessionize(stream, gap="20 minutes", watermark="10 minutes")
    q = (agg.writeStream.format("memory").queryName("sess_complete")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("sess_complete").collect()}

    batch = sessionize(spark.read.schema(SCHEMA).parquet(src + "/*.parquet"),
                       gap="20 minutes")
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0
    # at least one session really crossed the micro-batch boundary
    assert any(r[2] > _ts(9 + (17 // 6), (7 * 17) % 60) and r[1] < _ts(12)
               for r in want)


def test_streaming_append_finalizes_past_watermark(spark, tmp_path):
    """Append mode emits a session only once the watermark passes its end:
    after a far-future event advances the watermark, the early sessions
    appear exactly once and match the batch plan for the early rows."""
    src = str(tmp_path / "events2")
    early = [(1, 1, _ts(9, 0), 1.0), (2, 1, _ts(9, 5), 2.0),
             (3, 2, _ts(9, 1), 4.0)]
    _write_rows(spark, src, early, "b0.parquet")
    _write_rows(spark, src, [(9, 9, _ts(23, 0), 0.0)], "b1.parquet")

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = sessionize(stream, gap="15 minutes", watermark="5 minutes")
    q = (agg.writeStream.format("memory").queryName("sess_append")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("sess_append").collect()
           if r["user_id"] != 9}
    want = {tuple(r) for r in
            sessionize(spark.createDataFrame(early, SCHEMA),
                       gap="15 minutes").collect()}
    assert got == want and len(want) == 2
