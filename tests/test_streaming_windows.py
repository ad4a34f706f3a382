"""Watermarked windowed aggregation + streaming dedup (streaming/windows.py):
streaming results must match the identical batch plan (complete mode), and
append mode must honor watermark semantics — finalized-window emission and
late-row dropping."""

import os
import time

import pytest
from pyspark.sql import functions as F

from patapsco_spark.streaming.windows import dedupe_stream, windowed_event_counts

SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _write_rows(spark, path, rows, fname):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(os.path.join(path, "_stage"))
    # single deterministic file per batch → one micro-batch per file with
    # maxFilesPerTrigger=1
    import glob
    import shutil
    os.makedirs(path, exist_ok=True)
    src = glob.glob(os.path.join(path, "_stage", "part-*.parquet"))[0]
    shutil.copy(src, os.path.join(path, fname))


def _ts(h, m=0):
    import datetime
    return datetime.datetime(2026, 1, 1, h, m)


def _run_stream(spark, src_dir, out_name, mode, max_files=None):
    reader = spark.readStream.schema(SCHEMA)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (agg.writeStream.format("memory").queryName(out_name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(out_name)


def test_streaming_complete_equals_batch_plan(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [(i, i % 3, _ts(9 + i % 4, 7 * i % 60), float(i)) for i in range(40)]
    _write_rows(spark, src, rows, "b0.parquet")

    got = {tuple(r) for r in _run_stream(spark, src, "win_complete",
                                         "complete").collect()}
    batch = windowed_event_counts(spark.read.parquet(src + "/b0.parquet"),
                                  window="1 hour", watermark="30 minutes")
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_append_mode_emits_finalized_windows_and_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "events2")
    # Spark's exact semantics, pinned: the watermark advances at batch END,
    # and a late row is only dropped once its window's state has been
    # EVICTED (a late row arriving while the state is still live is merged —
    # Spark guarantees no false drops, not eager drops). So the drop needs
    # 4 batches: b0 events at 09:xx; b1 at 13:00 (watermark → 12:30 after
    # b1); b2 at 13:10 (during b2 the 09:00 window is emitted and evicted);
    # b3 carries the LATE 09:30 row — state gone, window end < watermark →
    # dropped, and the already-emitted 09:00 window stays (2, 3.0).
    _write_rows(spark, src, [(1, 1, _ts(9, 10), 1.0), (2, 1, _ts(9, 20), 2.0)],
                "b0.parquet")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_rows(spark, src, [(3, 1, _ts(13, 0), 4.0)], "b1.parquet")
    time.sleep(1.1)
    _write_rows(spark, src, [(4, 1, _ts(13, 10), 4.0)], "b2.parquet")
    time.sleep(1.1)
    _write_rows(spark, src, [(5, 1, _ts(9, 30), 8.0)], "b3.parquet")

    got = _run_stream(spark, src, "win_append", "append", max_files=1).collect()
    by_window = {(r["window_start"].hour, r["user_id"]): (r["n"], r["sum_value"])
                 for r in got}
    assert by_window.get((9, 1)) == (2, 3.0)
    # the 13:00 window is never past the final watermark → not emitted
    assert (13, 1) not in by_window


def test_dedupe_stream_batch_and_streaming(spark, tmp_path):
    src = str(tmp_path / "events3")
    _write_rows(spark, src, [(1, 1, _ts(9), 1.0), (1, 1, _ts(9, 5), 1.0),
                             (2, 2, _ts(9, 10), 2.0)], "b0.parquet")
    time.sleep(1.1)
    _write_rows(spark, src, [(2, 2, _ts(9, 20), 2.0), (3, 3, _ts(9, 30), 3.0)],
                "b1.parquet")

    batch = dedupe_stream(spark.read.parquet(src))
    assert batch.count() == 3

    stream = (spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
              .parquet(src))
    q = (dedupe_stream(stream, watermark="1 hour")
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    ids = [r["event_id"] for r in spark.table("dedup_out").collect()]
    # event 2 appears in both micro-batches: the cross-batch seen-ids state
    # must suppress the second occurrence
    assert sorted(ids) == [1, 2, 3]
