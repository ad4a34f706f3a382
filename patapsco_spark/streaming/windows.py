"""Watermarked windowed aggregation + streaming dedup — the Structured
Streaming staples for event rollups with late data.

The reference has no streaming surface (its job layer is batch
map/reduce); these operators are the Spark-native growth path the engine
exposes alongside the incremental index appends (streaming/incremental.py).
Both are written so the SAME plan runs on a batch frame (a static
DataFrame ignores the watermark) — which is how their semantics are
oracle-verified exactly: the streaming result in complete mode must equal
the batch plan's result, and append mode must emit a watermark-finalized
subset of it.

Scale shape: a windowed count/sum is a single hash aggregation keyed on
(window, key) with partial map-side combine; state store size is bounded by
the watermark horizon (windows older than the watermark are evicted), so
state does not grow with stream length — the property that lets this run
forever on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "2 hours",
                          ts_col: str = "ts", key_col: str = "user_id",
                          value_col: str = "value") -> DataFrame:
    """Per-(window, key) event count + value sum, tumbling by default
    (``slide`` makes it sliding). On a streaming frame the watermark bounds
    both state retention and late-data admission: rows older than
    ``watermark`` behind the max seen event time are dropped, and in append
    output mode a window is emitted exactly once, when the watermark passes
    its end."""
    df = (events.withWatermark(ts_col, watermark)
          if events.isStreaming else events)
    win = F.window(ts_col, window, slide or window)
    return (df.groupBy(win.alias("win"), F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(value_col), 5).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    F.col(key_col), "n", "sum_value"))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours", ts_col: str = "ts",
               key_col: str = "user_id",
               value_col: str = "value") -> DataFrame:
    """Per-key session windows: consecutive events of one key merge into a
    session while each starts at most ``gap`` after the previous one (an
    event landing exactly at the expiry instant still extends — Spark's
    merge is inclusive, pinned in tests/test_session_windows.py); only a
    gap strictly greater than ``gap`` starts a new session.
    ``session_start`` is the first event time, ``session_end`` the LAST
    event time + gap (Spark's session_window contract — the instant the
    session would have expired).

    Built on the native ``F.session_window`` so the SAME plan runs on batch
    frames (oracle-verified against a gaps-and-islands SQL replay) and on
    streams, where the watermark both admits late data inside the horizon
    and finalizes a session once the watermark passes its end — state per
    key is one open session plus closed ones awaiting emission, evicted at
    the watermark, so state does not grow with stream length.

    Scale shape: one shuffle keyed on ``key_col``; within partitions Spark
    sorts by (key, time) and merges overlapping candidate windows
    (UpdatingSessions), then a partial-aggregated hash agg — no Python
    boundary, no per-key collect. Skewed keys (one bot user with 10^9
    events) bound at the merge sort, the same exposure as any
    groupBy(user); salt upstream if a single key exceeds a partition."""
    df = (events.withWatermark(ts_col, watermark)
          if events.isStreaming else events)
    win = F.session_window(ts_col, gap)
    return (df.groupBy(win.alias("session"), F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(value_col), 5).alias("sum_value"))
            .select(F.col(key_col),
                    F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"),
                    "n", "sum_value"))


def dedupe_stream(events: DataFrame, id_cols: tuple[str, ...] = ("event_id",),
                  watermark: str = "2 hours",
                  ts_col: str = "ts") -> DataFrame:
    """Exactly-once id dedup over a stream: dropDuplicates keyed on
    ``id_cols`` with a watermark so the seen-ids state is evicted once ids
    can no longer legally reappear (bounded state — the difference between
    a toy dedup and one that survives an unbounded stream). Works on batch
    frames too (plain dropDuplicates), for oracle verification."""
    cols = list(id_cols)
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(cols))
    return events.dropDuplicates(cols)
