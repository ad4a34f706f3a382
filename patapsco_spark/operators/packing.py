"""Sequence packing for LLM training — GPT-style concat-and-chunk.

Beyond the reference's scope, but first-class for a training-data engine:
every causal-LM pipeline concatenates documents (in a fixed order, with a
separator token) into one token stream and cuts it every ``seq_len``
tokens. The assignment of each document to its sequence window(s) is a
pure prefix-sum over the ordered token counts — no packing heuristics, no
state — which makes it exactly reproducible AND exactly verifiable in SQL
(``SUM(...) OVER (ORDER BY ...)``).

The naive Spark spelling — a global ``Window.orderBy`` with no
partitionBy — collapses the whole corpus into ONE task: correct at test
scale, dead at 100 TB. This module computes the same prefix sum
scale-safely:

1. ``repartitionByRange(order_col)`` — ranges the stream order across
   partitions (Spark's range partitioner keeps ranges disjoint and
   sorted across partition ids);
2. per-partition token totals — a tiny ``spark_partition_id`` groupBy
   (one row per partition);
3. exclusive prefix over those totals on the DRIVER (thousands of longs,
   not rows) — broadcast-joined back;
4. intra-partition running sum via a window PARTITIONED by partition id
   (each task sums only its own range).

Global offset = partition base + intra-partition exclusive sum. Every
step is one narrow shuffle or a broadcast; nothing global ever sorts on
a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import _TOKENS

# whitespace token count — sharing textstats._TOKENS keeps the NULL-text
# guard: without the coalesce, a NULL text row got NULL n_tokens, was
# ignored by every sum, and silently shifted all downstream offsets
_NTOK = lambda c: F.size(_TOKENS(c))


def pack_sequences(docs: DataFrame, seq_len: int, order_col: str = "doc_id",
                   id_col: str = "doc_id", text_col: str = "text",
                   sep_tokens: int = 1) -> DataFrame:
    """Assign each document its window(s) in the packed token stream.

    Documents are laid out in ascending ``order_col`` order; each doc
    contributes ``n_tokens + sep_tokens`` to the stream (the separator is
    an EOS/BOS marker, counted after the doc, GPT-convention). Returns one
    row per doc: (id, n_tokens, offset, first_seq, last_seq) where
    ``offset`` is the doc's first token's position in the stream and
    first/last_seq = offset // seq_len of the doc's first/last own token
    (separator excluded — a doc whose text ends exactly at a cut does not
    claim the next sequence). Empty docs (0 tokens) still advance the
    stream by ``sep_tokens`` and claim the window at their offset.

    Equivalent to ``SUM(n) OVER (ORDER BY order)`` but never funnels the
    corpus through one task — see the module docstring for the two-phase
    prefix-sum plan.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    spark = docs.sparkSession
    sized = (docs.select(F.col(id_col).alias("_id"),
                         F.col(order_col).alias("_ord"),
                         _NTOK(text_col).cast("long").alias("n_tokens"))
             .withColumn("_adv", F.col("n_tokens") + F.lit(sep_tokens)))
    parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
                spark.sparkContext.defaultParallelism)
    # materialized ONCE: the totals job and the output job below must see
    # the SAME range partitioning (repartitionByRange samples its child to
    # pick bounds — two independent executions are not guaranteed to cut
    # identical ranges)
    ranged = (sized.repartitionByRange(parts, "_ord")
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=False))
    # per-partition totals → driver-side exclusive prefix (one long per
    # partition: thousands of rows at any corpus size, never data-scale)
    totals = {r["_pid"]: r["tot"] for r in
              ranged.groupBy("_pid").agg(F.sum("_adv").alias("tot")).collect()}
    bases, acc = [], 0
    for pid in sorted(totals):
        bases.append((pid, acc))
        acc += totals[pid]
    base_df = F.broadcast(spark.createDataFrame(bases, "_pid int, _base long"))
    w = (Window.partitionBy("_pid").orderBy("_ord")
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (ranged.join(base_df, "_pid")
           .withColumn("_intra", F.coalesce(F.sum("_adv").over(w), F.lit(0)))
           .withColumn("offset", F.col("_base") + F.col("_intra"))
           .withColumn("first_seq",
                       (F.col("offset") / seq_len).cast("long"))
           .withColumn("last_seq",
                       (F.greatest(F.col("offset"),
                                   F.col("offset") + F.col("n_tokens") - 1)
                        / seq_len).cast("long")))
    return out.select(F.col("_id").alias(id_col), "n_tokens", "offset",
                      "first_seq", "last_seq")
