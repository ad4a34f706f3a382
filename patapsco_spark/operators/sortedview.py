"""Index-time sorted views — Lucene index sorting's early termination,
re-expressed for a Spark-native index.

Lucene's ``index.sort.field`` physically reorders each segment by a
static field so "sort by that field, top k" stops after k docs per
segment. Physically reordering OUR docids would break the engine's
deterministic docid = f(file, external id) contract (indexer.py header)
that every rank-identity oracle leans on. The Spark-idiomatic
translation keeps docids put and adds a BLOCKED permutation sidecar:

    sorted_views/<name>/<asc|desc>/blocks/   (partitioned by shard)
        (shard, block, docids array<int>, values array<double>)

where each shard's docids are laid out in (value, docid) order, chunked
into ``block_size`` entries. Top-k then reads ONLY ``ceil(k/B)`` blocks
per shard — a `block < nb` predicate PUSHED to the parquet scan, so the
I/O reduction Lucene gets from early termination shows up here as
row-group pruning (pinned by a plan guard test). Everything after the
pruned read is ordinary Catalyst over ~k rows per shard: explode,
tombstone anti-join, optional range filter, per-shard head, one
k-bounded global merge. No Python kernel in the query path at all.

Deletes/filters thin the head, so the reader runs an ADAPTIVE loop:
start at ceil(k/B) blocks, and while any shard produced fewer than k
live rows but still has unread blocks, double the budget and re-read —
geometric, ≤ log2(total blocks) rounds, exactly one round in the
no-delete no-filter common case. Exactness: a shard's first k live
entries in view order ARE its top-k, and the global top-k is contained
in the union of per-shard top-ks.

The view is manifest-gated like every artifact: built FROM the
committed doc-values blob at a recorded shard census; a reader refuses
a view whose census no longer matches the index (append/compaction
since the build) instead of silently serving a stale permutation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import manifest as mf
from .retrieve import load_index_meta
from ..plans.pqread import read_parquet


def _view_root(index_path: str, name: str, ascending: bool) -> str:
    d = "asc" if ascending else "desc"
    return f"{index_path}/sorted_views/{name}/{d}"


def build_sorted_view(spark: SparkSession, index_path: str, name: str,
                      ascending: bool = False,
                      block_size: int = 1024) -> None:
    """Build the blocked permutation for doc-values field ``name`` in one
    direction. One applyInPandas pass per shard over the packed blob (the
    same argsort the query kernel would do ONCE per query happens once
    per build); docs with a missing value (NaN) are excluded, matching
    the sort_values_topk convention. Cost class: one shard-local sort of
    the blob — no shuffle at all (the blob is already shard-partitioned)."""
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    meta = load_index_meta(index_path)
    docs_per_shard = int(meta["docs_per_shard"])
    packed = read_parquet(spark, f"{index_path}/doc_values/{name}/packed")
    asc = bool(ascending)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        base = shard * docs_per_shard
        vals = np.frombuffer(bytes(pdf["values"].iloc[0]), dtype=np.float64)
        live = ~np.isnan(vals)
        idx = np.nonzero(live)[0]
        v = vals[idx]
        # (value, docid asc) order; for descending, negate the value key
        # (docid stays asc — the engine's stable tie-break either way)
        order = np.lexsort((idx, v if asc else -v))
        docids = (idx[order] + base).astype(np.int64)
        v_sorted = v[order]
        rows = []
        for b in range(0, len(docids), block_size):
            rows.append((shard, b // block_size,
                         docids[b:b + block_size].tolist(),
                         v_sorted[b:b + block_size].tolist()))
        return pd.DataFrame(rows, columns=["shard", "block",
                                           "docids", "values"])

    out = packed.groupBy("shard").applyInPandas(
        kernel, schema="shard int, block int, docids array<long>, "
                       "values array<double>")
    root = _view_root(index_path, name, asc)
    (out.write.mode("overwrite").partitionBy("shard")
        .parquet(f"{root}/blocks"))
    # per-shard block counts let the reader decide "exhausted" without an
    # extra job; the shard census pins the index state the view reflects
    counts = (read_parquet(spark, f"{root}/blocks")
              .groupBy("shard").agg(F.count("*").alias("nb")).collect())
    mf.write_manifest(
        root, f"sorted_view:{name}",
        {"name": name, "ascending": asc, "block_size": block_size,
         "num_shards": int(meta["num_shards"]),
         "shard_base": int(meta.get("shard_base", 0)),
         "n_blocks": {str(int(r["shard"])): int(r["nb"]) for r in counts}})


def sorted_topk(spark: SparkSession, index_path: str, name: str,
                k: int = 10, ascending: bool = False,
                value_range: tuple | None = None) -> DataFrame:
    """Corpus-wide (or range-filtered) top-k by an indexed sort field via
    the blocked sorted view — the "latest N pages" query. Returns
    (doc_id, rank, value), rank 0-based, ties by docid asc (external-id
    string order, the engine's convention). ``value_range`` = (lo, hi)
    inclusive bounds on the sort key, either side None for open."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    root = _view_root(index_path, name, bool(ascending))
    man = mf.read_manifest(root)
    if man is None:
        raise ValueError(
            f"no {'asc' if ascending else 'desc'} sorted view for "
            f"{name!r}: run build_sorted_view(..., ascending="
            f"{bool(ascending)}) first")
    cfgm = man["config"]
    meta = load_index_meta(index_path)
    if (int(cfgm["num_shards"]) != int(meta["num_shards"])
            or int(cfgm["shard_base"]) != int(meta.get("shard_base", 0))):
        raise ValueError(
            f"sorted view {name!r} was built at shards "
            f"[{cfgm['shard_base']}, {cfgm['num_shards']}) but the index "
            f"is now at [{meta.get('shard_base', 0)}, "
            f"{meta['num_shards']}) — rebuild the view (a stale "
            "permutation would silently misrank)")
    n_blocks = {int(s): int(n) for s, n in cfgm["n_blocks"].items()}
    max_blocks = max(n_blocks.values(), default=0)
    block_size = int(cfgm["block_size"])

    from .deletes import tombstone_arrays
    docs_per_shard = int(meta["docs_per_shard"])
    deleted = tombstone_arrays(spark, index_path, meta) or {}
    # tombstone_arrays returns LOCAL positions per shard; the view stores
    # GLOBAL docids — rebase before the anti-join
    del_rows = [(int(d) + s * docs_per_shard,)
                for s, arr in deleted.items() for d in arr]
    blocks_path = f"{root}/blocks"

    def _read(nb: int) -> DataFrame:
        # `block < nb` pushes to the parquet scan: early termination as
        # row-group pruning (plan-guarded in tests/test_sorted_view.py)
        b = (read_parquet(spark, blocks_path)
             .where(F.col("block") < nb)
             .select("shard", "block",
                     F.arrays_zip("docids", "values").alias("z"))
             .select("shard", "block", F.explode("z").alias("e"))
             .select("shard", "block", F.col("e.docids").alias("docid"),
                     F.col("e.values").alias("value")))
        if del_rows:
            dd = spark.createDataFrame(del_rows, "docid long")
            b = b.join(F.broadcast(dd), "docid", "left_anti")
        if value_range is not None:
            lo, hi = value_range
            if lo is not None:
                b = b.where(F.col("value") >= float(lo))
            if hi is not None:
                b = b.where(F.col("value") <= float(hi))
        return b

    nb = max(1, math.ceil(k / block_size))
    if not del_rows and value_range is None:
        # nothing can thin the head: the first ceil(k/B) blocks per shard
        # hold ≥ k live rows by construction — no starvation possible, so
        # the adaptive count job is pure overhead and is skipped (the
        # common match-all sort runs as ONE job)
        cand = _read(nb)
    else:
        while True:
            cand = _read(nb)
            per_shard = {int(r["shard"]): int(r["n"]) for r in
                         cand.groupBy("shard").agg(F.count("*").alias("n"))
                         .collect()}
            starved = [s for s, total in n_blocks.items()
                       if per_shard.get(s, 0) < k and nb < total]
            if not starved or nb >= max_blocks:
                break
            nb = min(max_blocks, nb * 2)

    key = F.asc("value") if ascending else F.desc("value")
    w = Window.orderBy(key, F.asc("docid"))
    if not del_rows and value_range is None:
        # fast path: the pruned read is already ≤ nb·B rows per shard
        # (≈ k rounded up to a block) — a per-shard pre-cut would add a
        # whole shuffle stage to save a handful of rows
        topk = (cand.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= k))
    else:
        # adaptive branch: widened rounds can inflate the candidate set,
        # so cut to ≤ k per shard before the single-partition merge
        ws = Window.partitionBy("shard").orderBy(key, F.asc("docid"))
        topk = (cand.withColumn("srn", F.row_number().over(ws))
                .where(F.col("srn") <= k)
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= k))
    # k-bounded hits broadcast against the shard-pruned norms read (the
    # sort_values_topk id-join shape)
    norms = (read_parquet(spark, f"{index_path}/norms")
             .select("shard", "docid", F.col("id").alias("doc_id")))
    return (norms.join(F.broadcast(topk), ["shard", "docid"])
            .select("doc_id",
                    (F.col("rn") - 1).cast("int").alias("rank"), "value")
            .orderBy("rank"))
