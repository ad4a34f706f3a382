"""Document deletes — Lucene-semantics tombstones over the sharded index.

The reference's Lucene index handles deletion with per-segment live-doc
bitsets (``.liv`` files): a deleted document stops matching immediately,
but corpus statistics (num_docs, df, cf, avgdl) keep counting it until a
merge physically drops it. We rebuild exactly that contract, because a
re-crawled web corpus needs it (pages 404, get de-listed, or are removed
for compliance) and because it is the only contract that keeps deletes
O(batch) instead of O(index):

- :func:`delete_docs` resolves external ids to (shard, docid) tombstones
  and commits them as a new manifest-gated batch under
  ``{index}/deletes/batch=N/``. O(one norms column scan + |batch|); no
  postings are touched.
- Retrieval (``operators/retrieve.search``) masks tombstoned docids
  inside the per-shard scoring kernel BEFORE the local top-k cut — a
  deleted doc can neither appear nor displace a live one — while scoring
  statistics stay frozen at the manifest values, byte-for-byte Lucene's
  behavior on an index with uncommitted-merge deletes.
- Compaction (``streaming/incremental.compact_index``) applies tombstones
  physically in the range it rewrites: postings/norms/positions rows are
  dropped, surviving docids renumber densely (order-preservingly), and
  global + per-term statistics are recomputed — after a FULL compaction
  the index is bit-equivalent in scores to a fresh build on the surviving
  documents. Tiered compaction applies deletes only in the merged tail;
  tombstones pointing into kept base shards are carried forward (exactly
  Lucene's .liv files on not-yet-merged segments).

Crash safety mirrors the append protocol: each batch directory is written
with overwrite mode and becomes visible only through the manifest count
bump, which is the LAST step (manifest-snapshot isolation). Readers see
batches in ``[deletes_base, deletes_batches)`` — compaction rewrites the
carried-forward set at a FRESH batch number and moves ``deletes_base``
up, so a crashed compaction leaves the old window untouched (no
tombstone is ever lost or resurrected mid-flight).

Scale contract: the tombstone set a reader materializes is the deletes
accumulated SINCE the last compaction — bounded by the maintenance
cadence, not the corpus (Lucene holds the same live-doc sets in RAM).
The arrays ship to executors via task closure, i.e. one broadcast of
|pending deletes| longs. A pipeline deleting a significant fraction of
10^12 docs compacts as it goes; ``tombstone_count`` in the manifest
metrics is the back-pressure signal.

Single-maintenance-writer assumption, same as appends: delete_docs /
append_batch / compact_index are not concurrent with each other
(retrieval is always safe under any committed manifest).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import fsio
from ..plans import manifest as mf
from ..plans.pqread import read_parquet

DELETES_SCHEMA = "shard int, docid long, id string"


def _batch_window(meta: dict) -> tuple[int, int]:
    return int(meta.get("deletes_base", 0)), int(meta.get("deletes_batches", 0))


def read_tombstones(spark: SparkSession, index_path: str,
                    meta: dict) -> DataFrame | None:
    """The committed tombstone set under this manifest snapshot, as
    distinct (shard, docid, id) rows — or None when there are none.
    Batch dirs are addressed explicitly from the manifest window, never
    by directory listing: a crashed delete's orphan ``batch=N`` dir (count
    never bumped) is invisible, like an uncommitted append shard."""
    base, count = _batch_window(meta)
    if count <= base:
        return None
    paths = [f"{index_path}/deletes/batch={b}" for b in range(base, count)]
    df = spark.read.schema(DELETES_SCHEMA).parquet(*paths)
    return df.dropDuplicates(["shard", "docid"])


def tombstone_arrays(spark: SparkSession, index_path: str,
                     meta: dict) -> dict[int, np.ndarray] | None:
    """Tombstones as {shard: sorted array of LOCAL positions (docid -
    shard*docs_per_shard)} — the shape the scoring kernel masks with.
    Collected to the driver: bounded by deletes-since-last-compaction
    (module doc), and shipped to executors once via the kernel closure."""
    df = read_tombstones(spark, index_path, meta)
    if df is None:
        return None
    dps = int(meta["docs_per_shard"])
    rows = df.select("shard", "docid").collect()
    if not rows:
        return None
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(int(r["shard"]), []).append(int(r["docid"]) - int(r["shard"]) * dps)
    return {s: np.unique(np.asarray(v, dtype=np.int64))
            for s, v in by_shard.items()}


def delete_docs(spark: SparkSession, index_path: str,
                ids, id_col: str = "id",
                before_shard: int | None = None) -> dict:
    """Tombstone the given external document ids. ``ids`` is a DataFrame
    with ``id_col`` or a plain list of id strings. Unknown ids are no-ops
    (Lucene ``deleteDocuments(Term)`` semantics), as are ids already
    tombstoned — re-deleting is idempotent and writes nothing.

    ``before_shard`` bounds resolution to shards strictly below it —
    :func:`update_docs` uses this to tombstone only the PRE-append copy of
    each id (the freshly appended replacement lives at or above the
    boundary shard and must survive).

    Returns the (possibly updated) manifest config. The id→docid
    resolution is one predicate-pushed scan of the norms table's
    (shard, docid, id) columns against the broadcast id batch."""
    from .indexer import live_shard_pred

    root = mf.read_manifest(index_path)
    if root is None:
        raise FileNotFoundError(f"no index at {index_path} — build it first")
    meta = root["config"]
    if int(meta.get("postings_format", 0)) < 4:
        raise ValueError(
            f"index at {index_path} has postings_format="
            f"{meta.get('postings_format')} (< 4); rebuild it before deletes")

    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(str(i),) for i in ids], f"{id_col} string")
    ids_df = ids.select(F.col(id_col).cast("string").alias("id")).distinct()

    norms = (read_parquet(spark, f"{index_path}/norms")
             .where(live_shard_pred(meta))
             .select("shard", "docid", "id"))
    if before_shard is not None:
        # partition-pruned: shard= is the physical partition column
        norms = norms.where(F.col("shard") < int(before_shard))
    hits = norms.join(F.broadcast(ids_df), "id").select("shard", "docid", "id")
    existing = read_tombstones(spark, index_path, meta)
    if existing is not None:
        hits = hits.join(existing.select("shard", "docid"),
                         ["shard", "docid"], "left_anti")

    batch = int(meta.get("deletes_batches", 0))
    out = f"{index_path}/deletes/batch={batch}"
    # tombstone batches are tiny relative to the index — one file per batch
    hits.coalesce(1).write.mode("overwrite").parquet(out)
    n = spark.read.schema(DELETES_SCHEMA).parquet(out).count()
    if n == 0:
        fsio.delete(out)  # nothing new to commit — manifest stays put
        return meta

    new_meta = dict(meta)
    new_meta["deletes_base"] = int(meta.get("deletes_base", 0))
    new_meta["deletes_batches"] = batch + 1
    pending = int(root.get("metrics", {}).get("tombstone_count", 0)) + n
    mf.write_manifest(index_path, "index", new_meta,
                      metrics={**root.get("metrics", {}),
                               "tombstone_count": pending})
    return new_meta


def delete_by_query(spark: SparkSession, index_path: str, query: str,
                    text_cfg=None, lang: str = "eng",
                    mode: str = "plain") -> dict:
    """Tombstone every document matching ``query`` — Lucene
    ``IndexWriter.deleteDocuments(Query)``. The query goes through the
    same analysis chain + parser as retrieval (``mode='plain'`` ORs the
    analyzed terms; ``mode='boolean'`` takes the full +/-/()/phrase
    syntax), and matching is exact: the retrieval engine runs with
    ``k=num_docs`` so no matching doc escapes below a top-k cut. Already
    tombstoned docs never match (retrieval masks them), so repeated calls
    are idempotent.

    Scale contract: the tombstone batch this writes is bounded by the
    query's match count. A broad query (``-nosuchterm`` matches the whole
    corpus) should be followed by :func:`compact_index` — same guidance
    Lucene gives for deleteAll-style deletes; ``tombstone_count`` in the
    manifest metrics is the back-pressure signal either way."""
    from ..config import RetrieveConfig
    from .retrieve import search_texts

    root = mf.read_manifest(index_path)
    if root is None:
        raise FileNotFoundError(f"no index at {index_path} — build it first")
    n = int(root["config"]["num_docs"])
    if n == 0:
        return root["config"]
    res = search_texts(spark, index_path, [("__delete__", query)],
                       RetrieveConfig(k=n), text_cfg=text_cfg, lang=lang,
                       mode=mode)
    return delete_docs(spark, index_path,
                       res.select(F.col("doc_id").alias("id")).distinct())


def update_docs(spark: SparkSession, index_path: str, docs: DataFrame,
                cfg=None, id_col: str = "id", text_col: str = "text",
                lang_col: str | None = "lang",
                epoch_id: int | None = None) -> dict:
    """Upsert — Lucene ``IndexWriter.updateDocument(Term, doc)`` for every
    row of ``docs``: the new version is appended as fresh shards
    (:func:`~patapsco_spark.streaming.incremental.append_batch`), then any
    PRE-EXISTING copy of each id is tombstoned. Ids with no prior copy are
    plain adds. Exactly Lucene's visible semantics on a re-crawled corpus:
    the new version matches immediately, the old one stops matching
    immediately, and corpus statistics count both copies until a
    compaction physically drops the tombstoned one.

    Crash/replay safety (same contract as ``append_batch``): the append
    commits first, so a crash between the two manifest commits leaves both
    versions visible (never neither) and a replay of the SAME ``epoch_id``
    converges — the append is skipped as already applied, the boundary
    shard is recovered from the manifest's ``appended_from_shard`` metric
    (only the last batch can replay, and that metric is the last append's
    first shard), and the tombstone write is idempotent. Callers not using
    epochs get fresh-path semantics only."""
    from ..streaming.incremental import append_batch

    root = mf.read_manifest(index_path)
    if root is None:
        raise FileNotFoundError(f"no index at {index_path} — build it first")
    meta = root["config"]
    dps = int(meta["docs_per_shard"])
    last_epoch = meta.get("last_epoch")
    if last_epoch is None and meta.get("epochs"):
        last_epoch = max(meta["epochs"])
    replay = (epoch_id is not None and last_epoch is not None
              and epoch_id <= last_epoch)
    if replay:
        afs = root.get("metrics", {}).get("appended_from_shard")
        if afs is None:
            raise ValueError(
                f"cannot replay update epoch {epoch_id} at {index_path}: "
                "manifest metrics lack appended_from_shard (was a "
                "compaction interleaved with the replay?)")
        boundary_shard = int(afs)
    else:
        next_docid = int(meta["num_docs_ceil"]) if "num_docs_ceil" in meta \
            else math.ceil(int(meta["num_docs"]) / dps) * dps
        boundary_shard = next_docid // dps
        append_batch(spark, docs, index_path, cfg, id_col=id_col,
                     text_col=text_col, lang_col=lang_col, epoch_id=epoch_id)
    ids = docs.select(F.col(id_col).cast("string").alias("id")).distinct()
    return delete_docs(spark, index_path, ids, before_shard=boundary_shard)
