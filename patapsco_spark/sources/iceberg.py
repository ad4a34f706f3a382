"""Iceberg table I/O for the web-pages corpus, with a parquet fallback.

The north-star input (BASELINE.json) is "an Iceberg table of Common-Crawl-
style web pages". Iceberg is a TABLE FORMAT layered on parquet files: what
it adds over a bare parquet directory is snapshot isolation (every commit
is a new snapshot; readers pin one), hidden partitioning (partition
transforms like ``days(warc_ts)`` live in table metadata, so queries prune
without magic partition columns), and schema evolution. The Spark side is
a runtime jar (``iceberg-spark-runtime``) plus a catalog config — a
DEPLOYMENT concern, not an algorithmic one, so this module follows the
repo's plugin-gate pattern (cf. ``sources/irds.py``): the full Iceberg
path is exercised when the runtime is on the classpath, and every entry
point degrades to a partitioned-parquet layout with the SAME logical
semantics when it is not (this container has no JVM packages beyond
Spark's own, so CI pins the probe, the gate error, and the fallback — not
the jar).

What the fallback preserves and what it cannot:

- ``write_pages`` partitions by ``(lang, days(warc_ts))`` either way —
  Iceberg stores the transform as table metadata; parquet materializes a
  ``warc_day`` column and a ``partitionBy`` directory layout. Readers
  prune identically (`PartitionFilters` on lang/warc_day).
- ``read_pages`` accepts a catalog identifier (``cat.db.tbl``) or a path;
  paths work in both modes.
- ``snapshot_id`` / ``as_of`` time travel REQUIRE Iceberg (parquet
  directories have no snapshot log); the fallback refuses loudly rather
  than silently reading HEAD.

Config to run with real Iceberg (public Spark/Iceberg docs):

    spark.jars.packages = org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    spark.sql.catalog.cc = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.cc.type = hadoop
    spark.sql.catalog.cc.warehouse = /path/or/s3a/warehouse
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..plans.pqread import read_parquet

PARTITION_COLS = ("lang", "warc_day")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _is_catalog_identifier(target: str) -> bool:
    """Heuristic: catalog identifiers are dotted names without path
    separators or URI schemes (``cc.crawl.pages``); anything with ``/``
    or ``://`` is a filesystem/object-store path."""
    return "/" not in target and "://" not in target


def _with_day(pages: DataFrame) -> DataFrame:
    """Materialize the ``days(warc_ts)`` transform as a column — Iceberg
    computes this inside the table metadata; the parquet fallback (and
    Iceberg's own ``write_pages`` here, for layout identity) carries it
    explicitly so both layouts prune the same way."""
    return pages.withColumn("warc_day", F.to_date("warc_ts"))


def write_pages(pages: DataFrame, target: str,
                mode: str = "overwrite") -> str:
    """Write the pages table to ``target`` (Iceberg table identifier or
    path when the runtime is present, partitioned parquet otherwise).
    Returns the format actually used ('iceberg' | 'parquet').

    Either way the physical layout is partitioned by (lang, warc_day):
    language routing (per-language sub-corpora/indexes read one branch)
    and crawl-time pruning (a monthly snapshot query touches ~30
    partitions of a 10-year archive) are the two access patterns the
    100 TB corpus actually has."""
    spark = pages.sparkSession
    df = _with_day(pages)
    if iceberg_available(spark):
        if _is_catalog_identifier(target):
            w = df.writeTo(target).partitionedBy("lang", "warc_day")
            w.createOrReplace() if mode == "overwrite" else w.append()
        else:
            (df.write.format("iceberg").mode(mode)
             .partitionBy(*PARTITION_COLS).save(target))
        return "iceberg"
    if _is_catalog_identifier(target):
        raise RuntimeError(
            f"'{target}' is a catalog identifier but the Iceberg runtime "
            "is not on the classpath; add iceberg-spark-runtime + a "
            "spark.sql.catalog.* config (see sources/iceberg.py docstring) "
            "or pass a filesystem path for the parquet fallback")
    df.write.mode(mode).partitionBy(*PARTITION_COLS).parquet(target)
    return "parquet"


def read_pages(spark: SparkSession, target: str,
               snapshot_id: int | None = None,
               as_of: str | None = None) -> DataFrame:
    """Read the pages table from an Iceberg identifier/path or a parquet
    directory. ``snapshot_id`` / ``as_of`` (timestamp string) pin an
    Iceberg snapshot; with the parquet fallback they raise — a parquet
    directory has no snapshot log, and silently serving HEAD as if it
    were a historical snapshot is the wrong kind of compatible."""
    if iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of is not None:
            reader = reader.option("as-of-timestamp", as_of)
        return (spark.table(target) if _is_catalog_identifier(target)
                and snapshot_id is None and as_of is None
                else reader.load(target))
    if snapshot_id is not None or as_of is not None:
        raise RuntimeError(
            "snapshot_id/as_of time travel requires the Iceberg runtime; "
            "the parquet fallback has no snapshot log")
    if _is_catalog_identifier(target):
        raise RuntimeError(
            f"'{target}' is a catalog identifier but the Iceberg runtime "
            "is not on the classpath (see sources/iceberg.py docstring)")
    return read_parquet(spark, target)
