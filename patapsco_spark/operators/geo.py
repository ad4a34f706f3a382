"""Geo search over match sets — ES ``geo_distance`` sort/filter and the
``geotile_grid`` aggregation, Spark-first.

Beyond the reference's scope (patapsco has no geo surface), but a
first-class Elasticsearch/Lucene family: web corpora carry page-level
coordinates (geotagged articles, local-business pages, sitemap geo
extensions), and "nearest matching pages" / "match density per map tile"
are the two canonical geo queries over an inverted index.

Spark-first shape: the retrieval kernel runs once in ``matches_only``
mode, then both operators are pure Catalyst over the (doc_id → lat/lon)
frame — one join, closed-form math per row, no UDF:

- ``geo_distance``: haversine great-circle distance from a fixed origin
  (the exact formula ES documents for its arc distance), optional radius
  filter, top-k nearest PER QUERY with (distance asc, doc_id asc)
  tie-break — a bucketed pre-cut then a per-query rank over ≤ buckets×k
  rows, never a global window over the raw match set.
- ``geotile_grid``: Web-Mercator "slippy map" tiles at a fixed zoom
  (ES's geotile_grid keys, z/x/y), count per tile, top ``size`` buckets
  by (count desc, key asc). One composite groupBy.

Every expression is a fixed double tree (radians via *π/180, haversine
via sin/cos/asin/sqrt, Mercator y via ln(tan φ + 1/cos φ)) written
identically in the SQL oracles; results round to 5-6 decimals, absorbing
last-ulp libm differences — the repo-wide oracle discipline.

Latitudes must lie within Web-Mercator's ±85.05113° for geotile_grid
(tiles are clamped to the valid [0, 2^z) range like ES does at the
poles).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius, ES's arc default


def _join_geo(matches: DataFrame, geo: DataFrame, id_col: str,
              lat_col: str, lon_col: str) -> DataFrame:
    g = geo.select(F.col(id_col).cast("string").alias("doc_id"),
                   F.col(lat_col).cast("double").alias("_lat"),
                   F.col(lon_col).cast("double").alias("_lon"))
    return matches.join(g, "doc_id")


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance between two (Column) coordinate pairs, km.
    The classic haversine: 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))
    with the same explicit *π/180 radian conversion the oracle replays."""
    rad = F.lit(math.pi) / F.lit(180.0)
    p1, p2 = lat1 * rad, lat2 * rad
    dp, dl = (lat2 - lat1) * rad, (lon2 - lon1) * rad
    a = (F.sin(dp / 2) * F.sin(dp / 2)
         + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance(matches: DataFrame, geo: DataFrame, origin_lat: float,
                 origin_lon: float, *, k: int = 10,
                 radius_km: float | None = None, id_col: str = "doc_id",
                 lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """ES ``geo_distance`` sort (+ optional ``geo_distance`` filter): the
    ``k`` matching docs nearest to the origin, (query_id, doc_id,
    dist_km), distance-asc with doc_id tie-break; ``radius_km`` drops
    farther docs before the cut (ES's filter + sort composition)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hit = _join_geo(matches, geo, id_col, lat_col, lon_col)
    d = haversine_km(F.lit(float(origin_lat)), F.lit(float(origin_lon)),
                     F.col("_lat"), F.col("_lon"))
    out = hit.select("query_id", "doc_id", d.alias("dist_km"))
    if radius_km is not None:
        out = out.where(F.col("dist_km") <= F.lit(float(radius_km)))
    # per-QUERY top-k (round-5 advice): the old global orderBy().limit(k)
    # silently merged and cut ACROSS queries on a multi-query match
    # frame. Two-phase: per-(query, doc-hash bucket) pre-cut bounds the
    # final per-query rank window at buckets × k rows (no unpartitioned
    # window over an unbounded match set); single-query output is
    # unchanged — the per-query top-k IS the global top-k there.
    nb = matches.sparkSession.sparkContext.defaultParallelism
    order = (F.asc("dist_km"), F.asc("doc_id"))
    wb = (Window.partitionBy("query_id",
                             F.pmod(F.xxhash64("doc_id"), F.lit(nb)))
          .orderBy(*order))
    pre = (out.withColumn("_rn", F.row_number().over(wb))
           .where(F.col("_rn") <= k).drop("_rn"))
    w = Window.partitionBy("query_id").orderBy(*order)
    return (pre.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn")
            .orderBy("query_id", *order))


def geotile_grid(matches: DataFrame, geo: DataFrame, *, zoom: int,
                 size: int = 10, id_col: str = "doc_id",
                 lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """ES ``geotile_grid`` aggregation: bucket matching docs into
    Web-Mercator map tiles at ``zoom`` (the OSM slippy-map scheme ES
    keys as "z/x/y"), count per tile, top ``size`` by (count desc,
    tile_x asc, tile_y asc). Returns (tile_x, tile_y, cnt); the zoom is
    the caller's constant. Tiles clamp to [0, 2^z) at the poles.

    SINGLE-QUERY CONTRACT (round-5 advice, documented): the output drops
    query_id, so a multi-query match frame would merge tile counts
    across queries — pass one query's matches (or pre-filter) per call;
    the frozen entry/oracle surface is single-query."""
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    hit = _join_geo(matches, geo, id_col, lat_col, lon_col)
    n = F.lit(float(1 << zoom))
    rad = F.lit(math.pi) / F.lit(180.0)
    phi = F.col("_lat") * rad
    x = F.floor((F.col("_lon") + F.lit(180.0)) / F.lit(360.0) * n)
    y = F.floor((F.lit(1.0)
                 - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi))
                 / F.lit(math.pi)) / F.lit(2.0) * n)
    hi = F.lit((1 << zoom) - 1).cast("long")
    zero = F.lit(0).cast("long")
    return (hit.select(
        F.greatest(zero, F.least(hi, x)).alias("tile_x"),
        F.greatest(zero, F.least(hi, y)).alias("tile_y"))
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tile_x"), F.asc("tile_y"))
        .limit(size))
