"""Geo operators (operators/geo.py): haversine distance sort/filter and
the geotile_grid Web-Mercator bucketing vs brute-force Python math.
"""

import math

import pytest

from patapsco_spark.config import IndexConfig, TextConfig
from patapsco_spark.operators.aggs import match_set_texts
from patapsco_spark.operators.geo import (EARTH_RADIUS_KM, geo_distance,
                                          geotile_grid)
from patapsco_spark.operators.indexer import build_index

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

# (id, text, lat, lon) — g6 never matches the query
DOCS = [
    ("g1", "alpha beta", 48.8566, 2.3522),     # Paris
    ("g2", "alpha pad", 51.5074, -0.1278),     # London
    ("g3", "alpha pad", 40.7128, -74.0060),    # New York
    ("g4", "beta pad", -33.8688, 151.2093),    # Sydney
    ("g5", "alpha beta", 35.6762, 139.6503),   # Tokyo
    ("g6", "other pad", 0.0, 0.0),
]
ORIGIN = (52.5200, 13.4050)  # Berlin


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def _tile(lat, lon, z):
    n = 1 << z
    x = math.floor((lon + 180.0) / 360.0 * n)
    phi = math.radians(lat)
    y = math.floor((1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi))
                    / math.pi) / 2.0 * n)
    return max(0, min(n - 1, x)), max(0, min(n - 1, y))


@pytest.fixture(scope="module")
def geo_setup(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("geo") / "idx")
    df = spark.createDataFrame([(d, t, "eng") for d, t, _, _ in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    matches = match_set_texts(spark, path, [("q1", "alpha beta")],
                              text_cfg=RAW)
    geo = spark.createDataFrame([(d, la, lo) for d, _, la, lo in DOCS],
                                "doc_id string, lat double, lon double")
    return matches, geo


def test_geo_distance_sort(spark, geo_setup):
    matches, geo = geo_setup
    rows = geo_distance(matches, geo, *ORIGIN, k=10).collect()
    want = sorted(((d, _hav(*ORIGIN, la, lo)) for d, _, la, lo in DOCS
                   if d != "g6"), key=lambda t: (t[1], t[0]))
    assert [r["doc_id"] for r in rows] == [d for d, _ in want]
    for r, (_, dist) in zip(rows, want):
        assert r["dist_km"] == pytest.approx(dist, rel=1e-12)
    # sanity: Paris is the nearest major city to Berlin here
    assert rows[0]["doc_id"] == "g1"


def test_geo_distance_radius_and_k(spark, geo_setup):
    matches, geo = geo_setup
    rows = geo_distance(matches, geo, *ORIGIN, k=10,
                        radius_km=2000.0).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == ["g1", "g2"]  # Paris+London < 2000 km; NY/Tokyo out
    assert len(geo_distance(matches, geo, *ORIGIN, k=1).collect()) == 1
    with pytest.raises(ValueError, match="k must be"):
        geo_distance(matches, geo, *ORIGIN, k=0)


def test_geotile_grid(spark, geo_setup):
    matches, geo = geo_setup
    z = 4
    got = {(r["tile_x"], r["tile_y"]): r["cnt"]
           for r in geotile_grid(matches, geo, zoom=z, size=16).collect()}
    want = {}
    for d, _, la, lo in DOCS:
        if d == "g6":
            continue
        key = _tile(la, lo, z)
        want[key] = want.get(key, 0) + 1
    assert got == want
    with pytest.raises(ValueError, match="zoom"):
        geotile_grid(matches, geo, zoom=30)


def test_geotile_grid_pole_clamp(spark, geo_setup):
    matches, geo_unused = geo_setup
    geo = matches.sparkSession.createDataFrame(
        [("g1", 85.0511, 0.0), ("g2", -85.0511, 0.0), ("g5", 0.0, 179.99)],
        "doc_id string, lat double, lon double")
    rows = geotile_grid(matches, geo, zoom=2, size=16).collect()
    for r in rows:
        assert 0 <= r["tile_x"] <= 3 and 0 <= r["tile_y"] <= 3
