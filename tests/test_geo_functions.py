"""Unit tests for the geo column-math core (cell scheme, haversine, tiles)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_encode_cell_corners(spark):
    # res 0: 2 x 1 grid. Western hemisphere -> x=0, eastern -> x=1.
    c_w = _one(spark, geo.encode_cell(F.lit(10.0), F.lit(-90.0), 0))
    c_e = _one(spark, geo.encode_cell(F.lit(10.0), F.lit(90.0), 0))
    assert c_w != c_e
    assert _one(spark, geo.cell_x(F.lit(c_w))) == 0
    assert _one(spark, geo.cell_x(F.lit(c_e))) == 1
    assert _one(spark, geo.cell_y(F.lit(c_w))) == 0
    assert _one(spark, geo.cell_res(F.lit(c_w))) == 0
    # boundary clamps: lon=180, lat=90 stay in range
    c_max = _one(spark, geo.encode_cell(F.lit(90.0), F.lit(180.0), 5))
    assert _one(spark, geo.cell_x(F.lit(c_max))) == (2 << 5) - 1
    assert _one(spark, geo.cell_y(F.lit(c_max))) == (1 << 5) - 1


def test_encode_cell_matches_duckdb(spark):
    pts = [(48.8566, 2.3522), (-33.8688, 151.2093), (0.0, 0.0), (84.9, -179.99)]
    for res in (3, 7, 12):
        df = spark.createDataFrame(pts, "lat double, lon double")
        got = [r["c"] for r in df.select(geo.encode_cell(F.col("lat"), F.col("lon"), res).alias("c")).collect()]
        sql = geo.encode_cell_sql("lat", "lon", res)
        want = [
            duckdb.sql(f"SELECT {sql} FROM (SELECT {la} AS lat, {lo} AS lon)").fetchone()[0]
            for la, lo in pts
        ]
        assert got == want


def test_cell_parent_contains_child(spark):
    child = geo.encode_cell(F.lit(48.8566), F.lit(2.3522), 10)
    parent = geo.cell_parent(child, 4, 10)
    direct = geo.encode_cell(F.lit(48.8566), F.lit(2.3522), 4)
    assert _one(spark, parent) == _one(spark, direct)


def test_ring_cells_basic(spark):
    cell = geo.encode_cell(F.lit(10.0), F.lit(10.0), 5)
    ring1 = _one(spark, geo.ring_cells(cell, 5, 1))
    assert len(ring1) == 9
    assert _one(spark, cell) in ring1
    ring0 = _one(spark, geo.ring_cells(cell, 5, 0))
    assert ring0 == [_one(spark, cell)]


def test_ring_cells_pole_clamp_and_wrap(spark):
    # cell at the north edge: rows beyond the pole are dropped -> 6 cells
    cell = geo.encode_cell(F.lit(89.9), F.lit(0.0), 3)
    ring = _one(spark, geo.ring_cells(cell, 3, 1))
    assert len(ring) == 6
    # antimeridian wrap: x=0 ring includes x = nx-1
    cell_am = geo.encode_cell(F.lit(0.0), F.lit(-179.99), 3)
    ring_am = _one(spark, geo.ring_cells(cell_am, 3, 1))
    xs = {(c % 2**53) // 2**26 for c in ring_am}
    assert 0 in xs and (2 << 3) - 1 in xs


def test_haversine_known_values(spark):
    # Paris -> London ~ 343.5 km
    d = _one(
        spark,
        geo.haversine_km(F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)),
    )
    assert d == pytest.approx(343.5, abs=1.0)
    # zero distance, antipodes ~ half circumference
    assert _one(spark, geo.haversine_km(F.lit(1.0), F.lit(2.0), F.lit(1.0), F.lit(2.0))) == 0.0
    anti = _one(spark, geo.haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(180.0)))
    assert anti == pytest.approx(math.pi * geo.EARTH_RADIUS_KM, rel=1e-6)


def test_haversine_matches_duckdb(spark):
    pts = [(48.8566, 2.3522, 51.5074, -0.1278), (10.0, 170.0, -10.0, -170.0)]
    df = spark.createDataFrame(pts, "a double, b double, c double, d double")
    got = [
        r["v"]
        for r in df.select(
            geo.haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("v")
        ).collect()
    ]
    sql = geo.haversine_km_sql("a", "b", "c", "d")
    for (a, b, c, d), g in zip(pts, got):
        w = duckdb.sql(f"SELECT {sql} FROM (SELECT {a} a, {b} b, {c} c, {d} d)").fetchone()[0]
        assert g == pytest.approx(w, rel=1e-12)
