"""Point-in-polygon join + tile assignment vs DuckDB oracles."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators.geotag import extract_geo
from countrymaam_spark.operators.pip import point_in_polygon, point_in_polygon_sql
from countrymaam_spark.operators.tiles import assign_tiles, assign_tiles_sql, tile_counts
from countrymaam_spark.sources import pages as pg


@pytest.fixture(scope="module")
def geo_small(spark):
    out = pg.ensure_fixtures("sf0.001")
    pages = spark.read.parquet(os.path.join(out, "pages.parquet"))
    g = extract_geo(pages).select("url", "lat", "lon").cache()
    g.count()
    return g


_PAGES_GEO_SQL = (
    "(SELECT url, CAST(NULLIF(regexp_extract(text, 'near \\w+ \\((-?[0-9]+\\.[0-9]+), (-?[0-9]+\\.[0-9]+)\\)', 1), '') AS DOUBLE) lat, "
    "CAST(NULLIF(regexp_extract(text, 'near \\w+ \\((-?[0-9]+\\.[0-9]+), (-?[0-9]+\\.[0-9]+)\\)', 2), '') AS DOUBLE) lon FROM '{p}')"
)


def test_pip_matches_oracle(spark, geo_small):
    out = pg.fixture_dir("sf0.001")
    edges = spark.read.parquet(os.path.join(out, "polygon_edges.parquet"))
    got = {(r["poly_id"], r["url"]) for r in point_in_polygon(geo_small, edges, res=6).collect()}
    sql = point_in_polygon_sql(
        _PAGES_GEO_SQL.format(p=os.path.join(out, "pages.parquet")),
        f"'{os.path.join(out, 'polygon_edges.parquet')}'",
    )
    want = set(duckdb.sql(sql).fetchall())
    assert got == want
    assert len(got) > 0  # city-centered polygons must contain pages


def test_pip_res_invariance(spark, geo_small):
    """Coarse-cell resolution must not change the exact result set."""
    out = pg.fixture_dir("sf0.001")
    edges = spark.read.parquet(os.path.join(out, "polygon_edges.parquet"))
    a = {(r["poly_id"], r["url"]) for r in point_in_polygon(geo_small, edges, res=4).collect()}
    b = {(r["poly_id"], r["url"]) for r in point_in_polygon(geo_small, edges, res=8).collect()}
    assert a == b


def test_tiles_match_oracle(spark, geo_small):
    out = pg.fixture_dir("sf0.001")
    p = os.path.join(out, "pages.parquet")
    got = {
        (r["url"], r["z"], r["xt"], r["yt"])
        for r in assign_tiles(geo_small, [4, 8, 12]).collect()
    }
    want = set(duckdb.sql(assign_tiles_sql(_PAGES_GEO_SQL.format(p=p), [4, 8, 12])).fetchall())
    assert got == want


def test_tile_counts_sum(spark, geo_small):
    n = geo_small.filter(F.col("lat").isNotNull()).count()
    tc = tile_counts(geo_small, [8]).agg(F.sum("n_pages")).collect()[0][0]
    assert tc == n
