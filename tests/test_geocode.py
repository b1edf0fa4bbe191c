"""Gazetteer geocoding: oracle equality, join plan shape, QA separation."""

import os

import duckdb
from pyspark.sql import functions as F

from countrymaam_spark.operators.geotag import (
    extract_geo,
    extract_geo_sql,
    geocode_mentions,
    geocode_mentions_sql,
    geocode_quality,
    geocode_quality_sql,
)
from countrymaam_spark.sources import pages as pg


def _paths():
    out = pg.ensure_fixtures("sf0.001")
    return os.path.join(out, "pages.parquet"), os.path.join(out, "gazetteer.parquet")


def _rows(df, cols, nd=9):
    def norm(v):
        return round(v, nd) if isinstance(v, float) else v

    return sorted(tuple(norm(r[c]) for c in cols) for r in df.collect())


def _oracle(sql, nd=9):
    return sorted(
        tuple(round(v, nd) if isinstance(v, float) else v for v in row)
        for row in duckdb.sql(sql).fetchall()
    )


def test_geocode_mentions_matches_oracle(spark):
    p, gz = _paths()
    got = geocode_mentions(spark.read.parquet(p), spark.read.parquet(gz))
    assert _rows(got, ["url", "place", "glat", "glon"]) == _oracle(
        geocode_mentions_sql(f"'{p}'", f"'{gz}'")
    )


def test_geocode_mentions_broadcasts_gazetteer(spark):
    """The dim side must be the broadcast side at fixture size: the corpus
    scan is never shuffled to resolve 50 places."""
    p, gz = _paths()
    plan = (
        geocode_mentions(spark.read.parquet(p), spark.read.parquet(gz))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_geocode_quality_matches_oracle(spark):
    p, gz = _paths()
    geo = extract_geo(spark.read.parquet(p))
    got = geocode_quality(geo, spark.read.parquet(gz))
    assert _rows(got, ["place", "n_pages", "mean_err_km"]) == _oracle(
        geocode_quality_sql(f"({extract_geo_sql(chr(39) + p + chr(39))})", f"'{gz}'")
    )


def test_geocode_quality_separates_noise(spark):
    """City-cluster pages (80%, sigma ~0.5 deg -> tens of km) dominate the
    page-weighted mean; background pages (20%) name-drop random cities from
    anywhere (~10^4 km off). So the corpus-weighted mean error sits far
    below the uniform-random two-point baseline (~10,000 km), the best
    (hottest) place is cluster-dominated, and everything is nonzero."""
    p, gz = _paths()
    geo = extract_geo(spark.read.parquet(p))
    q = geocode_quality(geo, spark.read.parquet(gz))
    mn, weighted = q.agg(
        F.min("mean_err_km"),
        F.sum(F.col("mean_err_km") * F.col("n_pages")) / F.sum("n_pages"),
    ).first()
    assert 0.0 < mn < 500.0
    assert weighted < 5000.0
