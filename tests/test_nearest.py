"""Nearest-polygon join vs brute force and the DuckDB oracle."""

import os

import duckdb
from pyspark.sql import functions as F

from countrymaam_spark.operators.nearest import nearest_polygon, nearest_polygon_sql
from countrymaam_spark.sources import pages as pg


def _fixture(name):
    return os.path.join(pg.fixture_dir("sf0.001"), name)


def test_nearest_polygon_matches_oracle_and_brute(spark):
    pg.ensure_fixtures("sf0.001")
    edges = spark.read.parquet(_fixture("polygon_edges.parquet"))
    queries = spark.read.parquet(_fixture("knn_queries.parquet"))
    for k in (1, 3):
        pruned = sorted(map(tuple, nearest_polygon(queries, edges, k=k).collect()))
        brute = sorted(
            map(tuple, nearest_polygon(queries, edges, k=k, prune=False).collect())
        )
        assert pruned == brute
        sql = nearest_polygon_sql(
            f"'{_fixture('knn_queries.parquet')}'",
            f"'{_fixture('polygon_edges.parquet')}'",
            k=k,
        )
        want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
        assert pruned == want
        assert len(pruned) == queries.count() * k


def test_nearest_polygon_prune_actually_prunes(spark):
    """The bound stage must discard most pairs (else it's a no-op): count
    survivors directly and compare against the full cross size."""
    pg.ensure_fixtures("sf0.001")
    edges = spark.read.parquet(_fixture("polygon_edges.parquet"))
    queries = spark.read.parquet(_fixture("knn_queries.parquet"))
    from countrymaam_spark.functions import geo
    from countrymaam_spark.operators.nearest import _poly_bboxes, _exact_pair_dist

    q = queries.select("query_id", F.col("lat").alias("qlat"), F.col("lon").alias("qlon"))
    e = edges.select("poly_id", "lat1", "lon1", "lat2", "lon2")
    bboxes = _poly_bboxes(e)
    lb = geo.bbox_min_dist_km(
        F.col("qlat"), F.col("qlon"),
        F.col("lat_lo"), F.col("lat_hi"), F.col("lon_lo"), F.col("lon_hi"),
    )
    pairs = q.join(F.broadcast(bboxes), how="cross").select(
        "query_id", "qlat", "qlon", "poly_id", lb.alias("lb")
    )
    full = pairs.count()
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("lb", "poly_id")
    seed = (
        pairs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("query_id", "qlat", "qlon", "poly_id")
    )
    ub = _exact_pair_dist(seed, e).select("query_id", F.col("dist").alias("ub"))
    kept = pairs.join(ub, "query_id").filter(F.col("lb") <= F.col("ub") + 1e-6).count()
    assert kept < full / 2  # scattered fixture polygons: most pairs pruned
