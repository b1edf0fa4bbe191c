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


def test_nearest_cells_equals_brute_and_no_bnlj(spark):
    """Equi-join scale path == brute force on the fixture AND on a dense
    500-polygon set with polar queries; plan has no nested-loop join."""
    import numpy as np

    from countrymaam_spark.operators.nearest import nearest_polygon_cells

    pg.ensure_fixtures("sf0.001")
    edges = spark.read.parquet(_fixture("polygon_edges.parquet"))
    queries = spark.read.parquet(_fixture("knn_queries.parquet"))
    for k in (1, 3):
        a = sorted(map(tuple, nearest_polygon(queries, edges, k=k, prune=False).collect()))
        b = sorted(map(tuple, nearest_polygon_cells(queries, edges, k=k).collect()))
        assert a == b

    rng = np.random.default_rng(7)
    rows = []
    for pid in range(300):
        la = float(rng.uniform(-55, 55)); lo = float(rng.uniform(-165, 165))
        s = float(rng.uniform(1.0, 6.0))
        corners = [(la, lo), (la, lo + s), (la + s, lo + s), (la + s, lo)]
        for j in range(4):
            (a1, o1), (a2, o2) = corners[j], corners[(j + 1) % 4]
            rows.append((pid, j, a1, o1, a2, o2))
    e2 = spark.createDataFrame(
        rows, "poly_id long, seq int, lat1 double, lon1 double, lat2 double, lon2 double"
    )
    q2 = spark.createDataFrame(
        [(i, float(la), float(lo))
         for i, (la, lo) in enumerate(zip(rng.uniform(-88, 88, 120),
                                          rng.uniform(-180, 180, 120)))],
        "query_id long, lat double, lon double",
    )
    a = sorted(map(tuple, nearest_polygon(q2, e2, k=2, prune=False).collect()))
    df = nearest_polygon_cells(q2, e2, k=2)
    b = sorted(map(tuple, df.collect()))
    assert a == b
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_nearest_empty_inputs_are_legal(spark):
    from countrymaam_spark.operators.nearest import nearest_polygon_cells

    no_q = spark.createDataFrame([], "query_id long, lat double, lon double")
    one_q = spark.createDataFrame([(0, 10.0, 20.0)], "query_id long, lat double, lon double")
    no_e = spark.createDataFrame(
        [], "poly_id long, seq int, lat1 double, lon1 double, lat2 double, lon2 double"
    )
    some_e = spark.createDataFrame(
        [(5, 0, 0.0, 0.0, 0.0, 1.0), (5, 1, 0.0, 1.0, 1.0, 1.0),
         (5, 2, 1.0, 1.0, 0.0, 0.0)],
        "poly_id long, seq int, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    assert nearest_polygon(no_q, some_e, k=3).count() == 0
    assert nearest_polygon_cells(no_q, some_e, k=3).count() == 0
    assert nearest_polygon(one_q, no_e, k=3).count() == 0
    assert nearest_polygon_cells(one_q, no_e, k=3).count() == 0
    # fewer polygons than k: 1 polygon serving k=3 returns 1 row
    assert nearest_polygon(one_q, some_e, k=3).count() == 1
    assert nearest_polygon_cells(one_q, some_e, k=3).count() == 1


def test_corridor_join_matches_oracle_and_brute(spark):
    from countrymaam_spark.operators.geotag import extract_geo, extract_geo_sql
    from countrymaam_spark.operators.nearest import corridor_join, corridor_join_sql
    from countrymaam_spark.functions import geo as G

    out = pg.ensure_fixtures("sf0.001")
    pages = spark.read.parquet(os.path.join(out, "pages.parquet"))
    g = extract_geo(pages)
    edges = spark.read.parquet(_fixture("polygon_edges.parquet"))
    got = sorted(map(tuple, corridor_join(g, edges, 150.0, res=6).collect()))
    pg_rel = "(" + extract_geo_sql(f"'{os.path.join(out, 'pages.parquet')}'") + ")"
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                corridor_join_sql(pg_rel, f"'{_fixture('polygon_edges.parquet')}'", 150.0)
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
    # resolution invariance: cells only gate candidates, never the result
    coarse = sorted(map(tuple, corridor_join(g, edges, 150.0, res=4).collect()))
    assert coarse == got
    # near-polar corridor: candidate completeness where the lon margin
    # degrades to the full wrap
    polar_route = spark.createDataFrame(
        [(99, 0, 88.5, -150.0, 88.7, 120.0)],
        "poly_id long, seq int, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    pts = spark.createDataFrame(
        [("a", 89.0, 10.0), ("b", 88.0, -60.0), ("c", 70.0, 10.0)],
        "url string, lat double, lon double",
    )
    from pyspark.sql import functions as FF

    seg = G.point_segment_dist_km(
        FF.col("lat"), FF.col("lon"),
        FF.lit(88.5), FF.lit(-150.0), FF.lit(88.7), FF.lit(120.0),
    )
    brute = {
        (99, r["url"])
        for r in pts.withColumn("d", seg).filter(FF.col("d") <= 300.0).collect()
    }
    fast = {
        (r["route_id"], r["url"])
        for r in corridor_join(pts, polar_route, 300.0, res=6).collect()
    }
    assert fast == brute and len(brute) > 0
