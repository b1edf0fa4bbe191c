"""Nearest-polygon join: for each query point, the k closest polygons by
boundary distance (min point-to-segment distance over the polygon's edges).

The reference's search pattern — cheap bound-driven candidate pruning, then
an exact kernel re-rank (/root/reference/index/bsp_tree_index.go:35-92 for
the bounded descent, /root/reference/index/flat_index.go:26-82 for the exact
scan) — applied to the point->polygon metric:

1. **Bound stage.** Each polygon's bbox (a ~|polys|-row aggregate of the
   edge table, broadcast) gives a SOUND great-circle lower bound
   ``lb = bbox_min_dist_km`` per (query, polygon) pair. The pair table is a
   broadcast fan-out of |polys| rows per query — no shuffle of the query
   side; the dim table stays driver-sized (polygon sets are dimension
   tables; for a polygon table too large to broadcast, generate candidates
   from the compact cover + cell rings instead, as point_in_polygon's
   shuffle path does).
2. **Upper bound.** The argmin-lb polygon per query is evaluated exactly
   (min over its edges) -> ``ub``; any polygon with ``lb > ub`` cannot be
   the nearest (nor in the top-k once k-th best is <= ub).
3. **Exact stage.** Surviving pairs join their edges and re-rank by the
   exact metric; window top-k with (dist, poly_id) tie-break.

Exactness: lb is a true lower bound (property-tested), ub is an achieved
distance, so pruning ``lb > ub + eps`` never discards a top-1 polygon. For
k > 1 the prune keeps every polygon with lb <= ub where ub is the top-1
bound — a superset of the true top-k ONLY when their distances are <= ub;
polygons with dist > ub but rank <= k are re-admitted by the fallback:
queries whose surviving-pair count is < k re-run unpruned (driver-free —
an anti-join + union, same pattern as cell_knn's straggler fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo

_EPS_KM = 1e-6  # float-noise slack on the lb <= ub prune


def _poly_bboxes(edges: DataFrame) -> DataFrame:
    return edges.groupBy("poly_id").agg(
        F.least(F.min("lat1"), F.min("lat2")).alias("lat_lo"),
        F.greatest(F.max("lat1"), F.max("lat2")).alias("lat_hi"),
        F.least(F.min("lon1"), F.min("lon2")).alias("lon_lo"),
        F.greatest(F.max("lon1"), F.max("lon2")).alias("lon_hi"),
    )


def _exact_pair_dist(pairs: DataFrame, edges: DataFrame) -> DataFrame:
    """(query_id, qlat, qlon, poly_id) -> + dist (min over the poly's edges,
    unrounded double — rounding happens once at the output)."""
    seg = geo.point_segment_dist_km(
        F.col("qlat"), F.col("qlon"),
        F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"),
    )
    return (
        pairs.join(F.broadcast(edges), "poly_id")
        .groupBy("query_id", "qlat", "qlon", "poly_id")
        .agg(F.min(seg).alias("dist"))
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("dist"), 6).asc(), F.col("poly_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "rk", "poly_id", F.round("dist", 6).alias("dist_km")
        )
    )


def nearest_polygon(
    queries: DataFrame, edges: DataFrame, k: int = 1, prune: bool = True
) -> DataFrame:
    """-> (query_id, rk, poly_id, dist_km): the ``k`` polygons nearest each
    query point by boundary distance. ``prune=False`` scores every
    (query, polygon) pair — the oracle shape, and the correct plan when
    |polys| is tiny."""
    q = queries.select(
        "query_id", F.col("lat").alias("qlat"), F.col("lon").alias("qlon")
    )
    e = edges.select("poly_id", "lat1", "lon1", "lat2", "lon2")
    if not prune:
        all_pairs = q.join(F.broadcast(e.select("poly_id").distinct()), how="cross")
        return _topk(_exact_pair_dist(all_pairs, e), k)

    bboxes = _poly_bboxes(e)
    lb = geo.bbox_min_dist_km(
        F.col("qlat"), F.col("qlon"),
        F.col("lat_lo"), F.col("lat_hi"), F.col("lon_lo"), F.col("lon_hi"),
    )
    pairs = q.join(F.broadcast(bboxes), how="cross").select(
        "query_id", "qlat", "qlon", "poly_id", lb.alias("lb")
    )
    w_lb = Window.partitionBy("query_id").orderBy(
        F.col("lb").asc(), F.col("poly_id").asc()
    )
    seed = (
        pairs.withColumn("_r", F.row_number().over(w_lb))
        .filter(F.col("_r") == 1)
        .select("query_id", "qlat", "qlon", "poly_id")
    )
    ub = _exact_pair_dist(seed, e).select(
        "query_id", F.col("dist").alias("ub")
    )
    survivors = (
        pairs.join(ub, "query_id")
        .filter(F.col("lb") <= F.col("ub") + F.lit(_EPS_KM))
        .select("query_id", "qlat", "qlon", "poly_id")
    )
    scored = _exact_pair_dist(survivors, e)
    if k > 1:
        # top-1-bound pruning can under-fill ranks 2..k: re-score unpruned
        # for the (rare) queries whose surviving pool is smaller than k
        short = (
            scored.groupBy("query_id")
            .count()
            .filter(F.col("count") < k)
            .select("query_id")
        )
        refill = (
            q.join(short, "query_id", "left_semi")
            .join(F.broadcast(e.select("poly_id").distinct()), how="cross")
        )
        scored = (
            scored.join(short, "query_id", "left_anti")
            .unionByName(_exact_pair_dist(refill, e))
        )
    return _topk(scored, k)


def nearest_polygon_sql(queries_rel: str, edges_rel: str, k: int = 1) -> str:
    """DuckDB oracle: brute-force min over every (query, polygon, edge)."""
    seg = geo.point_segment_dist_km_sql(
        "q.lat", "q.lon", "e.lat1", "e.lon1", "e.lat2", "e.lon2"
    )
    return f"""
        SELECT query_id, rk, poly_id, dist_km
        FROM (
            SELECT query_id, poly_id,
                   ROUND(dist, 6) AS dist_km,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY ROUND(dist, 6), poly_id
                   ) AS rk
            FROM (
                SELECT q.query_id, e.poly_id, MIN({seg}) AS dist
                FROM {queries_rel} q, {edges_rel} e
                GROUP BY q.query_id, e.poly_id
            ) d
        ) r
        WHERE rk <= {k}
    """
