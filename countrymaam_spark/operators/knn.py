"""kNN joins over geotagged pages.

Two paths, mirroring the reference's index zoo:

- ``flat_knn`` — exact brute force: broadcast the query set against the full
  corpus and re-rank. The Spark form of ``FlatIndex.SearchChannel``
  (/root/reference/index/flat_index.go:26-82) + the top-k finalizer
  (/root/reference/countrymaam.go:38-69). This is the permanent verification
  oracle, and the right plan when |queries| is small enough to broadcast —
  one pass over the corpus, no shuffle of the big side.

- ``cell_knn`` — candidate generation via quad-cell ring lookup + exact
  haversine re-rank, the Spark form of best-first tree descent + re-rank
  (/root/reference/index/bsp_tree_index.go:35-92). Ring radius escalates
  per query until the k-th candidate distance is provably smaller than any
  point outside the ring (branch-and-bound: the ring boundary is the
  frontier priority, /root/reference/index/bsp_tree_index.go:75-85), so the
  result is EXACT while touching only candidate cells. A candidate budget
  (``search_k``) can relax the guarantee into the reference's
  recall-vs-effort knob (/root/reference/countrymaam.go:40-45).

Scale notes (100 TB corpus):
- the big side (pages) is never shuffled in either path: flat broadcasts
  queries; cell_knn broadcasts exploded (query, cell) pairs and equi-joins
  against a cell-partitioned corpus, so only candidates leave the scan.
- per-round state is O(|queries|); escalation rounds collect only counts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo
from countrymaam_spark.operators.topk import topk_per_group


def flat_knn(pages_geo: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact kNN: (query_id, rk, url, dist_km). pages_geo needs url/lat/lon;
    queries needs query_id/lat/lon."""
    q = F.broadcast(
        queries.select(
            "query_id", F.col("lat").alias("qlat"), F.col("lon").alias("qlon")
        )
    )
    pairs = (
        pages_geo.filter(F.col("lat").isNotNull())
        .select("url", "lat", "lon")
        .crossJoin(q)
        .withColumn(
            "dist_km",
            geo.haversine_km(F.col("lat"), F.col("lon"), F.col("qlat"), F.col("qlon")),
        )
    )
    # pairs are unique by construction (unique urls x unique queries):
    # dedup=False skips a full shuffle of the pair set (explain-verified)
    out = topk_per_group(pairs, ["query_id"], "dist_km", "url", k, dedup=False)
    return out.select(
        "query_id", "rk", "url", F.round("dist_km", 6).alias("dist_km")
    )


def flat_knn_sql(pages_rel: str, queries_rel: str, k: int = 10) -> str:
    """DuckDB oracle: identical semantics, identical haversine formula."""
    hav = geo.haversine_km_sql("p.lat", "p.lon", "q.lat", "q.lon")
    return f"""
        SELECT query_id, rk, url, ROUND(dist_km, 6) AS dist_km
        FROM (
            SELECT q.query_id, p.url,
                   {hav} AS dist_km,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {hav} ASC, p.url ASC
                   ) AS rk
            FROM {pages_rel} p, {queries_rel} q
            WHERE p.lat IS NOT NULL
        ) t
        WHERE rk <= {k}
    """


def _ring_guarantee_km(radius: int, res: int, qlat_col, nx: int):
    """Lower bound on the distance from a query to any point OUTSIDE its
    ring of Chebyshev radius ``radius`` (grid cells) — the pruning bound.

    lat-separation bound: radius * cell_deg degrees of latitude.
    lon-separation bound: 2R * cmin * sin(min(radius*cell_deg, 180)/2 rad)
    where cmin = min cos(lat) over the ring's latitude band; if the band
    touches a pole, cmin = 0 and only full longitude coverage
    (2*radius+1 >= nx) restores the bound.
    Returns a Column (per-query, depends on query latitude).
    """
    cd = geo.cell_deg(res)
    lat_bound = F.lit(radius * cd * geo.KM_PER_DEG)
    band = (radius + 1) * cd
    # worst |lat| inside the band:
    worst_abs_lat = F.least(F.abs(qlat_col) + F.lit(band), F.lit(90.0))
    cmin = F.cos(F.radians(worst_abs_lat))
    dlon_deg = F.lit(min(radius * cd, 180.0))
    lon_bound = (
        F.lit(2.0 * geo.EARTH_RADIUS_KM)
        * F.greatest(cmin, F.lit(0.0))
        * F.sin(F.radians(dlon_deg) / 2.0)
    )
    full_wrap = F.lit(2 * radius + 1 >= nx)
    return F.when(full_wrap, lat_bound).otherwise(F.least(lat_bound, lon_bound))


def cell_knn(
    pages_geo: DataFrame,
    queries: DataFrame,
    k: int = 10,
    res: int = 7,
    init_radius: int = 1,
    max_rounds: int = 4,
    search_k: int | None = None,
) -> DataFrame:
    """Exact kNN via cell-ring candidate generation + re-rank.

    Driver-side escalation: each round triples the ring radius for queries
    whose top-k is not yet provably complete; after ``max_rounds`` the
    stragglers (pole-adjacent or ultra-sparse regions) fall back to
    ``flat_knn`` — correctness never depends on the index.

    If ``search_k`` is given, a query is also accepted once it has seen
    >= search_k candidates (the reference's budget semantics: approximate,
    recall monotone in search_k).
    """
    spark = pages_geo.sparkSession
    nx = 2 << res
    pages_cells = (
        pages_geo.filter(F.col("lat").isNotNull())
        .select("url", "lat", "lon")
        .withColumn("cell", geo.encode_cell(F.col("lat"), F.col("lon"), res))
        .cache()  # scanned once per round; at cluster scale this is a
        # cell-bucketed persisted table (partition pruning does the same job)
    )

    remaining = queries.select(
        "query_id", F.col("lat").alias("qlat"), F.col("lon").alias("qlon")
    )
    n_remaining = remaining.count()
    settled_parts: list[DataFrame] = []
    radius = init_radius

    for _ in range(max_rounds):
        if n_remaining == 0:
            break
        qcells = remaining.withColumn(
            "qcell", geo.encode_cell(F.col("qlat"), F.col("qlon"), res)
        )
        exploded = qcells.select(
            "query_id",
            "qlat",
            "qlon",
            F.explode(geo.ring_cells(F.col("qcell"), res, radius)).alias("cell"),
        )
        cands = F.broadcast(exploded).join(pages_cells, "cell").withColumn(
            "dist_km",
            geo.haversine_km(F.col("lat"), F.col("lon"), F.col("qlat"), F.col("qlon")),
        )
        # ring_cells is array_distinct and urls are unique -> (query, url)
        # pairs are already unique; skip the dedup shuffle
        ranked = topk_per_group(
            cands.select("query_id", "qlat", "url", "dist_km"),
            ["query_id"],
            "dist_km",
            "url",
            k,
            dedup=False,
        )
        # materialize the (small: <= |remaining| * k rows) round result once;
        # stats, output slice, and the final union all read these blocks
        # instead of re-running the candidate join
        ranked = ranked.localCheckpoint(eager=True)
        ok_pred = (F.col("cnt") >= k) & (
            F.col("kth") < _ring_guarantee_km(radius, res, F.col("qlat"), nx)
        )
        if search_k is not None:
            ok_pred = ok_pred | (F.col("cnt") >= F.lit(min(search_k, k)))
        stats = ranked.groupBy("query_id").agg(
            F.count("*").alias("cnt"),
            F.max("dist_km").alias("kth"),
            F.first("qlat").alias("qlat"),
        )
        ok_ids = [r["query_id"] for r in stats.filter(ok_pred).select("query_id").collect()]
        if ok_ids:
            done = ranked.filter(F.col("query_id").isin(ok_ids)).select(
                "query_id", "rk", "url", F.round("dist_km", 6).alias("dist_km")
            )
            settled_parts.append(done)
            remaining = remaining.filter(~F.col("query_id").isin(ok_ids))
            n_remaining -= len(ok_ids)
        radius *= 3

    # exact fallback for stragglers (budget exhausted) — reference invariant:
    # budget >= corpus implies exact results
    if n_remaining > 0:
        settled_parts.append(flat_knn(pages_geo, remaining.withColumnRenamed("qlat", "lat").withColumnRenamed("qlon", "lon"), k))

    if not settled_parts:
        return spark.createDataFrame([], "query_id long, rk int, url string, dist_km double")
    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionByName(part)
    return out
