"""Point-in-polygon join: candidates-then-verify, the countrymaam pattern
(coarse candidate generation -> exact verification) applied to containment.

Coarse stage: each polygon's bbox is covered by quad-cells at ``res``; pages
equi-join on cell (only the covered slice of the corpus is touched — at 100 TB
this is the partition-pruning stage). Exact stage: ray casting as pure column
math over (candidate page x polygon edge), crossing-parity aggregated per
(poly, page). No UDFs anywhere.

Limitation (documented): polygons must not cross the antimeridian (the
fixture generator guarantees this); split such polygons upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo


def _cover_cells(edges: DataFrame, res: int) -> DataFrame:
    """polygon bbox -> exploded cover cells (poly_id, cell)."""
    nx, ny = 2 << res, 1 << res
    step = F.lit(geo.cell_deg(res))
    bbox = edges.groupBy("poly_id").agg(
        F.least(F.min("lat1"), F.min("lat2")).alias("lat_lo"),
        F.greatest(F.max("lat1"), F.max("lat2")).alias("lat_hi"),
        F.least(F.min("lon1"), F.min("lon2")).alias("lon_lo"),
        F.greatest(F.max("lon1"), F.max("lon2")).alias("lon_hi"),
    )
    x_lo = F.greatest(F.floor((F.col("lon_lo") + 180.0) / step).cast("long"), F.lit(0))
    x_hi = F.least(F.floor((F.col("lon_hi") + 180.0) / step).cast("long"), F.lit(nx - 1))
    y_lo = F.greatest(F.floor((F.col("lat_lo") + 90.0) / step).cast("long"), F.lit(0))
    y_hi = F.least(F.floor((F.col("lat_hi") + 90.0) / step).cast("long"), F.lit(ny - 1))
    base = F.lit(res) * F.lit(2**53)
    return (
        bbox.select(
            "poly_id",
            F.explode(F.sequence(x_lo, x_hi)).alias("cx"),
            y_lo.alias("y_lo"),
            y_hi.alias("y_hi"),
        )
        .select(
            "poly_id",
            "cx",
            F.explode(F.sequence(F.col("y_lo"), F.col("y_hi"))).alias("cy"),
        )
        .select(
            "poly_id",
            (base + F.col("cx") * F.lit(2**26) + F.col("cy")).alias("cell"),
        )
    )


def point_in_polygon(
    pages_geo: DataFrame, edges: DataFrame, res: int = 6,
    broadcast_polygons: bool = True,
) -> DataFrame:
    """-> (poly_id, url) pairs where the page's point lies inside the ring
    (ray-casting crossing parity; boundary points follow the half-open rule).

    ``broadcast_polygons=True`` (default) is the small-dim-table plan: cover
    cells and the edge table broadcast, the page scan never shuffles. For a
    country-scale polygon table that cannot broadcast, pass False: the cover
    join becomes a shuffle (sort-merge / shuffled-hash, Catalyst + AQE pick,
    AQE skew-split handles mega-polygons) keyed on cell, and the verify join
    shuffles candidates by poly_id — only candidate pages move, never the
    full scan."""
    pages_cells = (
        pages_geo.filter(F.col("lat").isNotNull())
        .select("url", "lat", "lon")
        .withColumn("cell", geo.encode_cell(F.col("lat"), F.col("lon"), res))
    )
    cover = _cover_cells(edges, res)
    e = edges.select("poly_id", "lat1", "lon1", "lat2", "lon2")
    if broadcast_polygons:
        cover = F.broadcast(cover)
        e = F.broadcast(e)
    cand = pages_cells.join(cover, "cell").select("poly_id", "url", "lat", "lon")
    pairs = cand.join(e, "poly_id")
    crosses = (
        (F.col("lat1") > F.col("lat")) != (F.col("lat2") > F.col("lat"))
    ) & (
        F.col("lon")
        < (F.col("lon2") - F.col("lon1"))
        * (F.col("lat") - F.col("lat1"))
        / (F.col("lat2") - F.col("lat1"))
        + F.col("lon1")
    )
    return (
        pairs.groupBy("poly_id", "url")
        .agg(F.sum(F.when(crosses, 1).otherwise(0)).alias("crossings"))
        .filter(F.col("crossings") % 2 == 1)
        .select("poly_id", "url")
    )


def point_in_polygon_sql(pages_rel: str, edges_rel: str) -> str:
    """Oracle: brute-force pages x edges ray cast (no coarse stage)."""
    return f"""
        SELECT poly_id, url
        FROM (
            SELECT e.poly_id, p.url,
                   SUM(CASE WHEN ((e.lat1 > p.lat) <> (e.lat2 > p.lat))
                             AND (p.lon < (e.lon2 - e.lon1) * (p.lat - e.lat1)
                                          / (e.lat2 - e.lat1) + e.lon1)
                            THEN 1 ELSE 0 END) AS crossings
            FROM {pages_rel} p, {edges_rel} e
            WHERE p.lat IS NOT NULL
            GROUP BY e.poly_id, p.url
        ) t
        WHERE crossings % 2 = 1
    """


def polygon_page_counts(pages_geo: DataFrame, edges: DataFrame, res: int = 6) -> DataFrame:
    """Aggregate flavor: pages contained per polygon (empty polygons -> 0)."""
    inside = point_in_polygon(pages_geo, edges, res)
    polys = edges.select("poly_id").distinct()
    return (
        polys.join(inside, "poly_id", "left")
        .groupBy("poly_id")
        .agg(F.count("url").alias("n_pages"))
    )
