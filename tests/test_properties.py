"""Property-style invariants of the cell/tile scalar layer, exercised over
seeded random + adversarial coordinate batches (one Spark job per property,
vectorized — the SURVEY §5 'statistical/property assertions' tier).

These are the invariants other operators silently rely on:
- parent nesting: encoding at a coarse res == cell_parent of the fine cell
  (cell_knn's coarse-ring join and the streaming rollup oracle depend on it)
- ring coverage: a point within Chebyshev cell distance r of a query is in
  the query's radius-r ring (cell_knn candidate completeness)
- engine/oracle formula parity on poles, antimeridian, and cell boundaries
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo


def _points(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    # adversarial: poles, antimeridian, equator, exact cell boundaries
    edges = np.array(
        [
            [90.0, 180.0], [-90.0, -180.0], [89.999999, 179.999999],
            [-89.999999, -179.999999], [0.0, 0.0], [45.0, -180.0],
            [-45.0, 180.0], [0.703125, 0.703125],  # res-8 cell corner
            [1.40625, -1.40625],                   # res-7 cell corner
        ]
    )
    lat = np.concatenate([lat, edges[:, 0]])
    lon = np.concatenate([lon, edges[:, 1]])
    return lat, lon


@pytest.fixture(scope="module")
def pts(spark):
    lat, lon = _points()
    return spark.createDataFrame(
        [(float(a), float(o)) for a, o in zip(lat, lon)], "lat double, lon double"
    ).cache()


def test_parent_nesting_equals_direct_encoding(spark, pts):
    """encode(res=p) == cell_parent(encode(res=c), p, c) for every p < c."""
    for c, p in [(7, 4), (7, 3), (8, 7), (12, 6), (26, 0)]:
        bad = pts.filter(
            geo.encode_cell(F.col("lat"), F.col("lon"), p)
            != geo.cell_parent(geo.encode_cell(F.col("lat"), F.col("lon"), c), p, c)
        ).count()
        assert bad == 0, (c, p)


def test_ring_covers_chebyshev_neighbors(spark, pts):
    """A point r cells away (Chebyshev, with lon wrap) is inside ring(r)."""
    res, r = 6, 2
    cd = geo.cell_deg(res)
    # displace each point by up to r cells in both axes
    moved = pts.select(
        "lat",
        "lon",
        F.least(F.greatest(F.col("lat") + F.lit(1.9 * cd), F.lit(-89.999999)), F.lit(89.999999)).alias("mlat"),
        (((F.col("lon") + F.lit(1.9 * cd) + 180.0) % 360.0) - 180.0).alias("mlon"),
    )
    bad = moved.filter(
        ~F.array_contains(
            geo.ring_cells(geo.encode_cell(F.col("lat"), F.col("lon"), res), res, r),
            geo.encode_cell(F.col("mlat"), F.col("mlon"), res),
        )
    ).count()
    assert bad == 0


def test_encode_cell_oracle_parity_on_adversarial_points(spark, pts):
    """The Spark Column formula and the DuckDB SQL template agree bit-for-bit
    on random + adversarial coordinates at several resolutions."""
    pdf = pts.toPandas()
    con = duckdb.connect()
    con.register("pts", pdf)
    for res in (0, 4, 7, 12):
        got = (
            pts.select(geo.encode_cell(F.col("lat"), F.col("lon"), res).alias("c"))
            .toPandas()["c"]
            .tolist()
        )
        want = con.execute(
            f"SELECT {geo.encode_cell_sql('lat', 'lon', res)} AS c FROM pts"
        ).df()["c"].tolist()
        assert got == want, res


def test_haversine_properties(spark, pts):
    """Symmetry, identity, and range of the haversine kernel."""
    a = pts.select(
        geo.haversine_km(F.col("lat"), F.col("lon"), F.col("lat"), F.col("lon")).alias("self_d"),
        geo.haversine_km(F.col("lat"), F.col("lon"), F.lit(10.0), F.lit(20.0)).alias("ab"),
        geo.haversine_km(F.lit(10.0), F.lit(20.0), F.col("lat"), F.col("lon")).alias("ba"),
    )
    row = a.agg(
        F.max("self_d").alias("max_self"),
        F.max(F.abs(F.col("ab") - F.col("ba"))).alias("asym"),
        F.max("ab").alias("max_d"),
    ).collect()[0]
    assert row["max_self"] == 0.0
    assert row["asym"] < 1e-9
    assert row["max_d"] <= 2 * 3.141592653589793 * geo.EARTH_RADIUS_KM / 2 + 1e-6


def test_empty_inputs_are_legal(spark):
    """Reference semantics: fewer than k results are legal; empty query sets
    and all-null-geo corpora must not error (SURVEY invariant 4)."""
    from countrymaam_spark.operators.knn import cell_knn, flat_knn
    from countrymaam_spark.operators.pip import point_in_polygon

    corpus = spark.createDataFrame(
        [("u0", 10.0, 20.0), ("u1", None, None)], "url string, lat double, lon double"
    )
    no_geo = corpus.filter(F.col("lat").isNull())
    no_q = spark.createDataFrame([], "query_id long, lat double, lon double")
    one_q = spark.createDataFrame([(0, 10.0, 20.0)], "query_id long, lat double, lon double")

    assert flat_knn(corpus, no_q, k=3).count() == 0
    assert cell_knn(corpus, no_q, k=3, res=5).count() == 0
    # corpus with zero geotagged rows -> zero results, no error
    assert flat_knn(no_geo, one_q, k=3).count() == 0
    assert cell_knn(no_geo, one_q, k=3, res=5).count() == 0
    # fewer than k: 1-row corpus serving k=3 returns 1 row
    assert flat_knn(corpus, one_q, k=3).count() == 1
    assert cell_knn(corpus, one_q, k=3, res=5).count() == 1

    edges = spark.createDataFrame(
        [], "poly_id long, lat1 double, lon1 double, lat2 double, lon2 double"
    )
    assert point_in_polygon(corpus, edges, res=5).count() == 0


def test_radius_join_complete_on_adversarial_points(spark, pts):
    """radius_join == brute-force pair filter when the QUERY set is the
    adversarial batch itself (true poles, antimeridian, cell corners) over
    the full random corpus — candidate completeness of the analytically
    sized rings everywhere on the sphere."""
    from countrymaam_spark.operators.knn import radius_join

    corpus = pts.withColumn(
        "url", F.concat(F.lit("p"), F.monotonically_increasing_id())
    ).cache()
    # 9 adversarial edge points (tail of _points) + every 400th random point
    n = corpus.count()
    queries = (
        corpus.withColumn("rid", F.monotonically_increasing_id())
        .filter((F.col("rid") >= n - 9) | (F.col("rid") % 400 == 0))
        .select(F.col("rid").alias("query_id"), "lat", "lon")
        .cache()
    )
    for radius_km, res in [(120.0, 7), (900.0, 5)]:
        got = sorted(
            (r["query_id"], r["url"])
            for r in radius_join(corpus, queries, radius_km, res=res)
            .select("query_id", "url")
            .collect()
        )
        brute = sorted(
            (r["query_id"], r["url"])
            for r in corpus.crossJoin(
                queries.select(
                    "query_id",
                    F.col("lat").alias("qlat"),
                    F.col("lon").alias("qlon"),
                )
            )
            .filter(
                geo.haversine_km(
                    F.col("lat"), F.col("lon"), F.col("qlat"), F.col("qlon")
                )
                <= radius_km
            )
            .select("query_id", "url")
            .collect()
        )
        assert got == brute, (radius_km, res)
