"""Fixture determinism + geotag extraction byte-identity invariant."""

import os

import duckdb
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from countrymaam_spark.operators.geotag import extract_geo, extract_geo_sql
from countrymaam_spark.sources import pages as pg


def test_generator_deterministic(tmp_path):
    t1 = pg.gen_pages(500)
    t2 = pg.gen_pages(500)
    assert t1.equals(t2)


def test_fixture_files_exist():
    out = pg.ensure_fixtures("sf0.001")
    for f in ("pages.parquet", "pages_truth.parquet", "knn_queries.parquet", "polygon_edges.parquet"):
        assert os.path.exists(os.path.join(out, f))
    t = pq.read_table(os.path.join(out, "pages.parquet"))
    assert t.num_rows == pg.SF_ROWS["sf0.001"]
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]


def test_extract_geo_recovers_truth(spark):
    out = pg.ensure_fixtures("sf0.001")
    pages = spark.read.parquet(os.path.join(out, "pages.parquet"))
    truth = spark.read.parquet(os.path.join(out, "pages_truth.parquet"))
    got = extract_geo(pages).select("url", "lat", "lon")
    joined = got.join(truth, "url")
    bad = joined.filter(
        (F.col("lat") != F.col("_true_lat")) | (F.col("lon") != F.col("_true_lon"))
        | F.col("lat").isNull()
    )
    assert bad.count() == 0


def test_text_byte_identity_sha(spark):
    """sha256(text) computed by the engine == generator-side sha (DuckDB)."""
    out = pg.ensure_fixtures("sf0.001")
    p = os.path.join(out, "pages.parquet")
    engine = {
        r["url"]: r["text_sha"]
        for r in extract_geo(spark.read.parquet(p)).select("url", "text_sha").collect()
    }
    oracle = dict(duckdb.sql(f"SELECT url, sha256(text) FROM '{p}'").fetchall())
    assert engine == oracle


def test_extract_geo_matches_duckdb_oracle(spark):
    out = pg.ensure_fixtures("sf0.001")
    p = os.path.join(out, "pages.parquet")
    engine = {
        (r["url"], r["lat"], r["lon"])
        for r in extract_geo(spark.read.parquet(p)).select("url", "lat", "lon").collect()
    }
    oracle = set(
        duckdb.sql(
            f"SELECT url, lat, lon FROM ({extract_geo_sql(repr(p))})"
        ).fetchall()
    )
    assert engine == oracle


def test_extract_geo_null_text_is_null_safe(spark):
    """Regression (advisor r2): NULL text must not crash the extraction UDF —
    the row survives with NULL text_sha/lat/lon, matching the NULL-safe JVM
    path this UDF replaced (and sha256(NULL) IS NULL in the oracle)."""
    df = spark.createDataFrame(
        [("u1", None), ("u2", "visited near Oslo (59.91, 10.75) today")],
        "url string, text string",
    ).withColumn("warc_ts", F.current_timestamp()).withColumn("lang", F.lit("en"))
    rows = {r["url"]: r for r in extract_geo(df).collect()}
    assert rows["u1"]["text_sha"] is None
    assert rows["u1"]["lat"] is None and rows["u1"]["lon"] is None
    assert rows["u2"]["lat"] == 59.91 and rows["u2"]["text_sha"] is not None


def test_domain_spread_matches_duckdb_oracle(spark):
    """Per-domain centroid + mean haversine dispersion, bit-exact vs the
    DuckDB oracle (exact-decimal sums on both sides)."""
    from countrymaam_spark.operators.geotag import domain_spread, domain_spread_sql

    out = pg.ensure_fixtures("sf0.001")
    p = os.path.join(out, "pages.parquet")
    g = extract_geo(spark.read.parquet(p))
    got = sorted(map(tuple, domain_spread(g).collect()))
    rel = "(" + extract_geo_sql(repr(p)) + ")"
    want = sorted(map(tuple, duckdb.sql(domain_spread_sql(rel)).fetchall()))
    assert got == want and len(got) > 0


def test_domain_spread_partition_invariant(spark):
    """The decimal summation makes the output independent of partitioning —
    a plain double avg() would flip 6-dp roundings with summation order."""
    from countrymaam_spark.operators.geotag import domain_spread

    out = pg.ensure_fixtures("sf0.001")
    g = extract_geo(spark.read.parquet(os.path.join(out, "pages.parquet")))
    a = sorted(map(tuple, domain_spread(g.coalesce(1)).collect()))
    b = sorted(map(tuple, domain_spread(g.repartition(17, "url")).collect()))
    assert a == b
