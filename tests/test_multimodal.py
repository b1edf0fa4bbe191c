"""Multimodal plumbing: schemas, determinism, batch behavior (decode itself
is a documented deterministic stub)."""

import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    df = mm.synth_assets(spark, n=90).cache()
    df.count()
    return df


def test_asset_schema(assets):
    assert dict(assets.dtypes)["payload"] == "binary"
    assert assets.count() == 90
    kinds = {r["kind"] for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_features_shape_and_determinism(spark, assets):
    f1 = mm.extract_features(assets)
    rows = f1.collect()
    assert len(rows) == 90
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], r["feat"])
        assert len(r["feat"]) == 4
        assert isinstance(r["fp"], int)
    # deterministic across runs and partitionings
    rows2 = mm.extract_features(assets.repartition(7)).collect()
    assert {(r["asset_id"], r["fp"], tuple(r["feat"])) for r in rows} == {
        (r["asset_id"], r["fp"], tuple(r["feat"])) for r in rows2
    }


def test_video_frame_sampling(assets):
    frames = mm.sample_video_frames(assets, k=4).collect()
    vids = assets.filter(F.col("kind") == "video").count()
    assert len(frames) == vids * 4
    per = {}
    for r in frames:
        per.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())


def test_near_dup_assets_self_consistent(spark, assets):
    feats = mm.extract_features(assets).cache()
    # append an exact duplicate payload -> hamming 0 pair must be found
    dup = assets.filter(F.col("asset_id") == 0).withColumn("asset_id", F.lit(10_000).cast("long"))
    feats_dup = mm.extract_features(assets.unionByName(dup))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in mm.near_dup_assets(feats_dup, max_hamming=0).collect()}
    assert pairs.get((0, 10_000)) == 0


def test_asset_stats_matches_duckdb_oracle(spark):
    """The multimodal driver entry: mapInPandas over binary+meta, bit-exact
    vs the SQL oracle (sha256 over the hex encoding — DuckDB's sha256 takes
    VARCHAR only)."""
    import duckdb

    from countrymaam_spark.sources import pages as pg

    out = pg.ensure_fixtures("sf0.001")
    p = f"'{out}/assets.parquet'"
    assets = spark.read.parquet(f"{out}/assets.parquet")
    got = {tuple(r) for r in mm.asset_stats(assets).collect()}
    want = set(duckdb.sql(mm.asset_stats_sql(p)).fetchall())
    assert got == want and len(got) == 400


def test_asset_near_dups_matches_duckdb_oracle(spark):
    import duckdb

    from countrymaam_spark.sources import pages as pg

    out = pg.ensure_fixtures("sf0.001")
    p = f"'{out}/assets.parquet'"
    assets = spark.read.parquet(f"{out}/assets.parquet")
    feats = mm.asset_stats(assets).select("asset_id", "fp")
    got = {tuple(r) for r in mm.near_dup_assets(feats, max_hamming=3).collect()}
    want = set(duckdb.sql(mm.near_dup_assets_sql(p)).fetchall())
    assert got == want
    assert len(got) >= 30  # the planted duplicate payloads are found
