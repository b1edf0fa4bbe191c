"""Structured Streaming ingest: file-source drops -> geotag -> windowed
per-cell rollups; streaming result must equal the batch equivalent."""

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo
from countrymaam_spark.operators.geotag import extract_geo
from countrymaam_spark.sources import pages as pg
from countrymaam_spark.streaming import ingest


@pytest.fixture(scope="module")
def drop_dir(tmp_path_factory):
    """Two parquet 'crawl drops' split from the sf0.001 fixture."""
    out = pg.ensure_fixtures("sf0.001")
    src = os.path.join(out, "pages.parquet")
    t = pq.read_table(src)
    d = tmp_path_factory.mktemp("drops")
    pq.write_table(t.slice(0, 1000), os.path.join(d, "drop1.parquet"))
    pq.write_table(t.slice(1000), os.path.join(d, "drop2.parquet"))
    return str(d)


def test_streaming_counts_equal_batch(spark, drop_dir):
    batch = spark.read.parquet(drop_dir)
    schema = batch.schema
    stream = ingest.stream_pages_from_dir(spark, drop_dir, schema)
    assert stream.isStreaming
    rolled = ingest.windowed_cell_counts(ingest.geotag_stream(stream))
    # append mode would hold every window open until a LATER batch advances
    # the watermark; a finite availableNow run therefore emits nothing.
    # complete mode emits the full rollup each commit.
    q = ingest.run_to_memory_sink(rolled, "cell_counts_test", mode="complete")
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["parent"]): r["n_pages"]
        for r in spark.sql("SELECT * FROM cell_counts_test").collect()
    }
    g = extract_geo(batch).filter(F.col("lat").isNotNull()).withColumn(
        "cell", geo.encode_cell(F.col("lat"), F.col("lon"), 7)
    )
    want = {
        (r["w"]["start"], r["parent"]): r["n"]
        for r in g.groupBy(
            F.window("warc_ts", "10 minutes").alias("w"),
            geo.cell_parent(F.col("cell"), 4, 7).alias("parent"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) == 2000


def test_stateful_sessionize_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: state carries (last ts, counts)
    across micro-batches; with time-ordered drops the final update per user
    equals the batch lag+running-sum sessionization exactly."""
    from pyspark.sql import Window

    from countrymaam_spark.streaming import sessionize as SZ

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two time-ordered drops -> two micro-batches -> state must carry over
    cut = events.agg(
        F.median(F.unix_timestamp(F.col("ts"))).alias("m")
    ).collect()[0]["m"]
    d = tmp_path / "edrops"
    d.mkdir()
    ets = F.unix_timestamp(F.col("ts"))
    events.filter(ets <= cut).coalesce(1).write.parquet(str(d / "d1"))
    events.filter(ets > cut).coalesce(1).write.parquet(str(d / "d2"))
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for sub in ("d1", "d2"):
        for f in sorted((d / sub).glob("*.parquet")):
            shutil.copy(f, flat / f"drop{n}.parquet")
            n += 1

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # one drop per micro-batch
        .parquet(str(flat))
    )
    q = (
        SZ.sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per user wins (memory sink appends one row per batch)
    updates = spark.sql("SELECT * FROM sess_state_test").toPandas()
    got = {
        int(r.user_id): (int(r.n_sessions), int(r.n_events))
        for _, r in updates.groupby("user_id").tail(1).iterrows()
    }

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp(F.col("ts")) - F.lag(F.unix_timestamp(F.col("ts"))).over(w)
    batch = (
        events.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id")
        .agg(F.max("sess_id").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    want = {
        int(r["user_id"]): (int(r["n_sessions"]), int(r["n_events"]))
        for r in batch.collect()
    }
    assert got == want and len(want) > 0
