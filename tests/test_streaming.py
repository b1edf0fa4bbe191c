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
