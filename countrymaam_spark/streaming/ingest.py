"""Structured Streaming ingest: a continuously-arriving pages crawl feed.

The reference is strictly batch (its "streams" are Go channels used for
intra-process pipelining, /root/reference/pipeline/pipeline.go:9-110); this
module is the v2 surface the north star leaves open — streaming ingest of
pages into the same geotag -> cell pipeline, with event-time watermarks and
windowed per-cell rollups for late-arriving crawl records.

All transformations reuse the batch operators (extract_geo, encode_cell are
plain Column expressions, legal in streaming plans). Tests drive it with the
rate source / a file source feeding fixture parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo
from countrymaam_spark.operators.geotag import extract_geo


def stream_pages_from_dir(spark, dir_path: str, schema) -> DataFrame:
    """File-source stream over a directory of pages parquet drops."""
    return spark.readStream.schema(schema).parquet(dir_path)


def geotag_stream(pages_stream: DataFrame, res: int = 7) -> DataFrame:
    """Streaming geotag + cell encode (stateless — pure column expressions)."""
    return (
        extract_geo(pages_stream)
        .filter(F.col("lat").isNotNull())
        .withColumn("cell", geo.encode_cell(F.col("lat"), F.col("lon"), res))
    )


def windowed_cell_counts(
    geo_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    parent_res: int = 4,
    res: int = 7,
) -> DataFrame:
    """Event-time windowed per-parent-cell page counts with late-data bound.

    Watermark on ``warc_ts`` drops records later than the horizon and lets
    state for closed windows be evicted — the standard streaming rollup shape
    (tile-server freshness feed).
    """
    return (
        geo_stream.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            geo.cell_parent(F.col("cell"), parent_res, res).alias("parent"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "parent",
            "n_pages",
        )
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, mode: str = "append"):
    """Start the query into an in-memory sink (tests/demo); returns the
    StreamingQuery — caller awaits and stops."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
