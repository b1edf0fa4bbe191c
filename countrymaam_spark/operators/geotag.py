"""Geotag extraction: pages(text) -> (lat, lon) + byte-identity digest.

Extraction is a JVM-side ``regexp_extract`` (whole-stage codegen — strictly
faster than the pandas-UDF alternative the north star allows; no Python in
this hot path). ``text_sha`` witnesses the per-url byte-identity invariant
(input_hint): the engine only ever *reads* text, so sha256(text) computed at
any stage equals the generator's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared with the DuckDB oracle (RE2/Java-regex common subset)
GEO_RE = r"near \w+ \((-?[0-9]+\.[0-9]+), (-?[0-9]+\.[0-9]+)\)"


def extract_geo(pages: DataFrame) -> DataFrame:
    """pages -> url, warc_ts, lang, text, text_sha, lat, lon.

    Rows with no place mention get NULL lat/lon (kept; downstream geo
    operators filter them).
    """
    # try_cast: '' (no match) -> NULL without evaluating the regexp twice
    # (nullif(a, '') expands to CASE WHEN a = '' ... and re-evaluates a)
    lat_s = F.regexp_extract(F.col("text"), GEO_RE, 1).try_cast("double")
    lon_s = F.regexp_extract(F.col("text"), GEO_RE, 2).try_cast("double")
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        "text",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        lat_s.alias("lat"),
        lon_s.alias("lon"),
    )


def extract_geo_sql(pages_rel: str) -> str:
    """Oracle-side equivalent over the same parquet relation."""
    return f"""
        SELECT url, warc_ts, lang, text,
               sha256(text) AS text_sha,
               CAST(NULLIF(regexp_extract(text, '{GEO_RE}', 1), '') AS DOUBLE) AS lat,
               CAST(NULLIF(regexp_extract(text, '{GEO_RE}', 2), '') AS DOUBLE) AS lon
        FROM {pages_rel}
    """
