"""Host-level crawl-curation operators over the Common-Crawl-style pages
table (url string, warc_ts timestamp, html binary, text string, lang string).

The webtext counterpart of the geo rollups: a recrawl pipeline dedups its
crawl frontier per host/url by fetch time and curates hosts by aggregate
stats before any expensive per-page work.  Both operators are one shuffle on
the host key and stay entirely JVM-side (regexp + window / hash aggregate):

- ``host_latest``  — newest-k snapshots per host (recrawl / frontier dedup
  semantics).  The rank filter compiles to WindowGroupLimit in Spark 4, so
  each map task retains only k rows per host BEFORE the exchange: the
  shuffle is O(|hosts| * k), not O(corpus), at 10^12 pages.
- ``host_stats``   — per-host page count, distinct languages, total text
  bytes, and first/last fetch times.  Pure partial-aggregate shapes (sum /
  count / min / max); COUNT(DISTINCT lang) expands to the standard two-level
  expand+agg, bounded at 5 langs per host in the fixture and by the
  ISO-639 alphabet in the wild.

Determinism: every output column is exact (string / bigint); timestamps are
emitted as whole-second epochs (the fixture's warc_ts is whole seconds), so
the DuckDB oracle is bit-identical regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOST_RE = r"^https?://([^/]+)"  # same pattern as geotag.domain_spread


def host_latest(pages: DataFrame, k: int = 1) -> DataFrame:
    """Newest-k pages per host: (host, url, ts_s, lang, rn).

    Order is (warc_ts DESC, url DESC) — the url tiebreak makes the pick
    deterministic when a host has equal fetch times.  rn (1 = newest) is
    kept in the output so consumers can distinguish the freshest snapshot
    from the k-1 runners-up without re-windowing.
    """
    host = F.regexp_extract(F.col("url"), HOST_RE, 1)
    w = Window.partitionBy("host").orderBy(
        F.col("warc_ts").desc(), F.col("url").desc()
    )
    return (
        pages.select(
            host.alias("host"),
            "url",
            F.unix_timestamp(F.col("warc_ts")).cast("long").alias("ts_s"),
            "lang",
            F.col("warc_ts"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("host", "url", "ts_s", "lang", F.col("rn").cast("long").alias("rn"))
    )


def host_latest_sql(pages_rel: str, k: int = 1) -> str:
    """DuckDB oracle: identical window + rank filter."""
    return f"""
        SELECT host, url, ts_s, lang, rn FROM (
            SELECT regexp_extract(url, '{HOST_RE}', 1) AS host,
                   url,
                   CAST(floor(epoch(warc_ts)) AS BIGINT) AS ts_s,
                   lang,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY regexp_extract(url, '{HOST_RE}', 1)
                       ORDER BY warc_ts DESC, url DESC
                   ) AS BIGINT) AS rn
            FROM {pages_rel}
        ) WHERE rn <= {int(k)}
    """


def host_stats(pages: DataFrame) -> DataFrame:
    """Per-host crawl stats: (host, n_pages, n_langs, text_chars,
    first_ts_s, last_ts_s).

    All-exact aggregate over one hash shuffle on host; text_chars is the
    curation budget signal (how much text a host contributes to the corpus),
    first/last fetch times bound the host's crawl window.
    """
    host = F.regexp_extract(F.col("url"), HOST_RE, 1)
    ts_s = F.unix_timestamp(F.col("warc_ts")).cast("long")
    return (
        pages.select(
            host.alias("host"),
            F.length("text").cast("long").alias("_len"),
            ts_s.alias("_ts"),
            "lang",
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("_len").alias("text_chars"),
            F.min("_ts").alias("first_ts_s"),
            F.max("_ts").alias("last_ts_s"),
        )
    )


def host_stats_sql(pages_rel: str) -> str:
    """DuckDB oracle: same exact-typed aggregate."""
    return f"""
        SELECT regexp_extract(url, '{HOST_RE}', 1) AS host,
               COUNT(*) AS n_pages,
               COUNT(DISTINCT lang) AS n_langs,
               CAST(SUM(length(text)) AS BIGINT) AS text_chars,
               MIN(CAST(floor(epoch(warc_ts)) AS BIGINT)) AS first_ts_s,
               MAX(CAST(floor(epoch(warc_ts)) AS BIGINT)) AS last_ts_s
        FROM {pages_rel}
        GROUP BY 1
    """
