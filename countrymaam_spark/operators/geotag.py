"""Geotag extraction: pages(text) -> (lat, lon) + byte-identity digest.

One vectorized pandas UDF per Arrow batch (the plan the input_hint mandates:
"geotagged from extracted text ... via vectorized pandas/Arrow UDFs"):
compiled-regex extraction plus sha256, computed together in one pass over the
text column. ``text_sha`` witnesses the per-url byte-identity invariant: the
engine only ever *reads* text, so sha256(text) computed at any stage equals
the generator's.

Why not JVM expressions: measured on 20M rows, ``F.sha2`` is serialized by
``MessageDigest.getInstance`` provider-lookup synchronization (58s at 4 cores
-> 51s at 16 — zero scaling), and the codegen'd ``regexp_extract`` path shows
bimodal JIT behavior at this width. Python workers are one PROCESS per core —
no shared-lock ceiling — and hashlib/re run at C speed per batch; the same
job runs in ~7s at 16 cores and scales.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared with the DuckDB oracle (RE2/Java/Python-regex common subset)
GEO_RE = r"near \w+ \((-?[0-9]+\.[0-9]+), (-?[0-9]+\.[0-9]+)\)"
_GEO_PAT = re.compile(GEO_RE)


def _make_latlon():
    # created lazily: pandas_udf parses its DDL return type against the
    # active session, so decorating at import time would require a context
    @F.pandas_udf("struct<lat:double, lon:double>")
    def _latlon(texts: pd.Series) -> pd.DataFrame:
        ext = texts.str.extract(_GEO_PAT)
        return pd.DataFrame(
            {
                "lat": pd.to_numeric(ext[0], errors="coerce"),
                "lon": pd.to_numeric(ext[1], errors="coerce"),
            }
        )

    # the values ARE deterministic (regex); the marker only stops Catalyst
    # pushing a consumer's lat-IS-NOT-NULL filter below the projection and
    # DUPLICATING the UDF — the .explain showed two ArrowEvalPython nodes
    # (one for the filter, one for the output), i.e. every filtered consumer
    # paid the extraction twice
    return _latlon.asNondeterministic()


def _make_sha():
    @F.pandas_udf("string")
    def _sha(texts: pd.Series) -> pd.Series:
        # NULL text stays a NULL sha (the JVM sha2 path this UDF replaced
        # was NULL-safe; na_action keeps that contract instead of crashing
        # the task on t.encode(None))
        return texts.map(
            lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest(),
            na_action="ignore",
        )

    return _sha.asNondeterministic()


def extract_geo(pages: DataFrame) -> DataFrame:
    """pages -> url, warc_ts, lang, text, text_sha, lat, lon.

    Rows with no place mention get NULL lat/lon (kept; downstream geo
    operators filter them).

    sha and lat/lon are SEPARATE vectorized UDFs so Catalyst prunes the one
    a consumer never reads: the geo pipeline's (url, lat, lon) projection
    used to hash every page anyway because both lived in one struct UDF —
    an opaque function defeats column pruning inside itself (guide §4.1).
    Consumers of both columns ship text across Arrow twice; every geo-only
    consumer (the common case: cell encode, tiles, terms) skips sha256 of
    the full corpus entirely.
    """
    return pages.select(
        "url", "warc_ts", "lang", "text",
        _make_sha()(F.col("text")).alias("text_sha"),
        _make_latlon()(F.col("text")).alias("_g"),
    ).select(
        "url",
        "warc_ts",
        "lang",
        "text",
        "text_sha",
        F.col("_g.lat").alias("lat"),
        F.col("_g.lon").alias("lon"),
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


# the entity-mention pattern: the place NAME only (no coordinates required),
# so the geocoder works on pages where coordinate extraction has nothing.
# RE2/Java/Python common subset, shared verbatim with the DuckDB oracle.
MENTION_RE = r"near (\w+) \("


def geocode_mentions(pages: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Gazetteer geocoding: (url, place, glat, glon) — extract a place-name
    mention per page (JVM ``regexp_extract``, no Python) and resolve it to
    coordinates with an equi-join against the gazetteer dimension.

    The SURVEY §2.2 "regexp_extract + gazetteer broadcast join" path: the
    entity→location bridge used when pages carry place NAMES, not literal
    coordinates (the coordinate regex of :func:`extract_geo` is the other
    branch).  The gazetteer is a dim table (50 rows in the fixture; planet
    gazetteers are ~10^7 rows ≈ hundreds of MB), joined estimate-gated: a
    broadcast hash join while it fits the 1M-struct guard, a shuffle
    equi-join past it — never a driver-side lookup.  Inner join semantics:
    unresolvable mentions drop (the curation read: only geocodable pages
    continue to the geo pipeline).
    """
    from countrymaam_spark.operators.adaptive import gate_broadcast

    mention = F.regexp_extract(F.col("text"), MENTION_RE, 1)
    m = pages.select("url", mention.alias("place")).filter(F.col("place") != "")
    n_places = gazetteer.count()
    return m.join(gate_broadcast(gazetteer, n_places), "place").select(
        "url", "place", "glat", "glon"
    )


def geocode_mentions_sql(pages_rel: str, gaz_rel: str) -> str:
    """DuckDB oracle: identical regex + join."""
    return f"""
        SELECT m.url, m.place, g.glat, g.glon
        FROM (
            SELECT url, regexp_extract(text, '{MENTION_RE}', 1) AS place
            FROM {pages_rel}
        ) m JOIN {gaz_rel} g USING (place)
        WHERE m.place <> ''
    """


def geocode_quality(pages_geo: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Per-place geocoder QA: (place, n_pages, mean_err_km) — haversine
    distance between the gazetteer centroid and each page's EXACT extracted
    coordinate, averaged per place.

    The signal that sizes gazetteer-geocoding error for the downstream cell
    index: city-cluster pages sit within the city's ~1-sigma spread, while
    background pages that name-drop a random city land continents away —
    so mean_err_km separates resolvable places from noisy ones.  One dim
    join (estimate-gated broadcast) + one partial-agg shuffle on place.

    Determinism: the mean uses the exact-decimal summation pattern of
    :func:`domain_spread` (order-independent sums, one unrounded IEEE
    division) so the result is bit-identical to the oracle regardless of
    partitioning.
    """
    from countrymaam_spark.functions import geo
    from countrymaam_spark.operators.adaptive import gate_broadcast

    mention = F.regexp_extract(F.col("text"), MENTION_RE, 1)
    m = (
        pages_geo.filter(F.col("lat").isNotNull())
        .select(mention.alias("place"), "lat", "lon")
        .filter(F.col("place") != "")
    )
    n_places = gazetteer.count()
    err = geo.haversine_km(F.col("lat"), F.col("lon"), F.col("glat"), F.col("glon"))
    err6 = F.round(err, 6).cast("decimal(20,6)")
    return (
        m.join(gate_broadcast(gazetteer, n_places), "place")
        .groupBy("place")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            (F.sum(err6).cast("double") / F.count(F.lit(1))).alias("mean_err_km"),
        )
    )


def geocode_quality_sql(pages_geo_rel: str, gaz_rel: str) -> str:
    """DuckDB oracle: same regex, join, and exact-decimal mean."""
    from countrymaam_spark.functions import geo

    hav = geo.haversine_km_sql("m.lat", "m.lon", "g.glat", "g.glon")
    return f"""
        SELECT m.place,
               COUNT(*) AS n_pages,
               CAST(SUM(CAST(ROUND({hav}, 6) AS DECIMAL(20,6))) AS DOUBLE)
                   / COUNT(*) AS mean_err_km
        FROM (
            SELECT regexp_extract(text, '{MENTION_RE}', 1) AS place, lat, lon
            FROM {pages_geo_rel} WHERE lat IS NOT NULL
        ) m JOIN {gaz_rel} g USING (place)
        WHERE m.place <> ''
        GROUP BY m.place
    """


def domain_spread(pages_geo: DataFrame, min_pages: int = 2) -> DataFrame:
    """Per-domain spatial dispersion: (domain, n_pages, clat, clon,
    spread_km) where (clat, clon) is the arithmetic lat/lon centroid of the
    domain's geotagged pages and spread_km the mean haversine distance from
    the centroid (radius of gyration, L1 flavor).

    The webtext-side "is this host a local business or a planet-wide
    aggregator" feature: a city newspaper spreads ~10 km, a scraped-listings
    mirror spreads ~10^3 km. Two passes over the corpus: one partial-agg
    shuffle on domain builds the |domains|-row centroid dim, which joins
    back estimate-gated (broadcast while it fits) for the second mean.
    The arithmetic centroid is the documented simplification: it is NOT
    dateline-safe (a domain straddling +/-180 centers near 0), matching the
    oracle formula exactly; spread ordering — the consumer signal — is
    unaffected for the dominant same-region case.

    Determinism: both means use exact decimal summation over coordinates
    quantized at 1e-6 deg (~0.1 m; the geotag extraction emits 5-dp values,
    so the quantization is lossless here). A plain double ``avg`` is
    summation-order-dependent, and 5-dp inputs make ``sum/n`` land EXACTLY
    on 6-dp rounding boundaries (2/1200 domains flipped vs the oracle at
    sf0.001) — order-independent sums plus an unrounded IEEE division make
    the output bit-identical regardless of partitioning.
    """
    from countrymaam_spark.functions import geo
    from countrymaam_spark.operators.adaptive import gate_broadcast

    dom = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1)
    pg = pages_geo.filter(F.col("lat").isNotNull()).select(
        dom.alias("domain"), "lat", "lon"
    )
    n = F.count(F.lit(1))
    cent = pg.groupBy("domain").agg(
        n.alias("n_pages"),
        (F.sum(F.col("lat").cast("decimal(20,6)")).cast("double") / n).alias("clat"),
        (F.sum(F.col("lon").cast("decimal(20,6)")).cast("double") / n).alias("clon"),
    ).filter(F.col("n_pages") >= int(min_pages))
    n_dom = cent.count()
    d = geo.haversine_km(F.col("lat"), F.col("lon"), F.col("clat"), F.col("clon"))
    d6 = F.round(d, 6).cast("decimal(20,6)")
    return (
        pg.join(gate_broadcast(cent, n_dom), "domain")
        .groupBy("domain")
        .agg(
            F.first("n_pages").alias("n_pages"),
            F.first("clat").alias("clat"),
            F.first("clon").alias("clon"),
            (F.sum(d6).cast("double") / F.count(F.lit(1))).alias("spread_km"),
        )
    )


def domain_spread_sql(pages_rel: str, min_pages: int = 2) -> str:
    """DuckDB oracle: identical two-pass formula, same exact-decimal sums."""
    from countrymaam_spark.functions import geo

    hav = geo.haversine_km_sql("p.lat", "p.lon", "c.clat", "c.clon")
    return f"""
        WITH g AS (
            SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
                   lat, lon
            FROM {pages_rel} WHERE lat IS NOT NULL
        ),
        c AS (
            SELECT domain, COUNT(*) AS n_pages,
                   CAST(SUM(CAST(lat AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS clat,
                   CAST(SUM(CAST(lon AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS clon
            FROM g GROUP BY domain
            HAVING COUNT(*) >= {min_pages}
        )
        SELECT p.domain,
               CAST(ANY_VALUE(c.n_pages) AS BIGINT) AS n_pages,
               ANY_VALUE(c.clat) AS clat,
               ANY_VALUE(c.clon) AS clon,
               CAST(SUM(CAST(ROUND({hav}, 6) AS DECIMAL(20,6))) AS DOUBLE)
                   / COUNT(*) AS spread_km
        FROM g p JOIN c USING (domain)
        GROUP BY p.domain
    """
