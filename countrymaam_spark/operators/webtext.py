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

from pyspark.sql import Column, DataFrame, Window
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


def host_asof_join(pages: DataFrame, asof: DataFrame, k: int = 1) -> DataFrame:
    """Keyed AS-OF join: for each (host, asof_s) query row, the newest-k
    snapshots from that host fetched AT OR BEFORE asof_s.
    -> (host, asof_s, rn, url, ts_s).

    The as-of join Spark lacks as a primitive, in its keyed (point-lookup)
    form — "what did this host look like at time T" over a Common-Crawl
    snapshot history.  Shape at scale: a hash equi-join on host (the query
    side is the small one and rides the adaptive gate at the call sites
    that own a size estimate; un-hinted here so AQE sizes it), the
    non-equi ts predicate applied post-join, then a rank filter that
    compiles to WindowGroupLimit — ~k rows per (host, asof_s) survive each
    map task before the exchange, so the shuffle carries O(|queries| * k),
    not one row per candidate snapshot.  Tie-break (ts_s DESC, url DESC)
    matches host_latest.

    ``asof`` columns: (host string, asof_s long — epoch seconds).
    """
    host = F.regexp_extract(F.col("url"), HOST_RE, 1)
    snaps = pages.select(
        host.alias("host"),
        "url",
        F.unix_timestamp(F.col("warc_ts")).cast("long").alias("ts_s"),
    )
    w = Window.partitionBy("host", "asof_s").orderBy(
        F.col("ts_s").desc(), F.col("url").desc()
    )
    return (
        snaps.join(asof.select("host", "asof_s"), "host")
        .filter(F.col("ts_s") <= F.col("asof_s"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= int(k))
        .select("host", "asof_s", "rn", "url", "ts_s")
    )


def host_asof_join_sql(pages_rel: str, asof_rel: str, k: int = 1) -> str:
    """DuckDB oracle: identical join + window + rank filter."""
    return f"""
        SELECT host, asof_s, rn, url, ts_s FROM (
            SELECT s.host, a.asof_s, s.url, s.ts_s,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY s.host, a.asof_s
                       ORDER BY s.ts_s DESC, s.url DESC
                   ) AS BIGINT) AS rn
            FROM (
                SELECT regexp_extract(url, '{HOST_RE}', 1) AS host, url,
                       CAST(floor(epoch(warc_ts)) AS BIGINT) AS ts_s
                FROM {pages_rel}
            ) s
            JOIN ({asof_rel}) a ON s.host = a.host
            WHERE s.ts_s <= a.asof_s
        ) r WHERE rn <= {int(k)}
    """


# --- URL canonicalization -------------------------------------------------
# The dedup a crawler runs BEFORE fetching: a URL's syntactic variants
# (fragment, utm_* tracking params, default port, trailing slash, host
# case) all name the same resource.  Pure column regex chains — JVM-side,
# no Python — mirrored step-for-step in the oracle.

def canonical_url(url: Column) -> Column:
    """Normalize: strip #fragment, utm_* params, default :80/:443 port,
    trailing slash (path only), lowercase scheme+host."""
    u = F.regexp_replace(url, r"#.*$", "")                    # fragment
    # mid-position utm_ params; applied twice so CONSECUTIVE utm params
    # (scan resumes after each match in both engines) still collapse
    u = F.regexp_replace(u, r"([?&])utm_[^&]*&", "$1")
    u = F.regexp_replace(u, r"([?&])utm_[^&]*&", "$1")
    u = F.regexp_replace(u, r"[?&]utm_[^&]*$", "")            # utm_ last
    u = F.regexp_replace(u, r"\?$", "")                       # bare ?
    u = F.regexp_replace(u, r"^(https?://[^/]*):(?:80|443)(/|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https?://[^/?#]+/[^?#]*?)/$", "$1")
    # lowercase the scheme+host part only
    head = F.lower(F.regexp_extract(u, r"^(https?://[^/]*)", 1))
    tail = F.regexp_replace(u, r"^https?://[^/]*", "")
    return F.concat(head, tail)


def canonical_url_sql(url: str) -> str:
    """DuckDB mirror (RE2 replacement refs are \\1; 'g' only where Spark
    regexp_replace is global — DuckDB replaces FIRST match by default)."""
    u = f"regexp_replace({url}, '#.*$', '')"
    u = f"regexp_replace({u}, '([?&])utm_[^&]*&', '\\1', 'g')"
    u = f"regexp_replace({u}, '([?&])utm_[^&]*&', '\\1', 'g')"
    u = f"regexp_replace({u}, '[?&]utm_[^&]*$', '')"
    u = f"regexp_replace({u}, '\\?$', '')"
    u = f"regexp_replace({u}, '^(https?://[^/]*):(?:80|443)(/|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '^(https?://[^/?#]+/[^?#]*?)/$', '\\1')"
    head = f"lower(regexp_extract({u}, '^(https?://[^/]*)', 1))"
    tail = f"regexp_replace({u}, '^https?://[^/]*', '')"
    return f"({head} || {tail})"


def canonical_dup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Group syntactic URL variants: (canon, n_variants, url) for every
    canonical form with >= 2 distinct raw variants; the kept row per group
    is the lexicographically-smallest raw url (deterministic pick).

    One hash shuffle on the canonical string; map-side combine collapses
    per-task variant lists first.  At 10^12 pages this is the same shape
    as exact dedup (sha-groupBy) with the canonicalizer as the key fn.
    """
    canon = canonical_url(F.col(url_col))
    return (
        pages.select(canon.alias("canon"), F.col(url_col).alias("raw"))
        .groupBy("canon")
        .agg(
            F.countDistinct("raw").alias("n_variants"),
            F.min("raw").alias("url"),
        )
        .filter(F.col("n_variants") >= 2)
        .select("canon", F.col("n_variants").cast("long").alias("n_variants"), "url")
    )


def canonical_dup_groups_sql(pages_rel: str, url_col: str = "url") -> str:
    canon = canonical_url_sql(url_col)
    return f"""
        SELECT canon, CAST(n_variants AS BIGINT) AS n_variants, url FROM (
            SELECT {canon} AS canon,
                   COUNT(DISTINCT {url_col}) AS n_variants,
                   MIN({url_col}) AS url
            FROM {pages_rel}
            GROUP BY 1
        ) g WHERE n_variants >= 2
    """


def stratified_sample(
    df: DataFrame,
    fracs: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "url",
    salt: str = "s0",
    denom: int = 10_000,
) -> DataFrame:
    """Deterministic hash-based stratified sampling — the training-data
    MIXING primitive (sample 30% of English, 100% of the low-resource
    stratum, drop the rest). Keeps a row iff
    ``md5(salt || key) mod denom < round(frac * denom)`` for its stratum.

    Engine-portable and seedable BY CONSTRUCTION, unlike rate-based samplers
    (``df.sampleBy`` draws from a partition-local RNG stream, so its output
    changes with partitioning and is not oracle-checkable): the keep
    decision is a pure function of (salt, key), so re-runs, repartitions,
    resumed pipelines, and the DuckDB oracle all select the SAME rows, and
    disjoint salts give independent samples (hold-out splits). Per-stratum
    realized fractions concentrate around frac with the usual
    hash-uniformity guarantees (md5 on url keys). Strata absent from
    ``fracs`` are dropped (explicit mix only). Output adds the integer
    ``bucket`` so downstream sub-sampling can refine WITHOUT re-hashing
    (bucket < 3000 is a strict subset of bucket < 5000 — nested samples).

    Scale shape: a pure filter projection — no shuffle, no RNG, predicate
    evaluates JVM-side; Catalyst pushes the stratum IN-list to the scan.
    Rows whose key is NULL hash to a NULL bucket and are DROPPED (identical
    NULL propagation in the oracle) — filter or coalesce keys upstream if a
    frac=1.0 stratum must keep NULL-keyed rows.
    """
    from countrymaam_spark.functions import text as T

    bad = {s: fr for s, fr in fracs.items() if not 0.0 <= fr <= 1.0}
    if bad:
        raise ValueError(f"sampling fractions must be in [0, 1], got {bad}")
    # the repo's one engine-portable hash (functions/text.tok_hash), salted
    bucket = T.tok_hash(F.concat(F.lit(salt), F.col(key_col))) % F.lit(denom)
    thresholds = F.create_map(
        *[x for s, fr in sorted(fracs.items()) for x in (F.lit(s), F.lit(int(round(fr * denom))))]
    )
    return (
        df.withColumn("bucket", bucket)
        .withColumn("_thr", thresholds[F.col(strata_col)])
        .filter(F.col("_thr").isNotNull() & (F.col("bucket") < F.col("_thr")))
        .drop("_thr")
    )


def stratified_sample_sql(
    rel: str,
    fracs: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "url",
    salt: str = "s0",
    denom: int = 10_000,
) -> str:
    from countrymaam_spark.functions import text as T

    salted_key = f"'{salt}' || {key_col}"
    bucket = f"({T.tok_hash_sql(salted_key)} % {denom})"
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(fr * denom))}" for s, fr in sorted(fracs.items())
    )
    return f"""
        SELECT *, {bucket} AS bucket FROM {rel}
        WHERE {bucket} < (CASE {strata_col} {cases} ELSE -1 END)
    """


def stratified_fixed_k(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "url",
    salt: str = "s0",
) -> DataFrame:
    """Deterministic fixed-SIZE uniform sample per stratum: the k rows with
    the smallest salted key hash in each stratum (all rows when a stratum
    has fewer than k). The fraction-based sibling (``stratified_sample``)
    cannot pin an exact count; this is the eval-set / holdout primitive —
    "exactly 1000 docs per language, stable across runs and engines".

    Hash ranking makes it order-free and partitioning-independent (the md5
    tiebreak is total because tok_hash collisions are broken by the key
    itself), and a GROWING corpus only swaps members in/out at the hash
    boundary — no reshuffling of the whole sample on append. The rank
    filter compiles to WindowGroupLimit in Spark 4: each map task keeps
    only k rows per stratum BEFORE the exchange, so the shuffle carries
    O(|strata| * k) rows, not the corpus. NULL keys drop (NULL hash),
    as in ``stratified_sample``.
    """
    from countrymaam_spark.functions import text as T

    h = T.tok_hash(F.concat(F.lit(salt), F.col(key_col)))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
    )


def stratified_fixed_k_sql(
    rel: str,
    k: int,
    strata_col: str = "lang",
    key_col: str = "url",
    salt: str = "s0",
) -> str:
    from countrymaam_spark.functions import text as T

    salted_key = f"'{salt}' || {key_col}"
    h = T.tok_hash_sql(salted_key)
    return f"""
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY {strata_col} ORDER BY {h} ASC, {key_col} ASC
            ) AS rk
            FROM {rel} WHERE {key_col} IS NOT NULL
        ) t WHERE rk <= {k}
    """


def _split_cuts(weights: dict[str, float], denom: int) -> list[tuple[str, int]]:
    """Cumulative bucket thresholds in sorted-name order (canonical across
    engines); the last cut is forced to denom so rounding never drops
    buckets."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"split weights must be non-negative, got {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1.0 / denom:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = sorted(weights)
    acc, cuts = 0, []
    for i, name in enumerate(names):
        acc = denom if i == len(names) - 1 else acc + int(round(weights[name] * denom))
        cuts.append((name, acc))
    return cuts


DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def leakage_split(
    pages: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "sp0",
    denom: int = 10_000,
) -> DataFrame:
    """Leakage-aware train/val/test assignment: (url, host, bucket, split),
    where EVERY page of a host lands in the same split.

    Web near-duplicates cluster by host (templated page families, mirrors,
    session-id URL variants), so splitting by page hash leaks near-copies of
    training documents into the eval split — the contamination the C4/Pile
    lineage guards against by partitioning on the site, not the page. The
    split key is the engine-portable ``tok_hash(salt || host)`` bucket
    (same construction as :func:`stratified_sample`: deterministic,
    partitioning-independent, resumable, oracle-checkable; disjoint salts
    give independent re-splits). Hosts the url regex cannot parse hash as
    the empty string — one deterministic pseudo-host, same rows in both
    engines.

    Scale shape: a pure narrow projection — regexp host extract + one md5
    per row, no shuffle, no RNG; Catalyst folds the threshold CASE into the
    scan projection.
    """
    from countrymaam_spark.functions import text as T

    cuts = _split_cuts(DEFAULT_SPLITS if weights is None else weights, denom)
    host = F.regexp_extract(F.col("url"), HOST_RE, 1)
    bucket = T.tok_hash(F.concat(F.lit(salt), host)) % F.lit(denom)
    expr = None
    for name, cut in cuts:
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return pages.select(
        "url",
        host.alias("host"),
        bucket.alias("bucket"),
        expr.alias("split"),
    )


def leakage_split_sql(
    pages_rel: str,
    weights: dict[str, float] | None = None,
    salt: str = "sp0",
    denom: int = 10_000,
) -> str:
    """Oracle: identical host regex, hash, thresholds, and CASE order."""
    from countrymaam_spark.functions import text as T

    cuts = _split_cuts(DEFAULT_SPLITS if weights is None else weights, denom)
    host = f"regexp_extract(url, '{HOST_RE}', 1)"
    salted = f"'{salt}' || {host}"
    bucket = f"({T.tok_hash_sql(salted)} % {denom})"
    cases = " ".join(f"WHEN {bucket} < {cut} THEN '{name}'" for name, cut in cuts)
    return f"""
        SELECT url, {host} AS host, {bucket} AS bucket,
               CASE {cases} END AS split
        FROM {pages_rel}
    """
