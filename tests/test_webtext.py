"""Host-level crawl-curation operators: oracle equality + plan shape."""

import os

import duckdb
from pyspark.sql import functions as F

from countrymaam_spark.operators import webtext as WT
from countrymaam_spark.sources import pages as pg


def _pages_path() -> str:
    return os.path.join(pg.ensure_fixtures("sf0.001"), "pages.parquet")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_host_latest_matches_oracle(spark):
    p = _pages_path()
    got = WT.host_latest(spark.read.parquet(p), k=3)
    cols = ["host", "url", "ts_s", "lang", "rn"]
    oracle = sorted(duckdb.sql(WT.host_latest_sql(f"'{p}'", k=3)).fetchall())
    assert _rows(got, cols) == oracle
    # every host contributes <= k rows, newest first
    per_host = got.groupBy("host").count().agg(F.max("count")).first()[0]
    assert per_host <= 3


def test_host_latest_plan_is_window_group_limit(spark):
    """The rank filter must push into WindowGroupLimit so map tasks retain
    only k rows per host BEFORE the shuffle — the property that keeps the
    exchange O(|hosts| * k) at 10^12 pages."""
    p = _pages_path()
    plan = WT.host_latest(spark.read.parquet(p), k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial (map-side) + Final


def test_host_stats_matches_oracle(spark):
    p = _pages_path()
    got = WT.host_stats(spark.read.parquet(p))
    cols = ["host", "n_pages", "n_langs", "text_chars", "first_ts_s", "last_ts_s"]
    oracle = sorted(duckdb.sql(WT.host_stats_sql(f"'{p}'")).fetchall())
    assert _rows(got, cols) == oracle
    # sanity: counts conserve the corpus
    total = got.agg(F.sum("n_pages")).first()[0]
    assert total == pg.SF_ROWS["sf0.001"]


def test_host_asof_join_matches_oracle(spark):
    p = _pages_path()
    pages = spark.read.parquet(p)
    hosts = pages.select(
        F.regexp_extract("url", WT.HOST_RE, 1).alias("host")
    ).distinct()
    t1, t2 = 1729036800 + 300, 1729036800 + 1200
    asof = hosts.select(
        "host",
        F.explode(F.array(F.lit(t1).cast("long"), F.lit(t2).cast("long"))).alias(
            "asof_s"
        ),
    )
    got = WT.host_asof_join(pages, asof, k=2)
    cols = ["host", "asof_s", "rn", "url", "ts_s"]
    asof_rel = f"""
        SELECT host, asof_s
        FROM (SELECT DISTINCT regexp_extract(url, '{WT.HOST_RE}', 1) AS host
              FROM '{p}') h
        CROSS JOIN (VALUES (CAST({t1} AS BIGINT)), (CAST({t2} AS BIGINT))) t(asof_s)
    """
    oracle = sorted(duckdb.sql(WT.host_asof_join_sql(f"'{p}'", asof_rel, k=2)).fetchall())
    rows = _rows(got, cols)
    assert rows == oracle
    # as-of semantics: every returned snapshot is at or before its instant
    assert all(r[4] <= r[1] for r in rows)
    assert rows  # fixture starts at the epoch base, so t1 must match rows


def test_host_asof_plan_is_window_group_limit(spark):
    p = _pages_path()
    pages = spark.read.parquet(p)
    asof = pages.select(
        F.regexp_extract("url", WT.HOST_RE, 1).alias("host")
    ).distinct().select("host", F.lit(1729036900).cast("long").alias("asof_s"))
    plan = (
        WT.host_asof_join(pages, asof, k=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_canonical_url_variants_collapse(spark):
    base = "https://site0001.example/a/b"
    variants = [
        base + "#frag",
        base + "?utm_source=x",
        base + "?utm_source=x&utm_campaign=y",
        base + "?utm_source=x&utm_medium=m&utm_campaign=y",
        "https://SITE0001.EXAMPLE/a/b",
        "https://site0001.example:443/a/b",
        base + "/",
    ]
    df = spark.createDataFrame([(u,) for u in [base] + variants], "url string")
    got = [r[0] for r in df.select(WT.canonical_url(F.col("url"))).collect()]
    assert got == [base] * len(got)
    # the DuckDB mirror canonicalizes identically
    want = [
        duckdb.sql(f"SELECT {WT.canonical_url_sql(repr(u))}").fetchone()[0]
        for u in [base] + variants
    ]
    assert want == [base] * len(want)


def test_canonical_url_preserves_meaningful_parts(spark):
    keep = [
        "https://site.example/a?page=2",          # real query param
        "https://site.example:8080/a",            # non-default port
        "https://site.example/a/b",               # no trailing slash
        "http://site.example/a",                  # scheme kept
    ]
    df = spark.createDataFrame([(u,) for u in keep], "url string")
    got = [r[0] for r in df.select(WT.canonical_url(F.col("url"))).collect()]
    assert got == keep


def test_canonical_dup_groups_matches_oracle(spark):
    rows = [
        ("https://a.example/x",),
        ("https://a.example/x#f",),
        ("https://a.example/x?utm_source=s",),
        ("https://b.example/y",),
        ("https://b.example/z",),  # no variants -> not a dup group
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {tuple(r) for r in WT.canonical_dup_groups(df).collect()}
    assert got == {("https://a.example/x", 3, "https://a.example/x")}
    vals = ", ".join(f"({u!r})" for (u,) in rows)
    rel = f"(SELECT * FROM (VALUES {vals}) v(url)) AS urls"
    want = set(duckdb.sql(WT.canonical_dup_groups_sql(rel)).fetchall())
    assert got == want


# --- deterministic stratified sampling (training-data mixing) ---

DOCS01 = "/root/testdata/sf0.01/documents.parquet"


def test_stratified_sample_partition_independent(spark):
    docs = spark.read.parquet(DOCS01).withColumn("k", F.col("doc_id").cast("string"))
    fr = {"en": 0.3, "zh": 1.0, "de": 0.5}
    a = {r["doc_id"] for r in WT.stratified_sample(docs, fr, key_col="k").collect()}
    b = {
        r["doc_id"]
        for r in WT.stratified_sample(docs.repartition(17), fr, key_col="k").collect()
    }
    assert a == b and len(a) > 0


def test_stratified_sample_nested_and_mix(spark):
    docs = spark.read.parquet(DOCS01).withColumn("k", F.col("doc_id").cast("string"))
    small = {r["doc_id"] for r in WT.stratified_sample(docs, {"en": 0.3}, key_col="k").collect()}
    big = {r["doc_id"] for r in WT.stratified_sample(docs, {"en": 0.6}, key_col="k").collect()}
    assert small < big  # nested: bucket < 3000 is a strict subset of < 6000
    full = WT.stratified_sample(docs, {"zh": 1.0}, key_col="k")
    n_zh = docs.filter(F.col("lang") == "zh").count()
    assert full.count() == n_zh  # frac=1.0 keeps the whole stratum
    assert full.filter(F.col("lang") != "zh").count() == 0  # absent strata drop
    # realized fraction concentrates near frac (218 en docs, ±0.1 generous)
    n_en = docs.filter(F.col("lang") == "en").count()
    got = len(big) / n_en
    assert abs(got - 0.6) < 0.1


def test_stratified_sample_independent_salts(spark):
    """Different salts give (near-)independent draws: the overlap of two 50%
    samples is ~25%, not 50% (same-salt nesting would force full overlap)."""
    docs = spark.read.parquet(DOCS01).withColumn("k", F.col("doc_id").cast("string"))
    a = {r["doc_id"] for r in WT.stratified_sample(docs, {"en": 0.5}, key_col="k", salt="a").collect()}
    b = {r["doc_id"] for r in WT.stratified_sample(docs, {"en": 0.5}, key_col="k", salt="b").collect()}
    n_en = docs.filter(F.col("lang") == "en").count()
    jointly = len(a & b) / n_en
    assert 0.1 < jointly < 0.4  # ~0.25 expected; 0.5 would mean dependence


def test_stratified_sample_matches_oracle(spark):
    docs = spark.read.parquet(DOCS01).withColumn("k", F.col("doc_id").cast("string"))
    fr = {"en": 0.3, "zh": 1.0, "de": 0.5}
    got = {
        (r["doc_id"], r["bucket"])
        for r in WT.stratified_sample(docs, fr, key_col="k").select("doc_id", "bucket").collect()
    }
    sql = WT.stratified_sample_sql(
        f"(SELECT *, CAST(doc_id AS VARCHAR) AS k FROM '{DOCS01}')", fr, key_col="k"
    )
    want = {(r[0], r[-1]) for r in duckdb.sql(f"SELECT doc_id, bucket FROM ({sql})").fetchall()}
    assert got == want


def test_stratified_sample_total_on_empty_and_rejects_bad_fracs(spark):
    empty = spark.createDataFrame([], "doc_id long, lang string, k string")
    assert WT.stratified_sample(empty, {"en": 0.5}, key_col="k").count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match=r"\[0, 1\]"):
        WT.stratified_sample(empty, {"en": 1.5}, key_col="k")


def test_stratified_fixed_k(spark):
    """Exact-k-per-stratum hash sample: exact sizes, partitioning
    independence, append stability (old members keep membership unless
    displaced at the hash boundary), and oracle parity."""
    docs = spark.read.parquet(DOCS01).withColumn("k", F.col("doc_id").cast("string"))
    got = WT.stratified_fixed_k(docs, 20, key_col="k")
    sizes = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == 20 for n in sizes.values()) and len(sizes) == 5
    a = {r["doc_id"] for r in got.collect()}
    b = {r["doc_id"] for r in WT.stratified_fixed_k(docs.repartition(13), 20, key_col="k").collect()}
    assert a == b
    # nested: k=10 selects a subset of k=20 (same hash order)
    small = {r["doc_id"] for r in WT.stratified_fixed_k(docs, 10, key_col="k").collect()}
    assert small < a
    # oracle parity
    sql = WT.stratified_fixed_k_sql(
        f"(SELECT *, CAST(doc_id AS VARCHAR) AS k FROM '{DOCS01}')", 20, key_col="k"
    )
    want = set(duckdb.sql(f"SELECT doc_id, rk FROM ({sql})").fetchall())
    got_pairs = {(r["doc_id"], r["rk"]) for r in got.select("doc_id", "rk").collect()}
    assert got_pairs == want
    # WindowGroupLimit engages (the O(strata*k) shuffle claim)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_geo_tile_fixed_k_caps_hot_cells(spark):
    """Per-cell fixed-k over the geo table: the Zipf-hot city cells are
    capped at exactly k while sparse cells keep all their pages."""
    from countrymaam_spark.functions import geo as G
    from countrymaam_spark.operators.geotag import extract_geo

    g = (
        extract_geo(spark.read.parquet(_pages_path()))
        .filter(F.col("lat").isNotNull())
        .select("url", G.encode_cell(F.col("lat"), F.col("lon"), 6).alias("cell"))
    )
    per_cell = g.groupBy("cell").count()
    assert per_cell.filter(F.col("count") > 5).count() > 0  # the cap binds
    s = WT.stratified_fixed_k(g, 5, strata_col="cell", key_col="url")
    got = s.groupBy("cell").count()
    assert got.filter(F.col("count") > 5).count() == 0
    # sparse cells keep everything
    joined = per_cell.filter(F.col("count") <= 5).join(
        got.withColumnRenamed("count", "kept"), "cell"
    )
    assert joined.filter(F.col("count") != F.col("kept")).count() == 0
    # determinism: same members on a different partitioning
    a = sorted(r["url"] for r in s.collect())
    b = sorted(r["url"] for r in WT.stratified_fixed_k(g.repartition(13), 5, strata_col="cell", key_col="url").collect())
    assert a == b


def test_leakage_split_host_atomic_and_weighted(spark):
    pages = spark.read.parquet(_pages_path())
    got = WT.leakage_split(pages).collect()
    assert len(got) == pages.count()
    # host atomicity: one split per host (the leakage guard itself)
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_host.values())
    # weights roughly honored at host granularity; determinism across runs
    from collections import Counter

    c = Counter(next(iter(s)) for s in by_host.values())
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
    again = WT.leakage_split(pages).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_leakage_split_matches_oracle(spark):
    p = _pages_path()
    got = sorted(
        tuple(r) for r in WT.leakage_split(spark.read.parquet(p)).collect()
    )
    want = sorted(tuple(r) for r in duckdb.sql(WT.leakage_split_sql(f"'{p}'")).fetchall())
    assert got == want


def test_leakage_split_rejects_bad_weights(spark):
    import pytest

    pages = spark.createDataFrame([("http://a.com/x",)], "url string")
    with pytest.raises(ValueError):
        WT.leakage_split(pages, weights={"train": 0.5, "val": 0.2})
    with pytest.raises(ValueError):
        WT.leakage_split(pages, weights={"train": 1.2, "val": -0.2})


def test_leakage_split_total_on_empty_input(spark):
    empty = spark.createDataFrame([], "url string, warc_ts timestamp, html binary, text string, lang string")
    assert WT.leakage_split(empty).count() == 0
