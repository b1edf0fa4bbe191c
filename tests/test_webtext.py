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
