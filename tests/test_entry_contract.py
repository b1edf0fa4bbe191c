"""Driver-contract sanity: entry() runs, queries()/oracle_sql() are
consistent, and a fast representative subset matches DuckDB at sf0.01.
(The full parity sweep over every registered query is scripts/driver_sim.py
— run pre-commit.)"""

import datetime
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
FAST_SUBSET = ["cell_encode", "doc_token_count", "events_daily_agg", "lineitem_pricing_summary"]


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "rk", "url", "dist_km"}


def test_queries_oracle_keys_consistent():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    # only build-lineage (checksums of a distributed build — genuinely
    # non-SQL-expressible) may omit an oracle
    assert set(qs) - set(osql) == {"index_lineage"}
    assert len(qs) >= 20


def test_all_queries_resolve(spark):
    """Every driver query must at least RESOLVE its plan (df.schema forces
    analysis) — catches AnalysisExceptions (bad casts, missing columns) that
    the fast oracle subset would miss, without executing anything. Runs at
    sf0.001 because a few index queries materialize eagerly on construction."""
    qs = entrymod.queries()
    failures = {}
    for name, fn in qs.items():
        try:
            _ = fn(spark, "/root/testdata/sf0.001").schema
        except Exception as e:  # noqa: BLE001 - collect every failure
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(spark, name):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    df = qs[name](spark, SF)
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    got = sorted(tuple(_norm(r[i]) for i in order) for r in (tuple(x) for x in df.collect()))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    res = con.execute(osql[name])
    dcols = [d[0] for d in res.description]
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    want = sorted(tuple(_norm(r[i]) for i in dorder) for r in res.fetchall())
    assert sorted(cols) == sorted(dcols)
    assert got == want
