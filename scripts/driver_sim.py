"""Simulate the driver's correctness gate: for each __spark_entry__ query,
run the Spark DataFrame and the DuckDB oracle at the given sf and compare
row multisets (columns sorted by name, exact value equality).

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from countrymaam_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        if name not in osql:
            print(f"  {name:28s} rows={len(spark_rows):7d} spark={t_spark:6.1f}s  (rows-only, no oracle)")
            if len(spark_rows) == 0 and name not in ("dedup_exact",):
                print(f"    WARNING: zero rows")
            continue
        t0 = time.time()
        res = con.execute(osql[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        t_duck = time.time() - t0
        ok_schema = sorted(spark_cols) == sorted(duck_cols)
        a, b = rowset(spark_cols, spark_rows), rowset(duck_cols, duck_rows)
        ok = ok_schema and a == b
        print(
            f"  {name:28s} rows={len(spark_rows):7d}/{len(duck_rows):7d} "
            f"spark={t_spark:6.1f}s duck={t_duck:5.1f}s  {'OK' if ok else 'MISMATCH'}"
        )
        if not ok:
            failures.append(name)
            if not ok_schema:
                print(f"    cols spark={spark_cols} duck={duck_cols}")
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print(f"    spark-only: {r}")
            for r in list(sb - sa)[:3]:
                print(f"    duck-only : {r}")
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
