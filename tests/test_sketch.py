"""KMV distinct-count sketch: accuracy bound, exactness under k, merge
closure, oracle parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def keyed(spark):
    # group g0: 2000 distinct keys (estimated); g1: 50 distinct (exact path);
    # duplicates added everywhere to exercise the distinct stage
    rows = [("g0", f"k{i}") for i in range(2000)] * 2
    rows += [("g1", f"k{i}") for i in range(50)] * 3
    return spark.createDataFrame(rows, "g string, key string")


def test_kmv_accuracy_and_exactness(spark, keyed):
    got = dict(SK.kmv_distinct(keyed, ["g"], "key", k=256).collect())
    assert got["g1"] == 50  # below k -> exact
    assert abs(got["g0"] - 2000) / 2000 < 0.10  # ~6% expected at k=256


def test_kmv_merge_equals_union_sketch(spark, keyed):
    a = keyed.filter(F.col("key").substr(2, 10).cast("long") % 2 == 0)
    b = keyed.filter(F.col("key").substr(2, 10).cast("long") % 2 == 1)
    sa = SK.kmv_sketch(a, ["g"], "key", k=64)
    sb = SK.kmv_sketch(b, ["g"], "key", k=64)
    merged = sorted(map(tuple, SK.kmv_merge(sa.union(sb), ["g"], k=64).collect()))
    direct = sorted(map(tuple, SK.kmv_sketch(keyed, ["g"], "key", k=64).collect()))
    assert merged == direct  # closed under union, row-for-row


def test_kmv_matches_oracle(spark, keyed):
    got = sorted(map(tuple, SK.kmv_distinct(keyed, ["g"], "key", k=128).collect()))
    con = duckdb.connect()
    con.register("t", keyed.toPandas())
    want = sorted(
        map(tuple, con.execute(SK.kmv_distinct_sql("t", ["g"], "key", k=128)).fetchall())
    )
    assert got == want


def test_kmv_total_on_empty_and_nulls(spark):
    empty = spark.createDataFrame([], "g string, key string")
    assert SK.kmv_distinct(empty, ["g"], "key").count() == 0
    withnull = spark.createDataFrame([("g0", None), ("g0", "a")], "g string, key string")
    assert dict(SK.kmv_distinct(withnull, ["g"], "key").collect()) == {"g0": 1}
