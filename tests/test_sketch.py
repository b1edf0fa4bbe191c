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


def test_kmv_jaccard_exact_under_k_and_bounded_above(spark):
    # A = 0..59, B = 40..99 -> |A∩B| = 20, |A∪B| = 100, J = 0.2
    a = spark.createDataFrame([("g", f"k{i}") for i in range(60)], "g string, key string")
    b = spark.createDataFrame([("g", f"k{i}") for i in range(40, 100)], "g string, key string")
    sa, sb = (SK.kmv_sketch(x, ["g"], "key", k=256) for x in (a, b))
    exact = SK.kmv_jaccard(sa, sb, ["g"], k=256).collect()[0]
    assert (exact["j_num"], exact["j_den"]) == (20, 100)  # union < k -> exact
    assert exact["jaccard_est"] == 0.2
    # estimated path: 2000-element sets with 50% overlap, k=128
    a2 = spark.createDataFrame([("g", f"x{i}") for i in range(2000)], "g string, key string")
    b2 = spark.createDataFrame([("g", f"x{i}") for i in range(1000, 3000)], "g string, key string")
    est = SK.kmv_jaccard(
        SK.kmv_sketch(a2, ["g"], "key", k=128),
        SK.kmv_sketch(b2, ["g"], "key", k=128),
        ["g"],
        k=128,
    ).collect()[0]
    assert est["j_den"] == 128
    truth = 1000 / 3000
    assert abs(est["jaccard_est"] - truth) < 0.15


def test_kmv_jaccard_matches_oracle(spark):
    rows_a = [("g0", f"k{i}") for i in range(300)] + [("g1", f"m{i}") for i in range(10)]
    rows_b = [("g0", f"k{i}") for i in range(150, 450)] + [("g1", f"m{i}") for i in range(5, 15)]
    a = spark.createDataFrame(rows_a, "g string, key string")
    b = spark.createDataFrame(rows_b, "g string, key string")
    got = sorted(
        map(
            tuple,
            SK.kmv_jaccard(
                SK.kmv_sketch(a, ["g"], "key", k=64),
                SK.kmv_sketch(b, ["g"], "key", k=64),
                ["g"],
                k=64,
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    want = sorted(
        map(tuple, con.execute(SK.kmv_jaccard_sql("ta", "tb", ["g"], "key", k=64)).fetchall())
    )
    assert got == want
