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


# --- Misra-Gries heavy hitters ---------------------------------------------


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish occurrence stream: "hot0" x 400, "hot1" x 150, "warm" x 40,
    # plus 1200 singleton keys; shuffled deterministically via a hash sort
    rows = [("hot0",)] * 400 + [("hot1",)] * 150 + [("warm",)] * 40
    rows += [(f"cold{i}",) for i in range(1200)]
    return (
        spark.createDataFrame(rows, "key string")
        .orderBy(F.md5(F.col("key")))
        .repartition(8)
    )


def _exact_hh(df, threshold):
    return sorted(
        map(
            tuple,
            df.groupBy("key")
            .agg(F.count("*").cast("long").alias("cnt"))
            .filter(F.col("cnt") >= threshold)
            .collect(),
        )
    )


def test_heavy_hitters_exact_and_partitioning_independent(spark, skewed):
    want = _exact_hh(skewed, 100)
    assert [k for k, _ in want] == ["hot0", "hot1"]
    for layout in (skewed, skewed.repartition(1), skewed.repartition(13, "key")):
        got = sorted(map(tuple, SK.heavy_hitters(layout, "key", 100).collect()))
        assert got == want


def test_heavy_hitters_threshold_boundary(spark, skewed):
    # threshold exactly at a key's count keeps it; one above drops it
    got40 = dict(SK.heavy_hitters(skewed, "key", 40).collect())
    assert got40 == {"hot0": 400, "hot1": 150, "warm": 40}
    got41 = dict(SK.heavy_hitters(skewed, "key", 41).collect())
    assert got41 == {"hot0": 400, "hot1": 150}


def test_mg_summary_bounded_and_superset(spark, skewed):
    n = skewed.count()
    threshold = 100
    cap = n // threshold + 1
    summ = SK.mg_summaries(skewed, "key", cap)
    per_part = (
        summ.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    assert all(r["rows"] <= cap for r in per_part)  # bounded state
    cand = {r["key"] for r in summ.collect()}
    hot = {k for k, _ in _exact_hh(skewed, threshold)}
    assert hot <= cand  # survival guarantee


def test_heavy_hitters_capacity_guard_and_nulls(spark):
    df = spark.createDataFrame([("a",), ("a",), (None,), ("b",)], "key string")
    with pytest.raises(ValueError):
        SK.heavy_hitters(df, "key", 2, capacity=1)
    assert dict(SK.heavy_hitters(df, "key", 2).collect()) == {"a": 2}
    empty = spark.createDataFrame([], "key string")
    assert SK.heavy_hitters(empty, "key", 2).count() == 0


def test_heavy_hitters_matches_oracle(spark, skewed):
    got = sorted(map(tuple, SK.heavy_hitters(skewed, "key", 40).collect()))
    con = duckdb.connect()
    con.register("t", skewed.toPandas())
    want = sorted(
        map(tuple, con.execute(SK.heavy_hitters_sql("t", "key", 40)).fetchall())
    )
    assert got == want
