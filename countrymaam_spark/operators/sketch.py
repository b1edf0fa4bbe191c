"""KMV (k-minimum-values) distinct-count sketches — approximate
COUNT(DISTINCT key) per group at sketch cost, DETERMINISTIC by
construction (Bar-Yossef et al. 2002, public).

Why not `approx_count_distinct`: Spark's HLL++ and DuckDB's approx sketch
disagree (different algorithms, different seeds), so HLL results can never
be oracle-checked, and they change under engine upgrades. KMV over the
repo's engine-portable ``tok_hash`` is a pure function of the key SET:

- hash every key with ``tok_hash`` (uniform on [0, M31)),
- keep the k smallest DISTINCT hash values per group,
- if the group holds fewer than k distinct hashes the count is EXACT;
  otherwise estimate (k-1) * M31 div h_k (the k-th minimum hash) — the
  classic KMV estimator in exact integer arithmetic (fits BIGINT:
  (k-1) * M31 < 2^39 for k <= 256).

Identical rows in both engines, re-runs, and any partitioning — the same
argument as ``stratified_sample``. Relative error ~ 1/sqrt(k-2)
(~6% at k=256), pytest-pinned against exact counts.

MERGEABLE: the sketch of a union is the k smallest of the sketch union, so
per-partition/per-batch sketches combine without touching raw keys —
:func:`kmv_merge` implements it and the append test pins
merge(sketch(A), sketch(B)) == sketch(A ∪ B) row-for-row. At 10^12 pages
this is the shape that matters: each ingest batch ships O(groups · k)
sketch rows, never a distinct-key shuffle of the corpus.

Scale shape: one partial-agg distinct on (group, hash) — the map side
absorbs duplicate keys — then a per-group WindowGroupLimit keeps k rows
before the final exchange: O(groups · k) shuffled rows.

Reference tie-in: none (ANN library); the brief's "novel sketch" custom
operator class for corpus profiling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from countrymaam_spark.functions import text as T
from countrymaam_spark.functions.text import M31


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 256,
    salt: str = "kmv0",
) -> DataFrame:
    """-> (group_cols..., h): the k smallest distinct key hashes per group
    — the sketch rows themselves (feed to :func:`kmv_estimate` /
    :func:`kmv_merge`). NULL keys are dropped (COUNT DISTINCT semantics)."""
    if k < 3:
        raise ValueError("k must be >= 3 (estimator needs k-1 and h_k)")
    h = T.tok_hash(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .drop("rk")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Union of sketch tables -> one valid sketch per group (k smallest of
    the distinct union). Closed under itself: merge(merge(a,b),c) ==
    sketch(a ∪ b ∪ c)."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        sketches.select(*group_cols, "h")
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .drop("rk")
    )


def kmv_estimate(
    sketches: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """-> (group_cols..., n_distinct_est): exact when the group carries
    fewer than k sketch rows, else (k-1) * M31 div h_k — BIGINT math only,
    bit-identical across engines."""
    return sketches.groupBy(*group_cols).agg(
        F.when(
            F.count("*") < int(k),
            F.count("*").cast("long"),
        )
        .otherwise(
            F.expr(f"CAST({int(k) - 1} AS BIGINT) * {M31} div MAX(h)")
        )
        .alias("n_distinct_est")
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 256,
    salt: str = "kmv0",
) -> DataFrame:
    """sketch + estimate in one call: (group_cols..., n_distinct_est)."""
    return kmv_estimate(kmv_sketch(df, group_cols, key_col, k, salt), group_cols, k)


def kmv_distinct_sql(
    rel: str,
    group_cols: list[str],
    key_col: str,
    k: int = 256,
    salt: str = "kmv0",
) -> str:
    """Oracle: the identical hash, the identical k-smallest set, the
    identical integer estimator."""
    g = ", ".join(group_cols)
    h = T.tok_hash_sql(f"'{salt}' || CAST({key_col} AS VARCHAR)")
    return f"""
        WITH hashed AS (
            SELECT DISTINCT {g}, {h} AS h
            FROM {rel} WHERE {key_col} IS NOT NULL
        ),
        topk AS (
            SELECT * FROM (
                SELECT {g}, h,
                       ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS rk
                FROM hashed
            ) WHERE rk <= {int(k)}
        )
        SELECT {g},
               CASE WHEN COUNT(*) < {int(k)} THEN CAST(COUNT(*) AS BIGINT)
                    ELSE CAST({int(k) - 1} AS BIGINT) * {M31} // MAX(h)
               END AS n_distinct_est
        FROM topk
        GROUP BY {g}
    """
