"""Corpus profiling: exact token-length distribution per stratum.

A curation pipeline reports the length distribution of its corpus (per
language / source) to pick truncation and filtering thresholds.  Exact
percentiles are usually "unscalable" because the naive form ranks every row
in a per-stratum window — a corpus-sized sort.  The scalable shape used
here never sorts the corpus:

1. ``length_histogram`` — one map-side-partial aggregation to the COMPACT
   (stratum, n_toks) histogram.  Distinct token counts are bounded (a few
   thousand values even at 10^12 docs), so the histogram is
   corpus-independent in size.
2. The cumulative sum and the quantile picks run as window/filter over that
   tiny table — O(|strata| x |distinct lengths|) rows, driver-safe plans.

Quantile definition: value at rank ``ceil(p * n)`` under ascending order
(the inverse-CDF / "type 1" quantile).  No interpolation, so the value is
always an observed length and the DuckDB oracle (same histogram SQL, not
``quantile_cont``, whose interpolation rule need not match Spark's
``percentile``) is bit-identical.

Reference tie-in: none (ANN library); SURVEY §2.2 aggregation/window family
applied to the training-data profiling task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from countrymaam_spark.functions import text as T

QUANTILES = (0.25, 0.5, 0.75, 0.9)


def length_histogram(
    docs: DataFrame, by: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(stratum, n_toks, cnt): compact per-stratum token-length histogram."""
    return (
        docs.select(F.col(by).alias("stratum"), T.token_count(F.col(text_col)).alias("n_toks"))
        .groupBy("stratum", "n_toks")
        .agg(F.count("*").alias("cnt"))
    )


def length_quantiles(
    docs: DataFrame, by: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(stratum, n_docs, p25, p50, p75, p90): exact type-1 quantiles of the
    per-document token count, computed over the compact histogram (the
    corpus is aggregated once and never sorted)."""
    hist = length_histogram(docs, by, text_col)
    w = Window.partitionBy("stratum").orderBy("n_toks")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = hist.groupBy("stratum").agg(F.sum("cnt").alias("n_docs"))
    j = cum.join(totals, "stratum")
    aggs = [F.max("n_docs").alias("n_docs")]
    for p in QUANTILES:
        tag = f"p{int(p * 100)}"
        rank = F.ceil(F.lit(p) * F.col("n_docs"))
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("n_toks"))).alias(tag)
        )
    return j.groupBy("stratum").agg(*aggs)


def length_quantiles_sql(rel: str, by: str = "lang", text_col: str = "text") -> str:
    picks = ",\n               ".join(
        f"MIN(CASE WHEN cum >= CEIL({p} * n_docs) THEN n_toks END) AS p{int(p * 100)}"
        for p in QUANTILES
    )
    return f"""
        WITH hist AS (
            SELECT {by} AS stratum, {T.token_count_sql(text_col)} AS n_toks,
                   COUNT(*) AS cnt
            FROM {rel} GROUP BY 1, 2
        ),
        cum AS (
            SELECT stratum, n_toks, cnt,
                   SUM(cnt) OVER (PARTITION BY stratum ORDER BY n_toks) AS cum,
                   SUM(cnt) OVER (PARTITION BY stratum) AS n_docs
            FROM hist
        )
        SELECT stratum, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
               {picks}
        FROM cum GROUP BY stratum
    """
