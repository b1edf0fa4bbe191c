"""Length-distribution profiling: oracle equality, hand-computed type-1
quantiles, histogram compactness, empty input."""

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import profile as PR

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(row[c] for c in cols) for row in df.collect())


def test_quantiles_match_oracle(spark):
    got = _rows(PR.length_quantiles(spark.read.parquet(DOCS)))
    df = duckdb.sql(PR.length_quantiles_sql(f"read_parquet('{DOCS}')")).df()
    assert got == sorted(df[sorted(df.columns)].itertuples(index=False, name=None))


def test_type1_quantiles_by_hand(spark):
    """10 docs of lengths 1..10 in one stratum: rank ceil(p*10) picks
    p25 -> 3, p50 -> 5, p75 -> 8, p90 -> 9."""
    rows = [(i, "x", "t " * i) for i in range(1, 11)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    r = PR.length_quantiles(docs).collect()[0]
    assert (r["n_docs"], r["p25"], r["p50"], r["p75"], r["p90"]) == (10, 3, 5, 8, 9)


def test_histogram_is_compact(spark):
    """The histogram row count is strata x distinct lengths — far below the
    document count (the property that makes exact quantiles scale)."""
    docs = spark.read.parquet(DOCS)
    hist_rows = PR.length_histogram(docs).count()
    assert 0 < hist_rows < docs.count()


def test_empty_input_total(spark):
    empty = spark.createDataFrame([], "doc_id long, lang string, text string")
    assert PR.length_quantiles(empty).count() == 0
