"""Embedding similarity search: brute force vs DuckDB oracle; LSH recall
properties (reference invariant: candidate budget >= corpus -> exact,
/root/reference/countrymaam_test.go:212)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import ann

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return (
        corpus.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .cache()
    )


def _key(rows):
    return sorted((r["query_id"], r["rk"], r["vec_id"]) for r in rows)


def test_brute_knn_matches_duckdb(spark, corpus, queries):
    got = _key(ann.brute_knn(corpus, queries, k=5).collect())
    sql = ann.brute_knn_sql(f"'{EMB}'", f"(SELECT * FROM '{EMB}' WHERE vec_id < 8)", k=5)
    want = sorted((q, rk, v) for q, rk, v, _ in duckdb.sql(sql).fetchall())
    assert got == want


def test_brute_knn_cosine_matches_duckdb(spark, corpus, queries):
    got = _key(ann.brute_knn(corpus, queries, k=5, metric="cosine").collect())
    sql = ann.brute_knn_sql(f"'{EMB}'", f"(SELECT * FROM '{EMB}' WHERE vec_id < 8)", k=5, metric="cosine")
    want = sorted((q, rk, v) for q, rk, v, _ in duckdb.sql(sql).fetchall())
    assert got == want


def test_lsh_full_budget_is_exact(spark, corpus, queries):
    """bits=1, several tables -> candidate set ~= corpus -> exact results."""
    brute = _key(ann.brute_knn(corpus, queries, k=5).collect())
    lsh = _key(ann.rp_lsh_knn(corpus, queries, k=5, n_tables=6, bits=1).collect())
    # recall@5
    b = {(q, v) for q, _, v in brute}
    l = {(q, v) for q, _, v in lsh}
    recall = len(b & l) / len(b)
    assert recall >= 0.99


def test_lsh_recall_reasonable(spark, corpus, queries):
    brute = {(q, v) for q, _, v in _key(ann.brute_knn(corpus, queries, k=5).collect())}
    lsh = {(q, v) for q, _, v in _key(ann.rp_lsh_knn(corpus, queries, k=5, n_tables=8, bits=4).collect())}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.3


def test_cosine_near_pairs_matches_duckdb(spark, corpus):
    got = {(r["id_a"], r["id_b"]) for r in ann.cosine_near_pairs(corpus, tau=0.5).collect()}
    want = {(a, b) for a, b, _ in duckdb.sql(ann.cosine_near_pairs_sql(f"'{EMB}'", tau=0.5)).fetchall()}
    assert got == want
