"""Document chunking: oracle equality (disjoint + overlap), no-token-lost
invariant, short-doc and empty-input behavior."""

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.functions import text as T
from countrymaam_spark.operators import chunk as CH

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(row[c] for c in cols) for row in df.collect())


def _oracle(sql):
    df = duckdb.sql(sql).df()
    return sorted(df[sorted(df.columns)].itertuples(index=False, name=None))


@pytest.mark.parametrize("size,stride", [(32, 32), (16, 8), (7, 5)])
def test_chunks_match_oracle(spark, size, stride):
    docs = spark.read.parquet(DOCS)
    got = _rows(CH.chunk_docs(docs, size, stride))
    assert got == _oracle(CH.chunk_docs_sql(f"read_parquet('{DOCS}')", size, stride))


def test_disjoint_chunks_lose_no_tokens(spark):
    """stride == size: concatenating a doc's chunks restores its token
    stream exactly."""
    docs = spark.read.parquet(DOCS)
    rebuilt = (
        CH.chunk_docs(docs, 32)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("joined")
        )
    )
    orig = docs.select(
        "doc_id", F.array_join(T.tokens(F.col("text")), " ").alias("want")
    )
    bad = orig.join(rebuilt, "doc_id").filter(F.col("want") != F.col("joined"))
    assert bad.count() == 0


def test_short_doc_single_tail_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = CH.chunk_docs(docs, size=32, stride=16).collect()
    assert len(rows) == 1
    assert (rows[0]["chunk_id"], rows[0]["n_chunk_toks"], rows[0]["chunk_text"]) == (0, 3, "a b c")


def test_empty_and_invalid(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert CH.chunk_docs(empty, 8).count() == 0
    blank = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert CH.chunk_docs(blank, 8).count() == 0
    with pytest.raises(ValueError):
        CH.chunk_docs(empty, 0)
