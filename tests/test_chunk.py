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


def test_chunk_sentences_semantics(spark):
    """Greedy packing: sentences never split; a chunk closes only when the
    next sentence would overflow; an oversized sentence gets its own chunk;
    punctuation-only and empty docs yield nothing."""
    from countrymaam_spark.operators.chunk import chunk_sentences

    rows = [
        (1, "Short one. Another tiny sentence! A third? And a fourth here."),
        (2, "one two three four five six seven eight nine ten eleven twelve. small."),
        (3, "..."),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_sentences"], r["n_chunk_toks"], r["chunk_text"])
        for r in chunk_sentences(docs, max_tokens=8).collect()
    }
    assert got == {
        (1, 0): (3, 7, "Short one. Another tiny sentence! A third?"),
        (1, 1): (1, 4, "And a fourth here."),
        (2, 0): (1, 12, "one two three four five six seven eight nine ten eleven twelve."),
        (2, 1): (1, 1, "small."),
    }


def test_chunk_sentences_matches_oracle_and_preserves_tokens(spark):
    """Oracle parity on the fixture + conservation: chunk token counts sum
    to the doc token count (no token dropped or duplicated)."""
    import duckdb
    from countrymaam_spark.functions import text as T
    from countrymaam_spark.operators.chunk import chunk_sentences, chunk_sentences_sql

    docs = spark.read.parquet(DOCS)
    got = sorted(tuple(r) for r in chunk_sentences(docs, max_tokens=48).collect())
    want = sorted(
        tuple(r)
        for r in duckdb.sql(chunk_sentences_sql(f"'{DOCS}'", max_tokens=48)).fetchall()
    )
    assert got == want
    per_doc = {}
    for did, _cid, _ns, n, _txt in got:
        per_doc[did] = per_doc.get(did, 0) + n
    toks = dict(
        docs.select("doc_id", T.token_count(F.col("text")).alias("n")).collect()
    )
    assert all(toks[d] == n for d, n in per_doc.items())
