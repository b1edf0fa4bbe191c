"""Document chunking — fixed-size token windows with stride (the passage
splitting every training-data / RAG pipeline runs before packing or
embedding).

Each document is split into windows of ``size`` tokens advancing by
``stride`` (= size for disjoint chunks, < size for overlap).  Window starts
are ``0, stride, 2*stride, ...`` up to the last start that still begins a
NON-EMPTY window, and the final window may be short (the tail) — no token
is dropped, chunks of one document never start at the same position, and a
document shorter than ``size`` yields exactly one chunk.  Everything is
narrow array math (``transform`` over a start ``sequence`` + one
``posexplode``): the corpus is scanned once, no shuffle at all unless the
caller aggregates downstream — the operator itself is embarrassingly
parallel at 10^12 documents.

Determinism: chunk_id is the 0-based window ordinal, chunk text joins the
token slice with single spaces (tokenization is the shared engine/oracle
regex, so chunk text is identical in both engines by construction).

Reference tie-in: none (ANN library); SURVEY §2.2 scalar/array family
applied to the training-data preparation task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from countrymaam_spark.functions import text as T


def chunk_docs(
    docs: DataFrame,
    size: int = 32,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_chunk_toks, chunk_text): ``size``-token windows
    every ``stride`` tokens (default disjoint: stride = size)."""
    if stride is None:
        stride = size
    size, stride = int(size), int(stride)
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    base = docs.select(
        F.col(id_col).alias("did"), T.tokens(F.col(text_col)).alias("toks")
    ).withColumn("n_tok", F.size("toks"))
    # last start: largest multiple of stride that is < n_tok (so the window
    # is non-empty); empty docs yield no chunks
    last = (F.ceil(F.col("n_tok") / F.lit(stride)) - 1) * F.lit(stride)
    chunks = F.transform(
        F.sequence(F.lit(0), last.cast("int"), F.lit(stride)),
        lambda p: F.struct(
            F.slice(F.col("toks"), p + 1, size).alias("ctoks"),
        ),
    )
    return (
        base.filter(F.col("n_tok") > 0)
        .select("did", F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            F.col("did").alias(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("c.ctoks").cast("long").alias("n_chunk_toks"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )


def chunk_docs_sql(
    rel: str,
    size: int = 32,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    if stride is None:
        stride = size
    toks = T.tokens_sql(text_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS did, {toks} AS toks FROM {rel}
        ), b2 AS (
            SELECT did, toks, len(toks) AS n_tok FROM base WHERE len(toks) > 0
        ), c1 AS (
            SELECT did,
                   unnest(list_transform(range(0, n_tok, {stride}),
                          p -> {{'cid': p // {stride},
                                 'ctoks': toks[(p+1):(p+{size})]}})) AS u
            FROM b2
        )
        SELECT did AS {id_col},
               CAST(u.cid AS BIGINT) AS chunk_id,
               CAST(len(u.ctoks) AS BIGINT) AS n_chunk_toks,
               array_to_string(u.ctoks, ' ') AS chunk_text
        FROM c1
    """
