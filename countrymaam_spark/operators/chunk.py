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


SENT_BREAK_RE = "([.!?]) "  # sentence boundary: terminal punctuation + space


def chunk_sentences(
    docs: DataFrame,
    max_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-aware chunking: (doc_id, chunk_id, n_sentences,
    n_chunk_toks, chunk_text) — sentences packed GREEDILY into chunks of at
    most ``max_tokens`` tokens, never splitting a sentence (the RAG /
    pretraining passage rule when mid-sentence cuts hurt downstream
    quality; :func:`chunk_docs` is the fixed-window complement that cuts
    anywhere).

    Semantics (engine-portable by construction):
    - sentence boundary = ``SENT_BREAK_RE`` (terminal punctuation followed
      by one space); the split keeps punctuation with its sentence by
      rewriting the boundary to an \\x01 sentinel and splitting on that —
      RE2 has no lookbehind, so this is the form BOTH engines run
      verbatim. Assumes \\x01 never occurs in ``text`` (true of any sane
      web-text extraction; loud and documented).
    - greedy packing: a sentence opens a new chunk iff the current chunk
      is non-empty and adding it would exceed ``max_tokens``; a single
      sentence longer than the budget gets its own (oversized) chunk.
      Token counts use the shared tokenizer regex.
    - chunks with zero tokens (all-punctuation documents) are dropped;
      since a 0-token sentence can never OPEN a chunk, chunk ids stay
      dense.

    Scale shape: the whole packing decision is ONE sequential fold per
    document (``F.aggregate`` over the sentence array — narrow, JVM-side,
    no Python); the only shuffle is the per-(doc, chunk) reassembly
    aggregate, O(output) wide. Embarrassingly parallel over documents.
    """
    max_tokens = int(max_tokens)
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    sents = F.split(
        F.regexp_replace(F.col(text_col), SENT_BREAK_RE, "$1\x01"), "\x01"
    )
    # materialize per-sentence token counts ONCE (they feed both the fold
    # and the output zip; as a repeated expression each sentence would be
    # tokenized twice per row)
    base = docs.select(F.col(id_col).alias("did"), sents.alias("sents")).withColumn(
        "cnts", F.transform(F.col("sents"), lambda s: F.size(T.tokens(s)))
    )
    counts = F.col("cnts")
    # greedy fold: running (cum, cid), emitting the chunk id per sentence
    ids = F.aggregate(
        counts,
        F.struct(
            F.lit(0).alias("cum"),
            F.lit(0).alias("cid"),
            F.expr("CAST(array() AS ARRAY<INT>)").alias("ids"),
        ),
        lambda acc, n: F.struct(
            F.when(
                (acc["cum"] + n > F.lit(max_tokens)) & (acc["cum"] > 0), n
            )
            .otherwise(acc["cum"] + n)
            .alias("cum"),
            F.when(
                (acc["cum"] + n > F.lit(max_tokens)) & (acc["cum"] > 0),
                acc["cid"] + 1,
            )
            .otherwise(acc["cid"])
            .alias("cid"),
            F.concat(
                acc["ids"],
                F.array(
                    F.when(
                        (acc["cum"] + n > F.lit(max_tokens)) & (acc["cum"] > 0),
                        acc["cid"] + 1,
                    ).otherwise(acc["cid"])
                ),
            ).alias("ids"),
        ),
        lambda acc: acc["ids"],
    )
    z = base.select(
        "did",
        F.posexplode(F.arrays_zip(F.col("sents"), counts.alias("n"), ids.alias("cid"))).alias(
            "pos", "s"
        ),
    )
    return (
        z.groupBy("did", F.col("s.cid").alias("chunk_id"))
        .agg(
            F.count("*").cast("long").alias("n_sentences"),
            F.sum("s.n").cast("long").alias("n_chunk_toks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", F.col("s.sents").alias("t")))),
                    lambda x: x["t"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .filter(F.col("n_chunk_toks") > 0)
        .select(
            F.col("did").alias(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "n_sentences",
            "n_chunk_toks",
            "chunk_text",
        )
    )


def chunk_sentences_sql(
    rel: str,
    max_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle: identical sentinel split + the greedy fold as a recursive
    CTE walking sentence ordinals (depth = max sentences per doc; fixture
    scale — which is what an oracle is for)."""
    toks_of = T.tokens_sql("u.s")
    return f"""
        WITH RECURSIVE sent AS (
            SELECT d.did, u.s AS txt, u.i AS i, len({toks_of}) AS n
            FROM (
                SELECT {id_col} AS did,
                       string_split(
                           regexp_replace({text_col}, '{SENT_BREAK_RE}',
                                          '\\1' || chr(1), 'g'),
                           chr(1)) AS l
                FROM {rel}
            ) d,
            LATERAL (SELECT unnest(d.l) AS s,
                            unnest(range(1, len(d.l) + 1)) AS i) u
        ),
        walk AS (
            SELECT did, i, n, txt, 0 AS cid, n AS cum
            FROM sent WHERE i = 1
            UNION ALL
            SELECT s.did, s.i, s.n, s.txt,
                   CASE WHEN w.cum + s.n > {max_tokens} AND w.cum > 0
                        THEN w.cid + 1 ELSE w.cid END,
                   CASE WHEN w.cum + s.n > {max_tokens} AND w.cum > 0
                        THEN s.n ELSE w.cum + s.n END
            FROM walk w JOIN sent s ON s.did = w.did AND s.i = w.i + 1
        )
        SELECT did AS {id_col},
               CAST(cid AS BIGINT) AS chunk_id,
               CAST(COUNT(*) AS BIGINT) AS n_sentences,
               CAST(SUM(n) AS BIGINT) AS n_chunk_toks,
               string_agg(txt, ' ' ORDER BY i) AS chunk_text
        FROM walk
        GROUP BY did, cid
        HAVING SUM(n) > 0
    """
