"""Text-analysis functions vs the byte-identical DuckDB formulas, on the
driver-provided documents table."""

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.functions import text as T

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


def _duck(sql):
    return duckdb.sql(sql).fetchall()


def test_token_count_matches(spark, docs):
    got = dict(
        docs.select("doc_id", T.token_count(F.col("text")).alias("tc")).collect()
    )
    want = dict(_duck(f"SELECT doc_id, {T.token_count_sql('text')} FROM '{DOCS}'"))
    assert got == want


def test_tok_hash_matches(spark):
    toks = ["hello", "spark", "a", "42", "x" * 50]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = [r[0] for r in df.select(T.tok_hash(F.col("t"))).collect()]
    want = [r[0] for r in _duck(
        "SELECT " + T.tok_hash_sql("t") + " FROM (SELECT unnest([" + ",".join(f"'{t}'" for t in toks) + "]) AS t)"
    )]
    assert got == want


def test_fingerprint_matches(spark, docs):
    got = dict(docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).collect())
    want = dict(_duck(f"SELECT doc_id, {T.fingerprint_sql('text')} FROM '{DOCS}'"))
    assert got == want


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",)], "t string")
    fps = [r[0] for r in df.select(T.fingerprint(F.col("t"))).collect()]
    assert fps[0] != fps[1]


def test_simhash_matches(spark, docs):
    got = dict(docs.select("doc_id", T.simhash(F.col("text")).alias("sh")).collect())
    want = dict(_duck(f"SELECT doc_id, {T.simhash_sql('text')} FROM '{DOCS}'"))
    assert got == want


def test_quality_score_matches(spark, docs):
    got = dict(docs.select("doc_id", T.quality_score(F.col("text")).alias("q")).collect())
    want = dict(_duck(f"SELECT doc_id, {T.quality_score_sql('text')} FROM '{DOCS}'"))
    assert got == pytest.approx(want)


def test_lang_id_matches(spark, docs):
    got = dict(docs.select("doc_id", T.lang_id(F.col("text")).alias("l")).collect())
    want = dict(_duck(f"SELECT doc_id, {T.lang_id_sql('text')} FROM '{DOCS}'"))
    assert got == want


def test_lang_id_basic(spark):
    samples = [
        ("the cat and the dog is in this house for now", "en"),
        ("der hund und die katze ist nicht mit dem mann", "de"),
        ("xyzzy qwfp", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in samples], "t string")
    got = [r[0] for r in df.select(T.lang_id(F.col("t"))).collect()]
    assert got == [l for _, l in samples]


def test_shingles_match(spark, docs):
    got = dict(docs.select("doc_id", T.shingles(F.col("text")).alias("s")).collect())
    want = dict(_duck(f"SELECT doc_id, {T.shingles_sql('text')} FROM '{DOCS}'"))
    assert got == want


def test_minhash_identical_texts_equal_sig(spark):
    df = spark.createDataFrame([("one two three four five",)] * 2, "t string")
    sigs = [tuple(r[0]) for r in df.select(T.minhash_sig(T.shingles(F.col("t")))).collect()]
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == 16


def test_minhash_vec_identical_to_expression_form(spark):
    """The vectorized pandas-UDF signature must stay bit-identical to the
    expression form (which defines the oracle-shared semantics)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = docs.select("doc_id", T.shingles(F.col("text"), 3).alias("sh"))
    a = sh.select("doc_id", T.minhash_sig(F.col("sh")).alias("s")).orderBy("doc_id").collect()
    b = sh.select("doc_id", T.minhash_sig_vec(F.col("sh")).alias("s")).orderBy("doc_id").collect()
    assert all(x["s"] == y["s"] for x, y in zip(a, b)) and len(a) > 0


def test_simhash_vec_identical_to_expression_form(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.select("doc_id", T.simhash(F.col("text")).alias("s")).orderBy("doc_id").collect()
    b = docs.select(
        "doc_id", T.simhash_vec(T.tokens(F.col("text"))).alias("s")
    ).orderBy("doc_id").collect()
    assert all(x["s"] == y["s"] for x, y in zip(a, b)) and len(a) > 0


def test_bpe_token_count_matches_oracle_and_hand_case(spark):
    """Letter runs count once; every digit and punctuation mark counts
    alone. Engine (Java regex) and oracle (RE2) must agree exactly."""
    import duckdb

    row = spark.createDataFrame(
        [(1, "Page 42, don't (66.8)")], "doc_id long, text string"
    ).select(T.bpe_token_count(F.col("text")).alias("n")).first()
    # Page|4|2|,|don|'|t|(|6|6|.|8|) -> 13
    assert row["n"] == 13
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {(r["doc_id"], r["n"]) for r in docs.select("doc_id", T.bpe_token_count(F.col("text")).alias("n")).collect()}
    want = set(duckdb.sql(
        "SELECT doc_id, " + T.bpe_token_count_sql("text")
        + " AS n FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall())
    assert got == want
