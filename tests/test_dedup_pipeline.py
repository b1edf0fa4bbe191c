"""Persisted dedup state: append == rebuild for all three tables, new-batch
near-dup pairs == full-corpus pairs restricted to the batch, exact-recrawl
probe, and resume acceptance of the appended snapshots."""

import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import dedup
from countrymaam_spark.plans import pipeline as P

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    """Fixture docs + one planted byte-identical recrawl (id 9999 = copy of
    doc 0's text) and one planted near-dup of doc 1 (id 9998)."""
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    t0, t1 = [
        r["text"]
        for r in docs.filter(F.col("doc_id").isin(0, 1)).orderBy("doc_id").collect()
    ]
    planted = spark.createDataFrame(
        [(9999, t0), (9998, t1 + " tail")], "doc_id long, text string"
    )
    return docs.unionByName(planted).cache()


@pytest.fixture(scope="module")
def state(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dedup_state"))
    first = corpus.filter(F.col("doc_id") % 2 == 0)
    second = corpus.filter(F.col("doc_id") % 2 == 1)
    P.build_dedup_pipeline(spark, first, out)
    report = P.append_dedup_pipeline(spark, second, out)
    return out, report, first, second


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(row[c] for c in cols) for row in df.collect())


def test_sha_state_equals_rebuild(spark, corpus, state):
    out, _, _, _ = state
    sha, _, _ = P.load_dedup_state(spark, out)
    want = (
        corpus.select("doc_id", F.sha2("text", 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
    )
    assert _rows(sha) == _rows(want)
    # the planted recrawl shares doc 0's sha: canonical stays 0, count 2
    grp = sha.filter(F.col("canonical_id") == 0).collect()
    assert len(grp) == 1 and grp[0]["n_docs"] == 2


def test_exact_recrawl_probe_reported(state):
    _, report, _, _ = state
    # 9999 (odd batch) is byte-identical to doc 0 (even batch)
    assert report["dedup_sha"]["exact_hits"] >= 1


def test_band_and_shingle_state_equal_rebuild(spark, corpus, state, tmp_path_factory):
    out, _, _, _ = state
    _, sh, bands = P.load_dedup_state(spark, out)
    out2 = str(tmp_path_factory.mktemp("dedup_rebuild"))
    P.build_dedup_pipeline(spark, corpus, out2)
    _, sh2, bands2 = P.load_dedup_state(spark, out2)
    assert _rows(sh.select("did", "n_sh")) == _rows(sh2.select("did", "n_sh"))
    assert _rows(bands) == _rows(bands2)


def test_new_pairs_equal_rebuild_restricted(spark, corpus, state):
    out, _, first, second = state
    got = _rows(spark.read.parquet(f"{out}/dedup_new_pairs"))
    new_ids = {r["doc_id"] for r in second.select("doc_id").collect()}
    full = dedup.minhash_lsh_pairs(corpus, tau=0.8)
    want = sorted(
        (r["id_a"], r["id_b"], r["jac"])
        for r in full.collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    )
    assert got == want
    # the planted near-dup pair (1, 9998) must be among them
    assert any(a == 1 and b == 9998 for a, b, _ in got)


def test_resume_accepts_appended_state(spark, corpus, state):
    out, _, _, _ = state
    r = P.build_dedup_pipeline(spark, corpus, out)  # same params key
    assert all(v["skipped"] for v in r.values())
