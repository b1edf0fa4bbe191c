"""End-to-end training-chunks pipeline: oracle equality on the fixture and
planted semantics for each gate (boilerplate, quality, dedup)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import trainset as TS
from countrymaam_spark.sources import pages as pg


def _pages_path() -> str:
    return os.path.join(pg.ensure_fixtures("sf0.001"), "pages.parquet")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(row[c] for c in cols) for row in df.collect())


def test_training_chunks_match_oracle(spark):
    pages = spark.read.parquet(_pages_path())
    got = _rows(TS.training_chunks(pages))
    df = duckdb.sql(TS.training_chunks_sql(f"'{_pages_path()}'")).df()
    assert got == sorted(df[sorted(df.columns)].itertuples(index=False, name=None))


@pytest.fixture()
def planted(spark):
    boiler = "Shared boilerplate sentence here"
    rows = []
    # 12 pages sharing the boiler line (df >= 10) + a unique body line
    for i in range(12):
        rows.append((f"u{i:02d}", f"{boiler}. Unique body text number {i} with several words"))
    # two pages whose CLEANED text is identical -> dedup to min url
    rows.append(("dup_b", f"{boiler}. same body after cleaning with more words"))
    rows.append(("dup_a", f"{boiler}. same body after cleaning with more words"))
    # a digit-junk page (survives line dedup, fails the quality gate)
    rows.append(("junk", f"{boiler}. 11 22 33 44 55 66 77 88 99 00 11 22"))
    # a too-short page
    rows.append(("short", f"{boiler}. tiny"))
    return spark.createDataFrame(rows, "url string, text string")


def test_gates(spark, planted):
    out = TS.training_chunks(planted, min_line_docs=10, min_tokens=5)
    urls = {r["url"] for r in out.select("url").distinct().collect()}
    # boilerplate-only removal: the 12 unique-body pages all survive
    assert all(f"u{i:02d}" in urls for i in range(12))
    # dedup: only the min url of the identical cleaned pair survives
    assert "dup_a" in urls and "dup_b" not in urls
    # quality gates
    assert "junk" not in urls and "short" not in urls
    # no chunk contains the boilerplate sentence
    assert out.filter(F.col("chunk_text").contains("boilerplate")).count() == 0
