"""PII scrubbing: planted-pattern semantics + oracle parity + totality."""

import duckdb
import pandas as pd

from countrymaam_spark.operators import scrub as SC


def test_scrub_planted_patterns(spark):
    rows = [
        (1, "write to alice.smith+x@sub.example.org today"),
        (2, "server at 192.168.0.1 answered"),
        (3, "call +1 (555) 123-4567 or 0123-456-789 now"),
        (4, "no pii here at all"),
        (5, "combo a@b.io 10.0.0.7 +44 20 7946 0958 end"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: (r["n_email"], r["n_ip"], r["n_phone"]) for r in SC.pii_stats(docs).collect()}
    assert stats == {1: (1, 0, 0), 2: (0, 1, 0), 3: (0, 0, 2), 4: (0, 0, 0), 5: (1, 1, 1)}
    txt = {r["doc_id"]: r["text"] for r in SC.scrub_pii(docs).collect()}
    assert txt[1] == "write to <EMAIL> today"
    assert txt[2] == "server at <IP> answered"
    assert txt[3] == "call <PHONE> or <PHONE> now"
    assert txt[4] == "no pii here at all"
    assert txt[5] == "combo <EMAIL> <IP> <PHONE> end"


def test_scrub_matches_oracle(spark):
    rows = [
        (1, "mail bob@x.co and 10.0.0.1 or call +1 (555) 123-4567 at a@1.2.3.4 site"),
        (2, "decimals 66.83034, 100.57113 and year 2017 must survive"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    for fn, sql_fn in ((SC.pii_stats, SC.pii_stats_sql), (SC.scrub_pii, SC.scrub_pii_sql)):
        got = sorted(tuple(r) for r in fn(docs).collect())
        want = sorted(tuple(r) for r in con.execute(sql_fn("t")).fetchall())
        assert got == want
    # coordinates / years never masked
    txt = {r["doc_id"]: r["text"] for r in SC.scrub_pii(docs).collect()}
    assert txt[2] == "decimals 66.83034, 100.57113 and year 2017 must survive"


def test_scrub_total_on_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert SC.pii_stats(empty).count() == 0
    assert SC.scrub_pii(empty).count() == 0
