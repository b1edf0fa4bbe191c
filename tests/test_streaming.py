"""Structured Streaming ingest: file-source drops -> geotag -> windowed
per-cell rollups; streaming result must equal the batch equivalent."""

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.functions import geo
from countrymaam_spark.operators.geotag import extract_geo
from countrymaam_spark.sources import pages as pg
from countrymaam_spark.streaming import ingest


@pytest.fixture(scope="module")
def drop_dir(tmp_path_factory):
    """Two parquet 'crawl drops' split from the sf0.001 fixture."""
    out = pg.ensure_fixtures("sf0.001")
    src = os.path.join(out, "pages.parquet")
    t = pq.read_table(src)
    d = tmp_path_factory.mktemp("drops")
    pq.write_table(t.slice(0, 1000), os.path.join(d, "drop1.parquet"))
    pq.write_table(t.slice(1000), os.path.join(d, "drop2.parquet"))
    return str(d)


def test_streaming_counts_equal_batch(spark, drop_dir):
    batch = spark.read.parquet(drop_dir)
    schema = batch.schema
    stream = ingest.stream_pages_from_dir(spark, drop_dir, schema)
    assert stream.isStreaming
    rolled = ingest.windowed_cell_counts(ingest.geotag_stream(stream))
    # append mode would hold every window open until a LATER batch advances
    # the watermark; a finite availableNow run therefore emits nothing.
    # complete mode emits the full rollup each commit.
    q = ingest.run_to_memory_sink(rolled, "cell_counts_test", mode="complete")
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["parent"]): r["n_pages"]
        for r in spark.sql("SELECT * FROM cell_counts_test").collect()
    }
    g = extract_geo(batch).filter(F.col("lat").isNotNull()).withColumn(
        "cell", geo.encode_cell(F.col("lat"), F.col("lon"), 7)
    )
    want = {
        (r["w"]["start"], r["parent"]): r["n"]
        for r in g.groupBy(
            F.window("warc_ts", "10 minutes").alias("w"),
            geo.cell_parent(F.col("cell"), 4, 7).alias("parent"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) == 2000


def test_stateful_sessionize_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: state carries (last ts, counts)
    across micro-batches; with time-ordered drops the final update per user
    equals the batch lag+running-sum sessionization exactly."""
    from pyspark.sql import Window

    from countrymaam_spark.streaming import sessionize as SZ

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # two time-ordered drops -> two micro-batches -> state must carry over
    cut = events.agg(
        F.median(F.unix_timestamp(F.col("ts"))).alias("m")
    ).collect()[0]["m"]
    d = tmp_path / "edrops"
    d.mkdir()
    ets = F.unix_timestamp(F.col("ts"))
    events.filter(ets <= cut).coalesce(1).write.parquet(str(d / "d1"))
    events.filter(ets > cut).coalesce(1).write.parquet(str(d / "d2"))
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for sub in ("d1", "d2"):
        for f in sorted((d / sub).glob("*.parquet")):
            shutil.copy(f, flat / f"drop{n}.parquet")
            n += 1

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # one drop per micro-batch
        .parquet(str(flat))
    )
    q = (
        SZ.sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per user wins (memory sink appends one row per batch)
    updates = spark.sql("SELECT * FROM sess_state_test").toPandas()
    got = {
        int(r.user_id): (int(r.n_sessions), int(r.n_events))
        for _, r in updates.groupby("user_id").tail(1).iterrows()
    }

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp(F.col("ts")) - F.lag(F.unix_timestamp(F.col("ts"))).over(w)
    batch = (
        events.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id")
        .agg(F.max("sess_id").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    want = {
        int(r["user_id"]): (int(r["n_sessions"]), int(r["n_events"]))
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def _mk_pages(spark, rows):
    """rows: [(url, ts_str, lat, lon)] -> pages-schema DataFrame whose text
    geotags to exactly (lat, lon)."""
    import datetime as dt

    data = [
        (
            url,
            dt.datetime.fromisoformat(ts).replace(tzinfo=dt.timezone.utc),
            b"<html/>",
            f"crawl page near city ({lat:.4f}, {lon:.4f})",
            "en",
        )
        for url, ts, lat, lon in rows
    ]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_append_mode_watermark_evicts_and_drops_late(spark, tmp_path):
    """Round-3 verdict #9: multi-drop APPEND-mode rollup — a window is
    emitted exactly once after the watermark passes its end, a late row
    behind the watermark is DROPPED, and a still-open window is withheld."""
    import os as _os
    import time as _time

    from countrymaam_spark.streaming import serve as SV

    d = tmp_path / "wdrops"
    d.mkdir()
    lat, lon = 10.0, 20.0
    drops = [
        # 5 rows in window [00:00, 00:10)
        [(f"https://a{i}.example/", f"2024-01-01 00:0{i}:00", lat, lon) for i in range(5)],
        # 02:00 advances the watermark to 01:30 -> closes the 00:00 window
        [(f"https://b{i}.example/", "2024-01-01 02:00:30", lat, lon) for i in range(3)],
        # advances the watermark further (Spark's late-event filter lags ONE
        # batch behind eviction, so the late row must arrive >= 2 batches
        # after the closing drop to exercise the drop path — measured)
        [("https://c0.example/", "2024-01-01 04:00:00", lat, lon)],
        # LATE row far behind the watermark (dropped) + 06:00 row that
        # closes the 04:00 window; its own window stays open (withheld)
        [("https://late.example/", "2024-01-01 00:06:00", lat, lon),
         ("https://e0.example/", "2024-01-01 06:00:00", lat, lon)],
    ]
    for i, rows in enumerate(drops):
        p = str(d / f"drop{i}.parquet")
        _mk_pages(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        # one FILE per drop for deterministic one-drop-per-batch ordering
        files = [f for f in _os.listdir(p) if f.endswith(".parquet")]
        assert len(files) == 1
        _os.rename(_os.path.join(p, files[0]), str(d / f"d{i}.parquet"))
        _os.utime(str(d / f"d{i}.parquet"), (1700000000 + i, 1700000000 + i))
    for extra in d.iterdir():
        if extra.is_dir():
            import shutil as _sh
            _sh.rmtree(extra)

    schema = spark.read.parquet(str(d / "d0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    rolled = ingest.windowed_cell_counts(ingest.geotag_stream(stream))
    q = (
        rolled.writeStream.format("memory")
        .queryName("wm_append_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    SV.await_stream(q, 180)
    got = {
        (str(r["window_start"]), r["n_pages"])
        for r in spark.sql("SELECT * FROM wm_append_test").collect()
    }
    # each closed window emitted EXACTLY once with the late row excluded;
    # the 06:00 window is still open -> withheld
    assert got == {
        ("2024-01-01 00:00:00", 5),
        ("2024-01-01 02:00:00", 3),
        ("2024-01-01 04:00:00", 1),
    }
    # the watermark actually dropped the late row (not just missing state)
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_stream_knn_serve_equals_batch(spark, tmp_path):
    """Round-3 verdict #8 (#27 literal form): a queries STREAM served per
    micro-batch from PERSISTED IVF state — the union of streamed results
    equals the one-shot batch serve over all queries."""
    from countrymaam_spark.operators import ann
    from countrymaam_spark.plans import pipeline as PL
    from countrymaam_spark.streaming import serve as SV

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    out = str(tmp_path / "ivf_state")
    PL.build_ivf_pipeline(spark, corpus, out, n_lists=8, seed=1)
    lists_df, cents = PL.load_ivf(spark, out)
    lists_df = lists_df.cache()

    queries = corpus.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qdir = tmp_path / "qdrops"
    qdir.mkdir()
    queries.filter(F.col("query_id") < 6).coalesce(1).write.parquet(str(qdir / "q0"))
    queries.filter(F.col("query_id") >= 6).coalesce(1).write.parquet(str(qdir / "q1"))
    import shutil as _sh
    flat = tmp_path / "qflat"
    flat.mkdir()
    n = 0
    for sub in ("q0", "q1"):
        for f in sorted((qdir / sub).glob("*.parquet")):
            _sh.copy(f, flat / f"q{n}.parquet")
            n += 1

    qstream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    sink = str(tmp_path / "served")
    # the serve loop KNOWS its batch bound (maxFilesPerTrigger=1, 6-row
    # drops): pass it as n_queries so each micro-batch skips the count
    # planning job — one fewer job per batch, identical results
    sq = SV.serve_knn_stream(
        qstream,
        lambda batch: ann.ivf_knn_from_state(
            lists_df, cents, batch, k=5, n_probe=8, n_queries=6
        ),
        sink_dir=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    SV.await_stream(sq, 300)
    served = spark.read.parquet(sink)
    assert served.select("serve_batch_id").distinct().count() == 2
    got = sorted(
        (r["query_id"], r["rk"], r["vec_id"])
        for r in served.select("query_id", "rk", "vec_id").collect()
    )
    want = sorted(
        (r["query_id"], r["rk"], r["vec_id"])
        for r in ann.ivf_knn_from_state(lists_df, cents, queries, k=5, n_probe=8)
        .select("query_id", "rk", "vec_id")
        .collect()
    )
    assert got == want


def test_stream_cell_knn_serve_from_state(spark, tmp_path):
    """Geo query stream served per micro-batch from PERSISTED cell-index
    state (encoded corpus + count stats) — streamed union equals the
    one-shot batch serve, which itself is exact."""
    import shutil as _sh

    from countrymaam_spark.operators.geotag import extract_geo
    from countrymaam_spark.operators.knn import cell_knn
    from countrymaam_spark.plans import pipeline as PL
    from countrymaam_spark.sources import pages as pg
    from countrymaam_spark.streaming import serve as SV

    fx = pg.ensure_fixtures("sf0.001")
    geo = extract_geo(spark.read.parquet(os.path.join(fx, "pages.parquet"))).select(
        "url", "lat", "lon"
    )
    out = str(tmp_path / "cell_state")
    PL.build_cell_pipeline(spark, geo, out, res=6)
    cells, stats = PL.load_cell_state(spark, out)
    stats = stats.localCheckpoint(eager=True)

    queries = (
        spark.read.parquet(os.path.join(fx, "knn_queries.parquet"))
        .filter(F.col("query_id") < 12)
        .select("query_id", "lat", "lon")
    )
    flat_dir = tmp_path / "qflat"
    flat_dir.mkdir()
    for i, pred in enumerate((F.col("query_id") < 6, F.col("query_id") >= 6)):
        tmp = tmp_path / f"qtmp{i}"
        queries.filter(pred).coalesce(1).write.parquet(str(tmp))
        for f in sorted(tmp.glob("*.parquet")):
            _sh.copy(f, flat_dir / f"q{i}.parquet")

    qstream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat_dir))
    )
    sink = str(tmp_path / "served")
    sq = SV.serve_knn_stream(
        qstream,
        lambda batch: cell_knn(cells, batch, k=5, res=6, cell_col="cell", stats=stats),
        sink_dir=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    SV.await_stream(sq, 300)
    served = spark.read.parquet(sink)
    assert served.select("serve_batch_id").distinct().count() == 2
    got = sorted(
        (r["query_id"], r["rk"], r["url"]) for r in served.collect()
    )
    want = sorted(
        (r["query_id"], r["rk"], r["url"])
        for r in cell_knn(cells, queries, k=5, res=6, cell_col="cell", stats=stats).collect()
    )
    assert got == want


def test_maintain_cell_state_stream_equals_batch_build(spark, tmp_path):
    """Write-side streaming maintenance: ingest the pages fixture as three
    drops; the streamed cell_corpus must equal the batch-encoded corpus (no
    duplicates — per-batch idempotent partitions), the streamed cell_lut
    must EXACTLY equal build_cell_lut over everything ingested (update-mode
    counts are exactly-once through the state store), a restart on the same
    checkpoint must add nothing, and cell_knn served from the streamed state
    must match the flat exact oracle."""
    import pyarrow.parquet as pq

    from countrymaam_spark.operators.knn import (
        build_cell_lut,
        build_cell_stats,
        cell_knn,
        flat_knn,
    )
    from countrymaam_spark.streaming import maintain

    out = pg.ensure_fixtures("sf0.001")
    t = pq.read_table(os.path.join(out, "pages.parquet"))
    drops = tmp_path / "drops"
    drops.mkdir()
    pq.write_table(t.slice(0, 700), str(drops / "d1.parquet"))
    pq.write_table(t.slice(700, 700), str(drops / "d2.parquet"))
    pq.write_table(t.slice(1400), str(drops / "d3.parquet"))

    state = str(tmp_path / "state")
    batch_all = spark.read.parquet(str(drops))
    schema = batch_all.schema

    def run_once():
        stream = ingest.stream_pages_from_dir(spark, str(drops), schema)
        g = ingest.geotag_stream(stream, res=7)
        q1 = maintain.maintain_cell_corpus_stream(
            g, state, str(tmp_path / "ck_corpus")
        )
        q2 = maintain.maintain_cell_lut_stream(
            g, state, str(tmp_path / "ck_lut"), res=7
        )
        assert q1.awaitTermination(180) and q2.awaitTermination(180)

    run_once()
    geo_batch = (
        extract_geo(batch_all)
        .filter(F.col("lat").isNotNull())
        .withColumn("cell", geo.encode_cell(F.col("lat"), F.col("lon"), 7))
    )
    got_corpus = sorted(
        (r["url"], r["cell"])
        for r in spark.read.parquet(os.path.join(state, "cell_corpus")).collect()
    )
    want_corpus = sorted(
        (r["url"], r["cell"]) for r in geo_batch.select("url", "cell").collect()
    )
    assert got_corpus == want_corpus
    want_lut = sorted(
        (r["lv"], r["cell"], r["cnt"])
        for r in build_cell_lut(build_cell_stats(geo_batch, 7, cell_col="cell"), 7).collect()
    )
    got_lut = sorted(
        (r["lv"], r["cell"], r["cnt"])
        for r in spark.read.parquet(os.path.join(state, "cell_lut")).collect()
    )
    assert got_lut == want_lut

    # restart on the same checkpoints: no new data -> state unchanged
    run_once()
    again = sorted(
        (r["lv"], r["cell"], r["cnt"])
        for r in spark.read.parquet(os.path.join(state, "cell_lut")).collect()
    )
    assert again == want_lut
    assert (
        spark.read.parquet(os.path.join(state, "cell_corpus")).count()
        == len(want_corpus)
    )

    # serving straight from the streamed state == exact flat oracle
    from countrymaam_spark.plans.pipeline import load_cell_state

    cells, lut = load_cell_state(spark, state)
    q = pg.load_knn_queries(spark, "/root/testdata/sf0.001").limit(20)
    got = sorted(
        map(
            tuple,
            cell_knn(cells, q, k=5, res=7, cell_col="cell", stats=lut)
            .select("query_id", "rk", "url")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            flat_knn(geo_batch, q, k=5).select("query_id", "rk", "url").collect(),
        )
    )
    assert got == want


def test_stream_pip_counts_equal_batch(spark, drop_dir):
    """Stream-static PIP over TWO drops == the batch windowed rollup
    (multi-batch: the static broadcast sides serve both micro-batches)."""
    from countrymaam_spark.operators.pip import point_in_polygon

    out = pg.ensure_fixtures("sf0.001")
    edges = spark.read.parquet(os.path.join(out, "polygon_edges.parquet"))
    batch = spark.read.parquet(drop_dir)
    schema = batch.schema
    stream = ingest.stream_pages_from_dir(spark, drop_dir, schema)
    rolled = ingest.stream_pip_counts(
        ingest.geotag_stream(stream, res=6), edges, res=6
    )
    q = ingest.run_to_memory_sink(rolled, "pip_counts_test", mode="complete")
    assert q.awaitTermination(240)
    got = {
        (r["window_start"], r["poly_id"], r["n_pages"])
        for r in spark.table("pip_counts_test").collect()
    }
    inside = point_in_polygon(extract_geo(batch), edges, res=6)
    want = {
        (r["ws"], r["poly_id"], r["n"])
        for r in inside.join(batch.select("url", "warc_ts"), "url")
        .groupBy(F.window("warc_ts", "1 day").alias("w"), "poly_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "poly_id", "n")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_first_arrival_across_batches(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark): duplicates of
    a text arriving in the SAME and in LATER micro-batches are dropped; each
    distinct text is emitted exactly once (its first arrival); the emitted
    key set equals the batch distinct-sha oracle."""
    import os as _os

    d = tmp_path / "ddrops"
    d.mkdir()
    # drop 0: texts A, A (same-batch dup), B -- drop 1: A, B (cross-batch
    # dups), C -- all within the watermark horizon
    drops = [
        [("https://a1.example/", "2024-01-01 00:01:00", 10.0, 20.0),
         ("https://a2.example/", "2024-01-01 00:02:00", 10.0, 20.0),
         ("https://b1.example/", "2024-01-01 00:03:00", 11.0, 21.0)],
        [("https://a3.example/", "2024-01-01 00:04:00", 10.0, 20.0),
         ("https://b2.example/", "2024-01-01 00:05:00", 11.0, 21.0),
         ("https://c1.example/", "2024-01-01 00:06:00", 12.0, 22.0)],
    ]
    for i, rows in enumerate(drops):
        p = str(d / f"drop{i}.parquet")
        _mk_pages(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        files = [f for f in _os.listdir(p) if f.endswith(".parquet")]
        assert len(files) == 1
        _os.rename(_os.path.join(p, files[0]), str(d / f"d{i}.parquet"))
        _os.utime(str(d / f"d{i}.parquet"), (1700000000 + i, 1700000000 + i))
    for extra in d.iterdir():
        if extra.is_dir():
            import shutil as _sh

            _sh.rmtree(extra)

    schema = spark.read.parquet(str(d / "d0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one drop per micro-batch
        .parquet(str(d))
    )
    q = ingest.run_to_memory_sink(ingest.dedup_stream(stream), "dedup_stream_test")
    assert q.awaitTermination(180)
    got = [r["text_sha"] for r in spark.sql("SELECT text_sha FROM dedup_stream_test").collect()]
    # exactly once per distinct text (3 distinct), no dup survived
    assert len(got) == 3 and len(set(got)) == 3
    batch = spark.read.parquet(str(d))
    want = {r["s"] for r in batch.select(F.sha2(F.col("text"), 256).alias("s")).distinct().collect()}
    assert set(got) == want


def test_stream_line_clean_equals_batch(spark, tmp_path):
    """Stateless streaming boilerplate strip from prebuilt state: two
    micro-batches (maxFilesPerTrigger=1) over the fixture halves produce
    exactly the batch clean_pages rows, including the dropped
    fully-templated page and the kept empty-text page."""
    import os

    from countrymaam_spark.operators import lines as LN
    from countrymaam_spark.streaming import curate

    boiler_line = "Common template sentence shared by many pages"
    rows = [
        (f"u{i:02d}", f"{boiler_line}. Unique body {i} here") for i in range(12)
    ]
    rows.append(("all_boiler", boiler_line))     # fully templated -> dropped
    rows.append(("empty", ""))                   # empty text -> kept as ""
    pages = spark.createDataFrame(rows, "url string, text string")
    boiler = [r["line"] for r in LN.boiler_lines(pages, 10).collect()]
    assert boiler  # the planted template qualified

    drop = tmp_path / "drops"
    drop.mkdir()
    pages.filter(F.col("url") < "u06").coalesce(1).write.parquet(str(drop / "a"))
    pages.filter(~(F.col("url") < "u06")).coalesce(1).write.parquet(str(drop / "b"))
    # flatten: file source wants files in one dir
    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for sub in ("a", "b"):
        for f in os.listdir(drop / sub):
            if f.endswith(".parquet"):
                os.link(drop / sub / f, flat / f"d{n}.parquet")
                n += 1
    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    sq = (
        curate.clean_pages_stream(stream, boiler)
        .writeStream.format("memory")
        .queryName("t_stream_clean")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert sq.awaitTermination(300)
    got = {(r["url"], r["clean_text"]) for r in spark.table("t_stream_clean").collect()}
    want = {(r["url"], r["clean_text"]) for r in LN.clean_pages(pages, 10).collect()}
    assert got == want
    assert ("all_boiler", "") not in got and ("empty", "") in got


def test_maintain_kmv_stream_equals_batch_sketch(spark, tmp_path):
    """Streamed sketch maintenance: ingest three drops; the maintained
    snapshot must equal the batch sketch over everything, row-for-row; a
    restart on the same checkpoint (replay surface) must change nothing —
    merge idempotence is the exactly-once mechanism."""
    import pyarrow.parquet as pq

    from countrymaam_spark.operators import sketch as SK
    from countrymaam_spark.operators.webtext import HOST_RE
    from countrymaam_spark.streaming import maintain

    out = pg.ensure_fixtures("sf0.001")
    t = pq.read_table(os.path.join(out, "pages.parquet"))
    drops = tmp_path / "drops"
    drops.mkdir()
    pq.write_table(t.slice(0, 700), str(drops / "d1.parquet"))
    pq.write_table(t.slice(700, 700), str(drops / "d2.parquet"))
    pq.write_table(t.slice(1400), str(drops / "d3.parquet"))

    batch_all = spark.read.parquet(str(drops))
    schema = batch_all.schema

    def keyed(df):
        return df.select(
            "lang", F.regexp_extract(F.col("url"), HOST_RE, 1).alias("host")
        )

    state = str(tmp_path / "state")

    def run_once():
        stream = ingest.stream_pages_from_dir(spark, str(drops), schema)
        q = maintain.maintain_kmv_stream(
            keyed(stream), state, str(tmp_path / "ck_kmv"), ["lang"], "host", k=64
        )
        assert q.awaitTermination(180)

    run_once()
    streamed = sorted(
        map(tuple, spark.read.parquet(os.path.join(state, "kmv_sketch")).collect())
    )
    direct = sorted(
        map(tuple, SK.kmv_sketch(keyed(batch_all), ["lang"], "host", k=64).collect())
    )
    assert streamed == direct
    run_once()  # restart on the same checkpoint: nothing to add
    again = sorted(
        map(tuple, spark.read.parquet(os.path.join(state, "kmv_sketch")).collect())
    )
    assert again == direct
    # estimates from the maintained state equal estimates from the batch sketch
    est_stream = dict(
        SK.kmv_estimate(
            spark.read.parquet(os.path.join(state, "kmv_sketch")), ["lang"], k=64
        ).collect()
    )
    est_batch = dict(
        SK.kmv_distinct(keyed(batch_all), ["lang"], "host", k=64).collect()
    )
    assert est_stream == est_batch
