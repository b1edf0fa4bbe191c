"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is end-to-end wall seconds for the geo pipeline
(geotag -> cell encode -> PIP join -> tile rollup -> cell-index kNN);
"pages_per_sec" in the payload is the north-star throughput number.
Results are fully materialized via the noop sink (no collect cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from countrymaam_spark.operators import ann, dedup
from countrymaam_spark.operators.geotag import extract_geo
from countrymaam_spark.operators.knn import cell_knn
from countrymaam_spark.operators.pip import point_in_polygon
from countrymaam_spark.operators.tiles import tile_counts
from countrymaam_spark.functions import geo as G
from countrymaam_spark.session import get_spark
from countrymaam_spark.sources import pages as PG


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = PG.sf_name_from_dir(sf_dir)
    PG.ensure_fixtures(sf_name)

    # size scan splits to ~4 waves per core: the single-file fixture otherwise
    # yields too few (or row-group-misaligned) read tasks to keep a wider
    # executor pool busy — the same spark.sql.files.maxPartitionBytes tuning a
    # real cluster applies per input. Clamped to [4 MB, 128 MB].
    pages_bytes = os.path.getsize(
        os.path.join(PG.fixture_dir(sf_name), "pages.parquet")
    )
    split_bytes = min(max(pages_bytes // (cpus * 4), 4 << 20), 128 << 20)
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="countrymaam_spark_bench",
        # SPARK_GRAFT_SHUFFLE decouples shuffle width from core count: with
        # partitions=cpus a 4-core arm gets 4x-wider partitions on the SAME
        # data, which can spill and corrupt N-vs-4N comparisons (a real
        # cluster sizes shuffle partitions to the data, not the core count)
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus)),
        extra_conf={
            # 12g, NOT bigger: with a 24g heap G1 expands lazily and the JVM
            # degenerates into multi-core GC storms (measured 7-160s run
            # variance on a 5s job at sf10; stable at 8-12g). 12g over 8g
            # gives the blob-batch stages headroom.
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "12g"),
            "spark.sql.files.maxPartitionBytes": str(split_bytes),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the python worker pool (one-time pandas/pyarrow import per worker
    # slot — session startup, not workload; a long-lived cluster pays it once)
    spark.range(0, cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    only = os.environ.get("SPARK_GRAFT_STAGES")
    only_set = set(only.split(",")) if only else None

    # SPARK_GRAFT_WARM=1: run each stage once untimed, then time the second
    # run — steady-state numbers (JIT compiled, python pool live, caches
    # resident), the regime a long-lived cluster job actually runs in. The
    # cold default measures first-run latency.
    warm = os.environ.get("SPARK_GRAFT_WARM", "0") == "1"

    def timed(name: str, fn) -> None:
        if only_set is not None and name not in only_set:
            return
        if warm:
            fn()
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    pages = PG.load_pages(spark, sf_dir)
    n_pages = pages.count()

    # geotag + cell encode (the index-ingest stage), materialized once and
    # cached: every downstream geo stage consumes it (as in production where
    # the geo table is a persisted Iceberg stage)
    def _geo(df):
        return (
            extract_geo(df)
            .select("url", "lat", "lon")
            .withColumn("cell", G.encode_cell(F.col("lat"), F.col("lon"), 7))
        )

    # JIT/codegen warmup on a small slice: C2-compiling the generated code on
    # the first heavy query otherwise inflates the first timed stage 2-4x
    materialize(_geo(pages.limit(20_000)))

    # NEVER shuffle the wide pages rows (html+text) — project the narrow geo
    # columns first; the scan's natural splits feed the projection
    g = _geo(pages)
    timed("geotag_cell_encode", lambda: materialize(g))
    # persist the narrow geo table as a parquet snapshot and read it back —
    # the production shape (each stage lands as a table) and it keeps the big
    # row set OUT of the JVM heap (an in-heap .cache() of 20M rows OOMs the
    # GC-stable 8g heap; the OS page cache serves the re-reads just as fast)
    import tempfile

    geo_dir = tempfile.mkdtemp(prefix="cm_geo_")
    g.write.mode("overwrite").parquet(os.path.join(geo_dir, "geo"))
    g = spark.read.parquet(os.path.join(geo_dir, "geo"))

    queries = PG.load_knn_queries(spark, sf_dir)
    # SPARK_GRAFT_KNN_QUERIES=<n>: replace the 200-query fixture with a
    # larger deterministic query set. The kNN serving stages are latency-
    # bound at 200 queries (driver-round / blob-load constants dominate);
    # production serves large query batches, where those constants amortize
    # — this knob measures that throughput regime for the scaling report.
    nq = int(os.environ.get("SPARK_GRAFT_KNN_QUERIES", "0"))
    if nq:
        queries = spark.createDataFrame(PG.gen_knn_queries(nq).to_pandas())
    edges = PG.load_polygon_edges(spark, sf_dir)

    timed("pip_join", lambda: materialize(point_in_polygon(g, edges, res=6)))
    timed("tile_counts", lambda: materialize(tile_counts(g, [4, 8, 12])))

    # round-4 spatial operators (additive stages: counted in total_sec and
    # the queries payload, NOT in the headline geo_pipeline_sec list)
    from countrymaam_spark.operators.nearest import nearest_polygon
    from countrymaam_spark.operators.overlay import polygon_overlaps
    from countrymaam_spark.operators.pip import point_in_polygon_compact
    from countrymaam_spark.operators.tiles import viewport_join

    timed(
        "pip_join_compact",
        lambda: materialize(point_in_polygon_compact(g, edges, res=6, min_res=3)),
    )
    views = queries.select(
        F.col("query_id").alias("view_id"),
        (F.col("lat") - 1.5).alias("lat_lo"),
        (F.col("lat") + 1.5).alias("lat_hi"),
        (F.col("lon") - 2.0).alias("lon_lo"),
        (F.col("lon") + 2.0).alias("lon_hi"),
    )
    timed("viewport_join", lambda: materialize(viewport_join(g, views, res=6)))
    timed("nearest_region", lambda: materialize(nearest_polygon(queries, edges, k=3)))
    timed("polygon_overlaps", lambda: materialize(polygon_overlaps(edges, res=5)))

    from countrymaam_spark.operators.tiles import tile_domains, tile_top_pages

    timed("tile_domains", lambda: materialize(tile_domains(g, 6)))
    # grid-density hotspot clustering: ONE corpus aggregate, then
    # corpus-independent dense-cell stages (adjacency + star rounds + label
    # join) — min_pts scaled to the fixture so the dense set stays ~10^2
    from countrymaam_spark.operators.cluster import hotspot_stats as _hstats

    # KDE raster + contour vectorization: one corpus cell aggregate, then a
    # constant-fan-out spread and per-level component labeling over the
    # grid-bounded raster; levels scale with the corpus so the percolated
    # low band + concentrated blobs both stay in play at every sf
    from countrymaam_spark.operators.cluster import kde_contours, kde_heatmap

    kde_levels = [max(1, n_pages // 4000), max(2, n_pages // 400), max(4, n_pages // 40)]
    timed("kde_raster", lambda: materialize(kde_heatmap(g, 7, 2)))
    timed(
        "kde_contours",
        lambda: materialize(kde_contours(g, 7, 2, kde_levels)),
    )

    hot_min_pts = max(10, n_pages // 2000)
    timed(
        "geo_hotspots",
        lambda: materialize(_hstats(g, 9, hot_min_pts)),
    )
    # top-k needs the text column: scans the wide pages table (honest cost)
    timed(
        "tile_top_pages",
        lambda: materialize(tile_top_pages(extract_geo(pages), 6, k=3)),
    )

    # host-level crawl curation + gazetteer geocoding (additive webtext
    # stages; both scan the raw pages table — honest wide-scan cost)
    from countrymaam_spark.operators import webtext as WT
    from countrymaam_spark.operators.geotag import geocode_mentions

    timed("host_stats", lambda: materialize(WT.host_stats(pages)))
    timed(
        "geocode_mentions",
        lambda: materialize(geocode_mentions(pages, PG.load_gazetteer(spark, sf_dir))),
    )
    # text x geo: tokenize the wide scan, map-side (tile, token) combine
    from countrymaam_spark.operators.tiles import tile_terms

    timed("tile_terms", lambda: materialize(tile_terms(extract_geo(pages), 5, k=5)))
    # line-level boilerplate dedup over the full pages corpus: global line
    # doc-frequency + gated-broadcast boiler join + per-url re-aggregation
    from countrymaam_spark.operators.lines import page_line_stats

    timed("line_dedup_stats", lambda: materialize(page_line_stats(pages, 10)))
    # the composed crawl -> model-ready-passages pipeline (line clean ->
    # quality gate -> exact dedup -> chunks) as ONE plan over the raw corpus
    from countrymaam_spark.operators.trainset import training_chunks

    timed("training_chunks", lambda: materialize(training_chunks(pages)))

    # retrieval + link-graph additive stages (round 4): BM25 serves straight
    # from raw docs here (index build + serve in one timing — the deployment
    # shape persists the postings and pays only the serve side); PageRank
    # runs 5 exact-integer rounds over the host graph; the two URL stages
    # scan the raw pages table (honest wide-scan cost)
    from countrymaam_spark.operators import linkgraph as LGm
    from countrymaam_spark.operators import search as SEm

    bm25_qs = [
        (0, "hash join fast"),
        (1, "customer order line"),
        (2, "vector scan big table"),
        (3, "stream window watermark"),
        (4, "spark query sort merge join"),
    ]
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs_path):
        docs = spark.read.parquet(docs_path)
        timed(
            "bm25_search",
            lambda: materialize(SEm.bm25_topk(spark, docs, bm25_qs, k=10)),
        )
    timed(
        "host_pagerank",
        lambda: materialize(LGm.pagerank(LGm.host_edges(pages, fanout=3), iters=5)),
    )
    timed(
        "url_canonical_dups",
        lambda: materialize(WT.canonical_dup_groups(pages.select("url"))),
    )

    # cell-index kNN serves from INDEX STATE: the geo snapshot above IS the
    # encoded corpus table (cell col at res 7), and the per-cell count stats
    # are built once here (timed as build work, counted in the pipeline
    # total) — serving never re-encodes or re-aggregates the corpus, the
    # shape a 10^12-row deployment requires
    from countrymaam_spark.operators.knn import build_cell_lut, build_cell_stats

    def _build_stats():
        build_cell_stats(g, 7, cell_col="cell").write.mode("overwrite").parquet(
            os.path.join(geo_dir, "cell_stats")
        )
        # multi-level planning lut: with it, serving's radius planning is a
        # single equi-join against state (no per-batch rollup)
        build_cell_lut(
            spark.read.parquet(os.path.join(geo_dir, "cell_stats")), 7
        ).write.mode("overwrite").parquet(os.path.join(geo_dir, "cell_lut"))

    timed("cell_stats_build", _build_stats)
    if not os.path.exists(os.path.join(geo_dir, "cell_lut")):
        # stage filtered out by SPARK_GRAFT_STAGES but kNN serving still
        # needs its state: build untimed
        _build_stats()
    stats = spark.read.parquet(os.path.join(geo_dir, "cell_lut"))
    timed(
        "knn_cell_index",
        lambda: materialize(
            cell_knn(g, queries, k=10, res=7, cell_col="cell", stats=stats)
        ),
    )

    # metro-concentrated serving over the parent-partitioned layout (the
    # Iceberg partition-spec analog): 500 queries drawn from the densest
    # res-3 parent. Without the directory prune + fan-in spread this batch
    # serializes on the task holding the hot fine cell (measured 52-75 s at
    # sf0.1 with one straggler; ~6-9 s with them — BENCH.md). Snapshot
    # build is untimed (one-time index work, same as the lut fallback).
    from countrymaam_spark.plans.pipeline import (
        build_cell_pipeline,
        load_cell_state,
    )

    if only_set is None or "knn_cell_metro" in only_set:
        part_dir = tempfile.mkdtemp(prefix="cm_cellpart_")
        build_cell_pipeline(
            spark, g, part_dir, res=7, cell_col="cell", partition_parent_res=3
        )
        cells_p, state_p = load_cell_state(spark, part_dir)
        hot_parent = (
            cells_p.groupBy("parent")
            .count()
            .orderBy(F.desc("count"), "parent")
            .first()["parent"]
        )
        metro_rows = (
            cells_p.filter(F.col("parent") == hot_parent)
            .select(F.xxhash64("url").alias("query_id"), "lat", "lon")
            .limit(500)
            .collect()
        )
        metro_q = spark.createDataFrame(
            metro_rows, "query_id long, lat double, lon double"
        )
        timed(
            "knn_cell_metro",
            lambda: materialize(
                cell_knn(
                    cells_p, metro_q, k=10, res=7, cell_col="cell",
                    stats=state_p, partition_parent_res=3,
                )
            ),
        )

    # geo kNN SELF-join: every ~mod-th page is a query against the whole
    # corpus (|Q| grows with the data — the regime where the query side can
    # never broadcast and serving must shuffle; the north rule's batch shape)
    from countrymaam_spark.operators.knn import knn_join

    kj_mod = int(os.environ.get("SPARK_GRAFT_KNN_JOIN_MOD", "500"))
    timed(
        "knn_join",
        lambda: materialize(
            knn_join(g, k=10, res=7, query_mod=kj_mod, cell_col="cell", stats=stats)
        ),
    )

    # index build (tree blobs + lineage) into a throwaway snapshot dir
    import shutil
    import tempfile

    from countrymaam_spark.operators import index_build

    idx_dir = tempfile.mkdtemp(prefix="cm_idx_")
    try:
        def _build_index():
            # group-rows knob: smaller groups = more (parent,salt) blobs =
            # finer serve-side task granularity (the scaling sweep uses 5k;
            # candidate sets and results are identical either way)
            cells = index_build.salt_hot_cells(
                index_build.encode_pages(g.select("url", "lat", "lon"), 7, 4),
                target_group_rows=int(os.environ.get("SPARK_GRAFT_GROUP_ROWS", "20000")),
            )
            trees = index_build.build_tree_blobs(cells, seed=42)
            trees.write.mode("overwrite").parquet(os.path.join(idx_dir, "trees"))

        timed("index_build_trees", _build_index)
        if os.path.exists(os.path.join(idx_dir, "trees")):
            # blob rows are ~MBs each: the default 4096-row columnar read
            # batch would materialize gigabytes per task (heap OOM), and even
            # 64 GC-thrashes at 16 cores; 16 keeps the reader bounded.
            spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16")
            trees = spark.read.parquet(os.path.join(idx_dir, "trees"))
            timed(
                "knn_tree_index",
                lambda: materialize(
                    index_build.knn_tree(trees, queries, k=10, search_k=256, ring=1)
                ),
            )
            spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(geo_dir, ignore_errors=True)

    # Release geo-section session state before the text/embedding sections:
    # the round-4 serving-state stages (cell stats, planning lut, nearest,
    # tile precompute) hold localCheckpoint RDD blocks that are freed only
    # after their Python refs die AND the JVM ContextCleaner runs; left in
    # place they pin executor storage and the dedup shuffle inherits the
    # pressure (measured: 66.5s inside the full run vs 7.9s isolated at
    # sf0.1 — a bench-harness artifact, not an operator property; a real
    # deployment runs these as separate jobs).
    import gc as _gc

    def _release_session_state() -> None:
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    _release_session_state()

    # SPARK_GRAFT_DOCS_N=<n>: synthesize a deterministic n-doc corpus
    # (hash-derived 50-token bodies + a 10-token boilerplate from 32 shared
    # templates, so span dedup sees realistic cross-doc duplication) — the
    # throughput regime for the text-stage scaling runs (the 5k-doc fixture
    # is constants-bound at any core count)
    docs_n = int(os.environ.get("SPARK_GRAFT_DOCS_N", "0"))
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if docs_n or os.path.exists(docs_path):
        if docs_n:
            tpl = F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(32))
            boiler = F.transform(
                F.sequence(F.lit(0), F.lit(9)),
                lambda i: F.concat(
                    F.lit("b"),
                    F.pmod(F.xxhash64(tpl * F.lit(16) + i), F.lit(500)).cast("string"),
                ),
            )
            body = F.transform(
                F.sequence(F.lit(0), F.lit(49)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id") * F.lit(64) + i), F.lit(5000)
                    ).cast("string"),
                ),
            )
            docs = (
                spark.range(docs_n)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat_ws(" ", F.concat(boiler, body)).alias("text"),
                )
                .repartition(spark.sparkContext.defaultParallelism)
                .localCheckpoint(eager=True)
            )
        else:
            docs = spark.read.parquet(docs_path)
        timed("dedup_minhash_lsh", lambda: materialize(dedup.minhash_lsh_pairs(docs, tau=0.8)))
        # span-level dedup: corpus-wide duplicated L-gram coverage (gram
        # groupBy + per-doc window — the substring-dedup scan shape)
        timed("dedup_spans", lambda: materialize(dedup.dup_span_stats(docs, L=8)))

        # BM25 VOLUME serving from prebuilt index state (the production
        # regime: corpus tokenized once at build, queries join the stored
        # postings) — only meaningful on the synthetic volume corpus, so
        # gated on SPARK_GRAFT_DOCS_N; query count via SPARK_GRAFT_BM25_QUERIES
        if docs_n and (only_set is None or "bm25_serve_volume" in only_set):
            post_v = SEm.build_postings(docs).localCheckpoint(eager=True)
            tdf_v = SEm.term_df(post_v).localCheckpoint(eager=True)
            srow_v = SEm.doc_lengths(docs).agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
            ).first()
            n_docs_v, sum_dl_v = int(srow_v[0]), int(srow_v[1] or 0)
            qn = int(os.environ.get("SPARK_GRAFT_BM25_QUERIES", "20000"))
            qdf_v = spark.range(qn).select(
                F.col("id").alias("query_id"),
                F.concat_ws(
                    " ",
                    F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5000)).cast("string")),
                    F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5000)).cast("string")),
                    F.concat(F.lit("b"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500)).cast("string")),
                ).alias("qtext"),
            ).localCheckpoint(eager=True)
            timed(
                "bm25_serve_volume",
                lambda: materialize(
                    SEm.bm25_topk_df(spark, post_v, tdf_v, n_docs_v, sum_dl_v, qdf_v, k=10)
                ),
            )

        # eval-set decontamination at volume: every 1000th synthetic doc
        # poses as the benchmark; the shared boilerplate prefix guarantees
        # template-wide hits, so the per-doc interval-union pass runs at
        # O(corpus) hit rows — the heavy regime
        if docs_n and (only_set is None or "decontam_volume" in only_set):
            from countrymaam_spark.operators.decontam import (
                contamination_stats,
                eval_gram_set,
            )

            # deployment regime (the bm25_serve_volume pattern): benchmarks
            # change rarely, so the eval-gram state is PREBUILT untimed and
            # every corpus batch pays only the gram probe + coverage pass
            evals_v = docs.filter(F.col("doc_id") % 1000 == 0)
            eg_v = eval_gram_set(evals_v, 8, "doc_id").localCheckpoint(eager=True)
            eg_rows = eg_v.count()
            timed(
                "decontam_volume",
                lambda: materialize(
                    contamination_stats(
                        docs, None, L=8, eval_grams=eg_v, eval_grams_rows=eg_rows
                    )
                ),
            )

    # same boundary: the dedup stage's shingle localCheckpoints
    _release_session_state()

    # SPARK_GRAFT_EMB_N=<n>: synthesize a deterministic n x 64 embedding
    # corpus (hash-derived uniform floats, no rand()) instead of the small
    # fixture — the throughput regime for the vector-serving scaling runs
    # (the 2k-row fixture is constants-bound at any core count)
    emb_n = int(os.environ.get("SPARK_GRAFT_EMB_N", "0"))
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if emb_n or os.path.exists(emb_path):
        if emb_n:
            emb = spark.range(emb_n).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda i: (
                        F.pmod(
                            F.xxhash64(F.col("id") * F.lit(64) + i), F.lit(100000)
                        ).cast("double")
                        / 100000.0
                        - 0.5
                    ),
                ).alias("embedding"),
            ).localCheckpoint(eager=True)
        else:
            emb = spark.read.parquet(emb_path)
        eq = emb.filter(F.col("vec_id") < 64).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        timed("embed_knn_l2", lambda: materialize(ann.brute_knn(emb, eq, k=10)))

        # PQ serving from prebuilt state (books + codes built untimed once,
        # the deployment shape): ADC scan + exact re-rank at refine=50
        from countrymaam_spark.operators import pq as PQ

        if only_set is None or "embed_knn_pq" in only_set:
            books = PQ.train_pq(emb, m=8, sample_n=2048, seed=42)
            codes = PQ.pq_codes(emb, books).localCheckpoint(eager=True)
            timed(
                "embed_knn_pq",
                lambda: materialize(
                    PQ.pq_knn_from_state(codes, books, emb, eq, k=10, refine=50)
                ),
            )

    geo_stages = [
        s
        for s in (
            "geotag_cell_encode",
            "pip_join",
            "tile_counts",
            "cell_stats_build",
            "knn_cell_index",
            "index_build_trees",
            "knn_tree_index",
        )
        if s in timings
    ]
    geo_total = sum(timings[s] for s in geo_stages)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "geo_pipeline_sec",
                "value": round(geo_total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_name,
                "pages": n_pages,
                "pages_per_sec": round(n_pages / geo_total, 1) if geo_total else 0.0,
                "total_sec": total,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
