"""Round-6 optimization harness (bench.py stays FROZEN for the driver).

Per-stage isolation per the optimization guide §1.4: each stage is timed
alone through the noop sink, with repeats, on the same state bench.py builds
(geo parquet snapshot, cell stats/lut, parent-partitioned corpus, tree
blobs). Adds what bench.py cannot: per-phase timings from cell_knn's
``timings`` dict, and ``.explain("formatted")`` capture into plans/r06/.

Usage:
  python bench_extra.py --stages knn_cell_index,knn_cell_metro --repeats 3
  python bench_extra.py --stages knn_cell_index --explain plans/r06/knn_cell_index_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from countrymaam_spark.functions import geo as G
from countrymaam_spark.operators.geotag import extract_geo
from countrymaam_spark.session import get_spark
from countrymaam_spark.sources import pages as PG


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", required=True)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write .explain(formatted) of the (single) stage here")
    ap.add_argument("--phases", action="store_true",
                    help="print cell_knn phase timings where supported")
    args = ap.parse_args()
    stages = args.stages.split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = PG.sf_name_from_dir(sf_dir)
    PG.ensure_fixtures(sf_name)
    pages_bytes = os.path.getsize(
        os.path.join(PG.fixture_dir(sf_name), "pages.parquet")
    )
    split_bytes = min(max(pages_bytes // (cpus * 4), 4 << 20), 128 << 20)
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="countrymaam_spark_bench_extra",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus)),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "12g"),
            "spark.sql.files.maxPartitionBytes": str(split_bytes),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    pages = PG.load_pages(spark, sf_dir)
    n_pages = pages.count()

    def _geo(df):
        return (
            extract_geo(df)
            .select("url", "lat", "lon")
            .withColumn("cell", G.encode_cell(F.col("lat"), F.col("lon"), 7))
        )

    materialize(_geo(pages.limit(20_000)))

    import tempfile

    geo_dir = tempfile.mkdtemp(prefix="cm_geo_x_")
    g_src = _geo(pages)
    g_src.write.mode("overwrite").parquet(os.path.join(geo_dir, "geo"))
    g = spark.read.parquet(os.path.join(geo_dir, "geo"))
    queries = PG.load_knn_queries(spark, sf_dir)

    from countrymaam_spark.operators.knn import (
        build_cell_lut,
        build_cell_stats,
        cell_knn,
        knn_join,
    )

    need_cell_state = {"knn_cell_index", "knn_cell_metro", "knn_join"} & set(stages)
    stats = None
    if need_cell_state:
        build_cell_stats(g, 7, cell_col="cell").write.mode("overwrite").parquet(
            os.path.join(geo_dir, "cell_stats")
        )
        build_cell_lut(
            spark.read.parquet(os.path.join(geo_dir, "cell_stats")), 7
        ).write.mode("overwrite").parquet(os.path.join(geo_dir, "cell_lut"))
        stats = spark.read.parquet(os.path.join(geo_dir, "cell_lut"))

    cells_p = state_p = metro_q = None
    if "knn_cell_metro" in stages:
        from countrymaam_spark.plans.pipeline import (
            build_cell_pipeline,
            load_cell_state,
        )

        part_dir = tempfile.mkdtemp(prefix="cm_cellpart_x_")
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

    trees = None
    if "knn_tree_index" in stages or "index_build_trees" in stages:
        import shutil

        from countrymaam_spark.operators import index_build

        idx_dir = tempfile.mkdtemp(prefix="cm_idx_x_")
        cells = index_build.salt_hot_cells(
            index_build.encode_pages(g.select("url", "lat", "lon"), 7, 4),
            target_group_rows=int(os.environ.get("SPARK_GRAFT_GROUP_ROWS", "20000")),
        )
        index_build.build_tree_blobs(cells, seed=42).write.mode(
            "overwrite"
        ).parquet(os.path.join(idx_dir, "trees"))
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16")
        trees = spark.read.parquet(os.path.join(idx_dir, "trees"))

    kde_levels = [max(1, n_pages // 4000), max(2, n_pages // 400), max(4, n_pages // 40)]
    hot_min_pts = max(10, n_pages // 2000)
    bm25_qs = [
        (0, "hash join fast"),
        (1, "customer order line"),
        (2, "vector scan big table"),
        (3, "stream window watermark"),
        (4, "spark query sort merge join"),
    ]
    docs_path = os.path.join(sf_dir, "documents.parquet")
    docs = spark.read.parquet(docs_path) if os.path.exists(docs_path) else None
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = spark.read.parquet(emb_path) if os.path.exists(emb_path) else None
    eq = (
        emb.filter(F.col("vec_id") < 64).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        if emb is not None
        else None
    )

    def stage_df(name: str, timings: dict | None = None):
        if name == "knn_cell_index":
            return cell_knn(
                g, queries, k=10, res=7, cell_col="cell", stats=stats,
                timings=timings,
            )
        if name == "knn_cell_metro":
            return cell_knn(
                cells_p, metro_q, k=10, res=7, cell_col="cell",
                stats=state_p, partition_parent_res=3, timings=timings,
            )
        if name == "knn_join":
            kj_mod = int(os.environ.get("SPARK_GRAFT_KNN_JOIN_MOD", "500"))
            return knn_join(
                g, k=10, res=7, query_mod=kj_mod, cell_col="cell", stats=stats
            )
        if name == "knn_tree_index":
            from countrymaam_spark.operators import index_build

            return index_build.knn_tree(trees, queries, k=10, search_k=256, ring=1)
        if name == "tile_terms":
            from countrymaam_spark.operators.tiles import tile_terms

            return tile_terms(extract_geo(pages), 5, k=5)
        if name == "tile_top_pages":
            from countrymaam_spark.operators.tiles import tile_top_pages

            return tile_top_pages(extract_geo(pages), 6, k=3)
        if name == "training_chunks":
            from countrymaam_spark.operators.trainset import training_chunks

            return training_chunks(pages)
        if name == "line_dedup_stats":
            from countrymaam_spark.operators.lines import page_line_stats

            return page_line_stats(pages, 10)
        if name == "bm25_search":
            from countrymaam_spark.operators import search as SEm

            return SEm.bm25_topk(spark, docs, bm25_qs, k=10)
        if name == "host_pagerank":
            from countrymaam_spark.operators import linkgraph as LGm

            return LGm.pagerank(LGm.host_edges(pages, fanout=3), iters=5)
        if name == "url_canonical_dups":
            from countrymaam_spark.operators import webtext as WT

            return WT.canonical_dup_groups(pages.select("url"))
        if name == "nearest_region":
            from countrymaam_spark.operators.nearest import nearest_polygon

            edges = PG.load_polygon_edges(spark, sf_dir)
            return nearest_polygon(queries, edges, k=3)
        if name == "pip_join":
            from countrymaam_spark.operators.pip import point_in_polygon

            edges = PG.load_polygon_edges(spark, sf_dir)
            return point_in_polygon(g, edges, res=6)
        if name == "pip_join_compact":
            from countrymaam_spark.operators.pip import point_in_polygon_compact

            edges = PG.load_polygon_edges(spark, sf_dir)
            return point_in_polygon_compact(g, edges, res=6, min_res=3)
        if name == "polygon_overlaps":
            from countrymaam_spark.operators.overlay import polygon_overlaps

            edges = PG.load_polygon_edges(spark, sf_dir)
            return polygon_overlaps(edges, res=5)
        if name == "geotag_cell_encode":
            return _geo(pages)
        if name == "dedup_minhash_lsh":
            from countrymaam_spark.operators import dedup

            return dedup.minhash_lsh_pairs(docs, tau=0.8)
        if name == "dedup_spans":
            from countrymaam_spark.operators import dedup

            return dedup.dup_span_stats(docs, L=8)
        if name == "kde_contours":
            from countrymaam_spark.operators.cluster import kde_contours

            return kde_contours(g, 7, 2, kde_levels)
        if name == "geo_hotspots":
            from countrymaam_spark.operators.cluster import hotspot_stats

            return hotspot_stats(g, 9, hot_min_pts)
        if name == "embed_knn_l2":
            from countrymaam_spark.operators import ann

            return ann.brute_knn(emb, eq, k=10)
        if name == "embed_knn_pq":
            from countrymaam_spark.operators import pq as PQ

            books = PQ.train_pq(emb, m=8, sample_n=2048, seed=42)
            codes = PQ.pq_codes(emb, books).localCheckpoint(eager=True)
            return PQ.pq_knn_from_state(codes, books, emb, eq, k=10, refine=50)
        raise SystemExit(f"unknown stage {name}")

    if args.explain:
        assert len(stages) == 1
        df = stage_df(stages[0])
        os.makedirs(os.path.dirname(args.explain), exist_ok=True)
        with open(args.explain, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        print(f"wrote {args.explain}")
        spark.stop()
        return

    out: dict[str, list[float]] = {}
    phase_out: dict[str, dict] = {}
    for name in stages:
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            timings: dict | None = {} if args.phases else None
            t0 = time.time()
            materialize(stage_df(name, timings))
            samples.append(round(time.time() - t0, 3))
            if args.phases and timings:
                phase_out[f"{name}#{i}"] = {
                    k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in timings.items()
                }
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
    print(json.dumps({"samples": out, "min": {k: min(v) for k, v in out.items()},
                      "phases": phase_out, "sf": sf_name, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
