"""spark-submit entry point for the index-build pipeline.

Cluster usage (the north-rule deployment shape):

    cd /root/repo && zip -r /tmp/countrymaam_spark.zip countrymaam_spark
    spark-submit --py-files /tmp/countrymaam_spark.zip \
        scripts/run_pipeline.py \
        --pages  s3://bucket/pages_iceberg_or_parquet \
        --out    s3://bucket/cm_index \
        --res 7 --parent-res 4 --target-group-rows 200000

Locally (smoke): python scripts/run_pipeline.py --sf sf0.01 --out /tmp/cm_idx

The job is resumable: re-submitting with the same --out skips completed
stages (snapshot + manifest verification in plans/checkpoint.py) — kill it at
any stage boundary and re-run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="path/table of the pages input (parquet)")
    ap.add_argument("--sf", help="fixture sf name to use instead of --pages")
    ap.add_argument(
        "--docs",
        help="optional documents parquet (doc_id, text) — also builds the "
        "BM25 text-index state (postings/df/stats) under the same manifest",
    )
    ap.add_argument(
        "--embeddings",
        help="optional embeddings parquet (vec_id, embedding) — also builds "
        "the IVF, PQ, and NN-Descent graph index states under the same "
        "manifest (reference index factory families, deployed in one submit)",
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=7)
    ap.add_argument("--parent-res", type=int, default=4)
    ap.add_argument("--target-group-rows", type=int, default=200_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from countrymaam_spark.plans.pipeline import (
        build_cell_pipeline,
        build_index_pipeline,
    )
    from countrymaam_spark.session import get_spark
    from countrymaam_spark.sources import pages as PG

    spark = get_spark(master=args.master, app_name="cm_index_build")
    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.sf:
        out = PG.ensure_fixtures(args.sf)
        pages = spark.read.parquet(os.path.join(out, "pages.parquet"))
    else:
        raise SystemExit("one of --pages / --sf is required")

    report = build_index_pipeline(
        spark,
        pages,
        args.out,
        res=args.res,
        parent_res=args.parent_res,
        target_group_rows=args.target_group_rows,
        seed=args.seed,
    )
    # cell-kNN serving state (encoded corpus + per-cell count stats) from
    # the already-snapshotted geo stage — same manifest dir, so a re-submit
    # resumes every stage of both pipelines
    geo_df = spark.read.parquet(os.path.join(args.out, "geo"))
    report.update(build_cell_pipeline(spark, geo_df, args.out, res=args.res))
    if args.docs:
        from countrymaam_spark.plans.pipeline import (
            build_dedup_pipeline,
            build_text_pipeline,
        )

        docs_df = spark.read.parquet(args.docs)
        report.update(build_text_pipeline(spark, docs_df, args.out))
        # curation state in the same submit: sha byte-identity table +
        # shingles + MinHash band index, so later batches dedup against
        # this deployment via append_dedup_pipeline
        report.update(build_dedup_pipeline(spark, docs_df, args.out))
    if args.embeddings:
        from countrymaam_spark.plans.pipeline import (
            build_graph_pipeline,
            build_ivf_pipeline,
            build_lsh_pipeline,
            build_pq_pipeline,
        )

        emb = spark.read.parquet(args.embeddings)
        report.update(build_ivf_pipeline(spark, emb, args.out, seed=args.seed))
        report.update(build_pq_pipeline(spark, emb, args.out, seed=args.seed))
        report.update(build_graph_pipeline(spark, emb, args.out, seed=args.seed))
        report.update(build_lsh_pipeline(spark, emb, args.out, seed=args.seed))
    # refresh the counters metrics table with ALL stages (build_index_pipeline
    # wrote only its own four)
    spark.createDataFrame(
        [(k, v["rows"]) for k, v in report.items()], "stage string, rows long"
    ).write.mode("overwrite").parquet(os.path.join(args.out, "counters"))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
