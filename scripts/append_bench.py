"""Append-vs-rebuild cost: the point of incremental index maintenance.

For each stateful index family, compare a FULL rebuild over n+delta vectors
against appending delta to a built state of n. Two signals:

- **pairs/rows through the kernel** — hardware-independent; the quantity
  that scales to 100 TB (this box's wall times drift 2-8x same-kernel,
  see BENCH.md "identical-code drift triple").
- wall seconds, interleaved arms (rebuild/append alternated in ONE session,
  min per arm) as the secondary signal.

Deterministic seeded synthetic vectors (no external data).

Usage: python scripts/append_bench.py [n] [delta] [dim] [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def make_vecs(spark, n: int, dim: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    # clustered (realistic for embeddings): 32 seeded centers + noise
    centers = rng.normal(size=(32, dim))
    lbl = rng.integers(0, 32, size=n)
    arr = centers[lbl] + 0.25 * rng.normal(size=(n, dim))
    pdf = [(int(i), [float(x) for x in arr[i]]) for i in range(n)]
    return spark.createDataFrame(pdf, "vec_id long, embedding array<float>").repartition(
        spark.sparkContext.defaultParallelism
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    delta = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from countrymaam_spark.operators import graph as G
    from countrymaam_spark.plans import pipeline as PL
    from countrymaam_spark.session import get_spark

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    vecs = make_vecs(spark, n + delta, dim).localCheckpoint(eager=True)
    old = vecs.filter(F.col("vec_id") < n).localCheckpoint(eager=True)
    new_ids = vecs.filter(F.col("vec_id") >= n).select("vec_id")
    print(f"n={n} delta={delta} dim={dim} reps={reps}")

    # --- graph family: converged base built once (untimed), then
    # rebuild/append arms interleaved ---
    base = G.nn_descent(old, k=10, rho=0.7, max_iter=12, seed=42).localCheckpoint(
        eager=True
    )
    t_reb, t_app = [], []
    s_reb: dict = {}
    s_app: dict = {}
    for _ in range(reps):
        s_reb = {}
        t0 = time.monotonic()
        G.nn_descent(vecs, k=10, rho=0.7, max_iter=12, seed=42, stats=s_reb).count()
        t_reb.append(time.monotonic() - t0)
        s_app = {}
        t0 = time.monotonic()
        G.nn_descent_append(
            vecs, base, new_ids, k=10, rho=0.7, max_iter=8, seed=43, stats=s_app
        ).count()
        t_app.append(time.monotonic() - t0)
    print(
        f"graph: rebuild pairs_scored={s_reb['pairs_scored']:,} "
        f"({s_reb['rounds']} rounds) vs append pairs_scored={s_app['pairs_scored']:,} "
        f"({s_app['rounds']} rounds) -> {s_reb['pairs_scored'] / s_app['pairs_scored']:.1f}x fewer pairs; "
        f"wall min {min(t_reb):.1f}s vs {min(t_app):.1f}s ({min(t_reb) / min(t_app):.2f}x)"
    )

    # --- ivf family: rows through the assignment kernel are n+delta vs
    # delta BY CONSTRUCTION; k-means (sample_n rows, iters passes) is
    # skipped entirely on append. Interleave wall arms over the pipelines.
    t_reb, t_app = [], []
    for _ in range(reps):
        with tempfile.TemporaryDirectory() as d2:
            t0 = time.monotonic()
            PL.build_ivf_pipeline(spark, vecs, os.path.join(d2, "ivf"), n_lists=64, seed=1)
            t_reb.append(time.monotonic() - t0)
        with tempfile.TemporaryDirectory() as d:
            out = os.path.join(d, "ivf")
            PL.build_ivf_pipeline(spark, old, out, n_lists=64, seed=1)
            t0 = time.monotonic()
            PL.append_ivf_pipeline(spark, vecs.filter(F.col("vec_id") >= n), out)
            t_app.append(time.monotonic() - t0)
    print(
        f"ivf: rows assigned {n + delta:,} + kmeans vs {delta:,}, no kmeans "
        f"({(n + delta) / delta:.0f}x fewer rows); "
        f"wall min {min(t_reb):.1f}s vs {min(t_app):.1f}s ({min(t_reb) / min(t_app):.2f}x)"
    )

    # --- cell stats/lut (geo): rows through encode+rollup are n+delta vs
    # delta by construction; merge join is |cells| rows. ---
    from countrymaam_spark.operators import knn as K

    rng = np.random.default_rng(11)
    geo = spark.createDataFrame(
        [
            (f"u{i}", float(la), float(lo))
            for i, (la, lo) in enumerate(
                zip(rng.uniform(-60, 60, n + delta), rng.uniform(-180, 180, n + delta))
            )
        ],
        "url string, lat double, lon double",
    ).localCheckpoint(eager=True)
    g_old = geo.limit(n).localCheckpoint(eager=True)
    g_new = geo.subtract(g_old).localCheckpoint(eager=True)
    lut = K.build_cell_lut(K.build_cell_stats(g_old, 7), 7).localCheckpoint(eager=True)
    t_reb, t_app = [], []
    for _ in range(reps):
        t0 = time.monotonic()
        K.build_cell_lut(K.build_cell_stats(geo, 7), 7).count()
        t_reb.append(time.monotonic() - t0)
        t0 = time.monotonic()
        K.update_cell_lut(lut, g_new, 7).count()
        t_app.append(time.monotonic() - t0)
    print(
        f"cell lut: rows encoded {n + delta:,} vs {delta:,} "
        f"({(n + delta) / delta:.0f}x fewer rows); "
        f"wall min {min(t_reb):.1f}s vs {min(t_app):.1f}s ({min(t_reb) / min(t_app):.2f}x)"
    )


if __name__ == "__main__":
    main()
