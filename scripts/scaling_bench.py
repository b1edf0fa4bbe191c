"""Scaling-efficiency evidence (north rule): run the identical workload at
two parallelism levels (local[8] vs local[32] — the sandbox stand-in for N vs
4N executors) and report per-stage throughput plus efficiency
(T_low / T_high) / (cpus_high / cpus_low).

Writes the results table into BENCH_SCALING.md (BENCH.md is the curated,
hand-annotated record — never overwritten by automation).

Usage: python scripts/scaling_bench.py [low_cpus] [high_cpus] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))


def run_once(cpus: int, sf_dir: str) -> dict:
    # SPARK_GRAFT_WARM: each stage runs twice in-process, the second is
    # timed — steady-state numbers (JIT/GC/page-cache warm), the regime a
    # long-lived cluster job runs in and the one where the two-cluster-size
    # comparison is meaningful (cold per-stage constants otherwise dominate
    # the small end).
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_WARM="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run(cpus: int, sf_dir: str) -> dict:
    """Repeat and take the per-stage MIN — the box is noisy (virtio disk,
    co-tenants); min is the standard de-noised estimate of achievable time."""
    runs = [run_once(cpus, sf_dir) for _ in range(REPEATS)]
    best = dict(runs[0])
    best["queries"] = {
        q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
    }
    geo_stages = [q for q in best["queries"] if q not in ("dedup_minhash_lsh", "embed_knn_l2")]
    best["value"] = round(sum(best["queries"][q] for q in geo_stages), 3)
    best["pages_per_sec"] = round(best["pages"] / best["value"], 1)
    return best


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    r_low = run(low, sf_dir)
    r_high = run(high, sf_dir)
    ratio = high / low

    rows = []
    for q in r_high["queries"]:
        t_l, t_h = r_low["queries"][q], r_high["queries"][q]
        eff = (t_l / t_h) / ratio if t_h > 0 else float("nan")
        rows.append((q, t_l, t_h, eff))
    tot_l = sum(r_low["queries"].values())
    tot_h = sum(r_high["queries"].values())
    overall = (tot_l / tot_h) / ratio
    geo_l, geo_h = r_low["value"], r_high["value"]
    geo_eff = (geo_l / geo_h) / ratio

    lines = [
        "",
        "## Measured scaling (same input, two parallelism levels)",
        "",
        f"Input: `{sf_dir}` ({r_high['pages']} pages). Two cluster sizes are",
        f"stood in by `local[{low}]` vs `local[{high}]` per the driver",
        "instruction; efficiency = (T_low / T_high) / "
        f"({high}/{low}).",
        "",
        f"| stage | local[{low}] sec | local[{high}] sec | efficiency |",
        "|---|---|---|---|",
    ]
    for q, t_l, t_h, eff in rows:
        lines.append(f"| {q} | {t_l:.2f} | {t_h:.2f} | {eff:.2f} |")
    lines += [
        f"| **geo pipeline** | {geo_l:.2f} | {geo_h:.2f} | **{geo_eff:.2f}** |",
        f"| **total suite** | {tot_l:.2f} | {tot_h:.2f} | **{overall:.2f}** |",
        "",
        f"Throughput: {r_low['pages_per_sec']} pages/s at {low} cores, "
        f"{r_high['pages_per_sec']} pages/s at {high} cores.",
        "",
    ]
    stages_env = os.environ.get("SPARK_GRAFT_STAGES", "(all)")
    nq = os.environ.get("SPARK_GRAFT_KNN_QUERIES", "200 (fixture)")
    lines += [
        f"Config: stages={stages_env}; knn queries={nq}; "
        f"warm={os.environ.get('SPARK_GRAFT_WARM', '0')}; repeats={REPEATS} (min).",
        "",
        "kNN SERVING scaling is a query-volume question, not a core-count",
        "one — at the 200-query fixture the driver-round/blob constants",
        "dominate both arms. The serving sweeps (20k queries: cell 0.84,",
        "tree 0.81 at sf10) and the core-pinned trio live in BENCH.md.",
        "",
    ]
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write("# BENCH_SCALING — raw two-parallelism run (see BENCH.md for the curated record)\n" + report)


if __name__ == "__main__":
    main()
