"""Interleaved multi-pair N-vs-4N scaling measurement (round-3 verdict #4).

Single pairs cannot resolve the scaling ratio on this box: identical numpy
kernels drift 2-8x across hours (scripts/membw_bench.py), so round 3's
single confirmation pairs swung 0.62-0.84 on UNCHANGED plans. Protocol:
alternate taskset-pinned small/large arms back-to-back in one session
(>= 3 pairs), then report

- the per-pair efficiency sequence (the drift band the box imposes), and
- the min-of-arms efficiency: min time per arm size across its runs — the
  standard de-noised estimate of achievable time, comparing the two arm
  sizes at their least-interfered moments.

Arms are pinned with ``taskset -c`` so each really uses N hardware cores
(unpinned local[N] leaks Python UDF workers onto idle cores and flatters
the small arm — see BENCH.md "Core-pinned measurement").

Usage: python scripts/interleaved_scaling.py [pairs] [low] [high] [sf_dir]
Env passthrough: SPARK_GRAFT_STAGES / _KNN_QUERIES / _GROUP_ROWS / _WARM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_WARM=os.environ.get("SPARK_GRAFT_WARM", "1"),
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"arm cpus={cpus} produced no JSON:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else os.path.join(REPO, "fixtures", "sf10")
    ratio = high / low

    arms: dict[int, list[dict]] = {low: [], high: []}
    seq = []
    for i in range(pairs):
        for cpus in (low, high):
            r = run_arm(cpus, sf_dir)
            arms[cpus].append(r)
            print(f"pair {i} cpus={cpus}: {r['queries']}", flush=True)
        t_l = sum(arms[low][-1]["queries"].values())
        t_h = sum(arms[high][-1]["queries"].values())
        seq.append((t_l / t_h) / ratio)
        print(f"pair {i} efficiency: {seq[-1]:.2f}", flush=True)

    stages = list(arms[high][0]["queries"])
    lines = [
        "",
        f"## Interleaved multi-pair scaling ({pairs} alternating pinned pairs, "
        f"{low} vs {high} cores)",
        "",
        f"Input: `{sf_dir}`"
        + (
            f" (+ synthetic docs n={os.environ['SPARK_GRAFT_DOCS_N']})"
            if os.environ.get("SPARK_GRAFT_DOCS_N")
            else ""
        )
        + (
            f" (+ synthetic embeddings n={os.environ['SPARK_GRAFT_EMB_N']})"
            if os.environ.get("SPARK_GRAFT_EMB_N")
            else ""
        )
        + "; stages: "
        f"{os.environ.get('SPARK_GRAFT_STAGES', '(all)')}; warm; taskset-pinned.",
        "",
        f"| stage | min@{low} sec | min@{high} sec | min-of-arms eff | "
        f"per-pair eff |",
        "|---|---|---|---|---|",
    ]
    for st in stages:
        ls = [a["queries"][st] for a in arms[low]]
        hs = [a["queries"][st] for a in arms[high]]
        effs = [(l / h) / ratio for l, h in zip(ls, hs)]
        eff_min = (min(ls) / min(hs)) / ratio
        lines.append(
            f"| {st} | {min(ls):.2f} | {min(hs):.2f} | **{eff_min:.2f}** | "
            f"{', '.join(f'{e:.2f}' for e in effs)} |"
        )
    tot_l = [sum(a["queries"].values()) for a in arms[low]]
    tot_h = [sum(a["queries"].values()) for a in arms[high]]
    lines.append(
        f"| **total** | {min(tot_l):.2f} | {min(tot_h):.2f} | "
        f"**{(min(tot_l) / min(tot_h)) / ratio:.2f}** | "
        f"{', '.join(f'{e:.2f}' for e in seq)} |"
    )
    lines += [
        "",
        f"Per-pair total-efficiency band: "
        f"{min(seq):.2f} - {max(seq):.2f} (drift the box imposes on a single "
        "pair); min-of-arms is the de-noised estimate.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
