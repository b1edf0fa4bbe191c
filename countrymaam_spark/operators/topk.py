"""Global top-k with dedup — the Spark form of the reference's result
finalizer (/root/reference/countrymaam.go:38-69: drain candidates, dedup by
id, heap-pop ascending, truncate at k).

The heap becomes a ``row_number`` window; dedup becomes ``dropDuplicates``.
Ties are broken deterministically by the id column (SURVEY.md invariant 1 —
the reference's heap is tie-unstable; we are stricter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tie_col: str,
    k: int | Column,
    rank_name: str = "rk",
    dedup: bool = True,
) -> DataFrame:
    """Per-group ascending top-k with deterministic tie-break and id dedup."""
    if dedup:
        df = df.dropDuplicates(group_cols + [tie_col])
    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col).asc(), F.col(tie_col).asc())
    ranked = df.withColumn(rank_name, F.row_number().over(w))
    limit = F.lit(k) if isinstance(k, int) else k
    return ranked.filter(F.col(rank_name) <= limit)
