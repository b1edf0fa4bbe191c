"""Vector distance expressions over array<float> embedding columns.

Column-expression kernels (``aggregate``/``zip_with`` -> whole-stage codegen)
for the small/medium dims in the fixtures; these are the Spark analog of the
reference's SqL2/Dot kernels (/root/reference/linalg/linalg.go:95-112 and the
AVX2 variants linalg/linalg.go:55-91 — here SIMD is Catalyst codegen, or numpy
inside Arrow UDFs on the ANN scale path in operators/ann.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 — the reference's metric (linalg.SqL2)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sq_l2_batch(a: Column, b: Column) -> Column:
    """Squared L2 as a vectorized pandas UDF (Arrow batches -> one numpy
    subtraction per batch). Use on the high-volume paths (NN-Descent pair
    scoring) where the interpreted higher-order-function expression above
    becomes the bottleneck; numerically identical up to fp association."""

    @F.pandas_udf("double")
    def _sq(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="float64")
        xa = np.array([np.asarray(v, dtype=np.float64) for v in x])
        ya = np.array([np.asarray(v, dtype=np.float64) for v in y])
        return pd.Series(((xa - ya) ** 2).sum(axis=1))

    return _sq(a, b)


def sq_l2_sql(a: str, b: str) -> str:
    """DuckDB equivalent (list_distance is L2, so square it)."""
    return f"POW(list_distance({a}, {b}), 2)"


def cosine_sim_sql(a: str, b: str) -> str:
    return f"list_cosine_similarity({a}, {b})"
