"""Feature-corpus sources in the reference's own input formats.

The reference CLI trains from a stream of little-endian ``dtype`` values,
``dim`` per row (/root/reference/cmd/countrymaam/main.go:107-119,164-215),
and its test corpora live as comma-separated floats
(/root/reference/graph/vec.csv, loaded 128 per row in
graph/nndescent_test.go:250-282). A user switching from the reference can
point these loaders at the same files and get the engine's standard
embeddings shape ``(vec_id long, embedding array<double>)``.

Distribution model: Spark's ``binaryFile`` source yields one row per file,
so a sharded corpus (one binary shard per file — how any cluster-sized
corpus already arrives) decodes in parallel, one Arrow task per shard.
Row ids are ``shard_base + offset`` with shard bases assigned from the
(tiny, collected) per-file row counts — stable ids independent of task
scheduling, mirroring SURVEY §1.3's "never a physical row position" rule.
A single monolithic file still works (one decode task) — exactly the
reference's single-process reality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {"float32": np.float32, "float64": np.float64, "uint8": np.uint8}
EMB_SCHEMA = "vec_id long, embedding array<double>"


def load_binary_features(
    spark: SparkSession,
    path: str,
    dim: int,
    dtype: str = "float32",
) -> DataFrame:
    """Little-endian packed rows (the reference train format) -> embeddings.

    ``path`` may be a file or a directory/glob of shards. Values decode as
    ``dtype`` (the reference CLI's {float32, uint8} plus float64) and widen
    to double — the engine's single float path (SURVEY §2.1 #30; re-packing
    for the u8 kernels goes through ann.quantize_u8).
    """
    np_dt = np.dtype(_DTYPES[dtype]).newbyteorder("<")
    row_bytes = np_dt.itemsize * dim
    files = spark.read.format("binaryFile").load(path).select("path", "length", "content")
    # shard bases from the tiny per-file listing (driver-side; #files rows)
    sizes = {
        r["path"]: int(r["length"]) for r in files.select("path", "length").collect()
    }
    for p, n_bytes in sizes.items():
        if n_bytes % row_bytes:
            raise ValueError(
                f"{p}: {n_bytes} bytes is not a multiple of row size {row_bytes}"
            )
    bases, acc = {}, 0
    for p in sorted(sizes):
        bases[p] = acc
        acc += sizes[p] // row_bytes
    bases_df = F.broadcast(
        spark.createDataFrame(list(bases.items()), "path string, base long")
    )

    def decode(batches):
        for pdf in batches:
            for path_v, base, content in zip(pdf["path"], pdf["base"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np_dt).astype(np.float64)
                rows = arr.reshape(-1, dim)
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(len(rows), dtype=np.int64) + int(base),
                        "embedding": list(rows),
                    }
                )

    return (
        files.join(bases_df, "path")
        .select("path", "base", "content")
        .mapInPandas(decode, EMB_SCHEMA)
    )


def write_binary_features(arr: np.ndarray, path: str, dtype: str = "float32") -> None:
    """Test/export helper: pack (n, dim) rows little-endian, reference format."""
    np_dt = np.dtype(_DTYPES[dtype]).newbyteorder("<")
    with open(path, "wb") as f:
        f.write(np.ascontiguousarray(arr, dtype=np_dt).tobytes())


def load_csv_vectors(spark: SparkSession, path: str, dim: int) -> DataFrame:
    """Reference-style CSV vector corpus (graph/vec.csv: comma-separated
    floats, ``dim`` per row; values may wrap across physical lines) ->
    embeddings. The whole file is one logical stream, as the reference's
    test loader reads it — decoded per file like the binary source."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    # per-file row counts via a distributed pass (value count / dim); the
    # collected result is #files rows
    cnt_rows = files.select(
        "path",
        (
            F.size(
                F.filter(
                    F.split(F.replace(F.decode(F.col("content"), "utf-8"), F.lit("\n"), F.lit(",")), ","),
                    lambda t: F.trim(t) != "",
                )
            )
            / dim
        ).alias("rows"),
    ).collect()
    counts = {}
    for r in cnt_rows:
        if float(r["rows"]) != int(r["rows"]):
            raise ValueError(f"{r['path']}: value count not a multiple of dim {dim}")
        counts[r["path"]] = int(r["rows"])
    base_of, acc = {}, 0
    for p in sorted(counts):
        base_of[p] = acc
        acc += counts[p]
    bases_df = F.broadcast(
        spark.createDataFrame(list(base_of.items()), "path string, base long")
    )

    def decode(batches):
        for pdf in batches:
            for path_v, base, content in zip(pdf["path"], pdf["base"], pdf["content"]):
                text = bytes(content).decode("utf-8").replace("\n", ",")
                vals = np.array(
                    [float(t) for t in text.split(",") if t.strip()], dtype=np.float64
                )
                rows = vals.reshape(-1, dim)
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(len(rows), dtype=np.int64) + int(base),
                        "embedding": list(rows),
                    }
                )

    return (
        files.join(bases_df, "path")
        .select("path", "base", "content")
        .mapInPandas(decode, EMB_SCHEMA)
    )
