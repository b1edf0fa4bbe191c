"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing here is real (schemas, batch iteration, partition
behavior); the MEDIA DECODE IS A STUB — this container ships no image/audio
codecs, so ``decode_*`` produce a DETERMINISTIC FAKE sample grid derived from
the payload bytes (sha256-seeded). Swap ``_DECODERS`` entries for
PIL/soundfile/pyav kernels in a real deployment; every downstream operator
(feature extraction, resize, frame sampling, fingerprinting) is
decoder-agnostic.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)
FEATURE_SCHEMA = "asset_id long, kind string, feat array<float>, fp long"
FRAME_SCHEMA = "asset_id long, frame_idx int, frame_fp long"


def synth_assets(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (the fixture for the multimodal path)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + int(rng.integers(0, 4)))
        meta = {
            "width": 64 if kind == "image" else 0,
            "height": 48 if kind == "image" else 0,
            "sample_rate": 16_000 if kind == "audio" else 0,
            "n_frames": 30 if kind == "video" else (1 if kind == "image" else 0),
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: sha-seeded uint8 grid (stands in for a real
    image decoder; see module docstring)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (max(height, 1), max(width, 1)), dtype=np.uint8)


def _fake_samples(payload: bytes, sample_rate: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[8:16], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(max(sample_rate, 1) // 10).astype(np.float32)


_DECODERS = {"image": _fake_pixels, "audio": _fake_samples}


def _ahash(grid: np.ndarray, bits: int = 63) -> int:  # 63 bits: stays in int64
    """Average-hash fingerprint of an 8x8 downsample (real algorithm, fake
    pixels)."""
    h, w = grid.shape
    small = grid[:: max(h // 8, 1), :: max(w // 8, 1)][:8, :8].astype(np.float64)
    bitsarr = (small > small.mean()).flatten()[:bits]
    return int(sum(int(b) << i for i, b in enumerate(bitsarr)))


def extract_features(assets: DataFrame, batch_hint: int = 64) -> DataFrame:
    """binary payloads -> fixed-width feature vectors + 64-bit fingerprints.

    mapInPandas: Arrow-batched, no shuffle (narrow), decoder runs
    per-partition. Feature layout: images -> [mean, std, p25, p75]; audio ->
    [rms, absmax, zero-crossing-rate, len]; video -> per-sampled-frame means.
    """

    def gen(batches):
        for pdf in batches:
            ids, kinds, feats, fps = [], [], [], []
            for aid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                payload = bytes(payload)
                if kind == "image":
                    g = _fake_pixels(payload, meta["width"], meta["height"]).astype(np.float64)
                    feat = [g.mean(), g.std(), float(np.percentile(g, 25)), float(np.percentile(g, 75))]
                    fp = _ahash(g)
                elif kind == "audio":
                    s = _fake_samples(payload, meta["sample_rate"]).astype(np.float64)
                    zcr = float((np.diff(np.sign(s)) != 0).mean()) if len(s) > 1 else 0.0
                    feat = [float(np.sqrt((s**2).mean())), float(np.abs(s).max()), zcr, float(len(s))]
                    fp = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") >> 1
                else:  # video: sample 4 frames, mean intensity each
                    frames = sample_frames_np(payload, int(meta["n_frames"]), 4)
                    feat = [float(f.mean()) for f in frames]
                    fp = _ahash(frames[0]) if frames else 0
                ids.append(int(aid))
                kinds.append(kind)
                feats.append([float(x) for x in feat])
                fps.append(fp)
            yield pd.DataFrame({"asset_id": ids, "kind": kinds, "feat": feats, "fp": fps})

    return assets.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames_np(payload: bytes, n_frames: int, k: int) -> list[np.ndarray]:
    """Evenly-spaced frame sampling (decode stubbed per frame index)."""
    if n_frames <= 0:
        return []
    idx = np.linspace(0, n_frames - 1, min(k, n_frames)).astype(int)
    return [_fake_pixels(payload + bytes([int(i)]), 32, 24) for i in idx]


def sample_video_frames(assets: DataFrame, k: int = 4) -> DataFrame:
    """video assets -> (asset_id, frame_idx, frame_fp) rows."""

    def gen(batches):
        for pdf in batches:
            ids, fidx, fps = [], [], []
            for aid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                n = int(meta["n_frames"])
                frames = sample_frames_np(bytes(payload), n, k)
                for j, fr in enumerate(frames):
                    ids.append(int(aid))
                    fidx.append(j)
                    fps.append(_ahash(fr))
            yield pd.DataFrame({"asset_id": ids, "frame_idx": fidx, "frame_fp": fps})

    return assets.mapInPandas(gen, FRAME_SCHEMA)


ASSET_STATS_SCHEMA = "asset_id long, kind string, n_bytes long, fp long"


def asset_stats(assets: DataFrame) -> DataFrame:
    """Driver-contract entry for the multimodal plumbing: binary payloads +
    typed metadata through a REAL Arrow-batched ``mapInPandas`` kernel,
    emitting per-asset (kind, byte length, 60-bit content fingerprint).

    Unlike the decode-stubbed feature pipeline (numpy-rng fakes, pytest-only
    by necessity), every output here is oracle-computable in SQL: the
    fingerprint is ``int(sha256(hex(payload))[:15 hex], 16)`` — hashing the
    UPPERCASE-hex encoding because DuckDB's ``sha256`` takes VARCHAR, not
    BLOB (``asset_stats_sql`` replicates it bit-for-bit). 60 bits keeps the
    value BIGINT-safe on both engines."""

    def gen(batches):
        for pdf in batches:
            ids, kinds, nb, fps = [], [], [], []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                ids.append(int(aid))
                kinds.append(kind)
                nb.append(len(b))
                fps.append(
                    int(hashlib.sha256(b.hex().upper().encode()).hexdigest()[:15], 16)
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "n_bytes": nb, "fp": fps}
            )

    return assets.mapInPandas(gen, ASSET_STATS_SCHEMA)


def _fp_sql(payload: str) -> str:
    return f"('0x' || substr(sha256(hex({payload})), 1, 15))::BIGINT"


def asset_stats_sql(assets_rel: str) -> str:
    return f"""
        SELECT asset_id, kind, CAST(octet_length(payload) AS BIGINT) AS n_bytes,
               {_fp_sql('payload')} AS fp
        FROM {assets_rel}
    """


def near_dup_assets_sql(assets_rel: str, max_hamming: int = 3) -> str:
    """Brute-force oracle for ``near_dup_assets`` over ``asset_stats``
    fingerprints (the banding is complete for hamming <= 3, pigeonhole, and
    the exact verify removes false positives — so brute force applies)."""
    return f"""
        WITH s AS (SELECT asset_id, {_fp_sql('payload')} AS fp FROM {assets_rel})
        SELECT a.asset_id AS id_a, b.asset_id AS id_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
        FROM s a JOIN s b ON a.asset_id < b.asset_id
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


def near_dup_assets(features: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Fingerprint near-dup pairs over the feature table (SimHash banding:
    4 x 16-bit blocks). Pigeonhole guarantees a shared block only for
    hamming <= 3, so that is the default/maximum complete threshold; callers
    passing max_hamming > 3 get a candidate-recall warning via ValueError."""
    if max_hamming > 3:
        raise ValueError(
            "4-block banding is only complete for max_hamming <= 3; "
            "raise the block count for larger radii"
        )
    blocks = features.select(
        F.col("asset_id").alias("aid"),
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("fp"), 16 * i).bitwiseAND(F.lit(65535)).alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("aid", "fp", F.col("b.blk").alias("blk"), F.col("b.bv").alias("bv"))
    a = blocks.select(F.col("aid").alias("id_a"), F.col("fp").alias("fa"), "blk", "bv")
    b = blocks.select(F.col("aid").alias("id_b"), F.col("fp").alias("fb"), "blk", "bv")
    return (
        a.join(b, ["blk", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
