"""Deterministic synthetic Common-Crawl-style pages fixtures (seed=42).

The BASELINE.json ``input_hint`` table shape:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Place mentions are planted in ``text`` as ``near {city} ({lat:.5f}, {lon:.5f})``;
the engine geotags by extracting them (operators/geotag.py) and the per-url
``text`` must stay byte-identical through every stage (sha256 invariant).

Geo distribution: 50 city centers with Zipf(1.1)-weighted popularity
(hot H3-analog cells -> exercises the salting path, SURVEY.md §7 hard part a)
plus a 20% uniform background. Generated with numpy only (no Spark) so the
bytes are independent of partitioning; single-file parquet via pyarrow.

Fixtures land in ``/root/repo/fixtures/{sfname}/`` and are generated lazily;
oracle SQL references them by absolute path (DuckDB reads the same files).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_CITIES = 50
N_SITES = 997
FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures")

SF_ROWS = {
    "sf0.001": 2_000,
    "sf0.01": 20_000,
    "sf0.1": 200_000,
    "sf1": 2_000_000,
    "sf10": 20_000_000,
    # scaling-evidence scale: large enough that the short spatial stages'
    # fixed per-stage costs amortize (see BENCH.md fixed-cost fit)
    "sf30": 60_000_000,
}

_FILLERS = [
    "The quick brown fox jumps over the lazy dog.",
    "Weather reports and travel notes follow below.",
    "An archive of community posts and reviews.",
    "Historical records digitized from public sources.",
    "Local news and announcements for the region.",
    "A directory of shops, parks, and museums.",
    "Notes from a long bicycle journey across the country.",
    "Observations collected by volunteer surveyors.",
]

_LANGS = ["en", "de", "fr", "ja", "pt"]
_LANG_P = [0.55, 0.15, 0.12, 0.08, 0.10]


def city_table(n_cities: int = N_CITIES) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Deterministic city centers (lat, lon, name). Zipf popularity is applied
    by the page generator, not here."""
    rng = np.random.default_rng(SEED)
    lat = rng.uniform(-60.0, 70.0, n_cities)
    lon = rng.uniform(-179.0, 179.0, n_cities)
    names = [f"city{i:02d}" for i in range(n_cities)]
    return lat, lon, names


CHUNK = 2_000_000
# parquet row groups are Spark's minimum split granularity: 1M-row groups cap
# a 20M-row file at 20 read tasks (measured eff 0.4 at 4->16 cores). ~128k-row
# groups (~12 MB here) give the scheduler fine-grained, balanced splits.
ROW_GROUP_ROWS = 131_072


def gen_pages(n: int) -> pa.Table:
    return _gen_pages_chunk(n, 0)


def _gen_pages_chunk(n: int, offset: int) -> pa.Table:
    """Deterministic chunk: rows [offset, offset+n) with an rng stream seeded
    by the chunk index (big fixtures stream chunk-by-chunk to bound memory)."""
    rng = np.random.default_rng(SEED + 1 + offset // CHUNK)
    clat, clon, cnames = city_table()
    zipf_w = 1.0 / np.arange(1, N_CITIES + 1) ** 1.1
    zipf_w /= zipf_w.sum()

    is_city = rng.random(n) < 0.8
    city_idx = rng.choice(N_CITIES, size=n, p=zipf_w)
    lat = np.where(
        is_city,
        clat[city_idx] + rng.normal(0.0, 0.05, n),
        rng.uniform(-84.0, 84.0, n),
    )
    lon = np.where(
        is_city,
        clon[city_idx] + rng.normal(0.0, 0.05, n),
        rng.uniform(-180.0, 180.0, n),
    )
    lat = np.clip(lat, -84.9, 84.9)
    lon = ((lon + 180.0) % 360.0) - 180.0
    # quantize to the 5-dp precision that is actually embedded in text, so the
    # parsed value is the ground truth bit-for-bit
    lat = np.round(lat, 5)
    lon = np.round(lon, 5)

    city_for_text = np.where(is_city, city_idx, rng.choice(N_CITIES, size=n))
    filler_a = rng.integers(0, len(_FILLERS), n)
    filler_b = rng.integers(0, len(_FILLERS), n)
    year = rng.integers(1998, 2025, n)
    lang = rng.choice(_LANGS, size=n, p=_LANG_P)
    site = rng.integers(0, N_SITES, n)

    urls, texts, htmls = [], [], []
    for i in range(n):
        gi = offset + i
        url = f"https://site{site[i]:04d}.example/{gi}"
        text = (
            f"Page {gi} from site{site[i]:04d}. {_FILLERS[filler_a[i]]} "
            f"Travelers wrote about places near {cnames[city_for_text[i]]} "
            f"({lat[i]:.5f}, {lon[i]:.5f}) in {year[i]}. {_FILLERS[filler_b[i]]}"
        )
        urls.append(url)
        texts.append(text)
        htmls.append(f"<html><body>{text}</body></html>".encode("utf-8"))

    base = datetime(2024, 10, 16, tzinfo=timezone.utc)
    base_us = int(base.timestamp() * 1_000_000)
    ts = pa.array(
        base_us + (offset + np.arange(n, dtype=np.int64)) * 1_000_000,
        type=pa.timestamp("us", tz="UTC"),
    )

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(list(lang), pa.string()),
            # ground truth for tests/oracles only — the engine must NOT read
            # these; it re-derives them from `text` (kept in a separate file).
            "_true_lat": pa.array(lat, pa.float64()),
            "_true_lon": pa.array(lon, pa.float64()),
        }
    )


def gen_knn_queries(n_q: int = 200) -> pa.Table:
    rng = np.random.default_rng(SEED + 2)
    clat, clon, _ = city_table()
    qlat, qlon = [], []
    for i in range(n_q - 8):
        if i % 2 == 0:
            c = rng.integers(0, N_CITIES)
            qlat.append(float(np.clip(clat[c] + rng.normal(0, 0.1), -84.9, 84.9)))
            qlon.append(float(((clon[c] + rng.normal(0, 0.1) + 180.0) % 360.0) - 180.0))
        else:
            qlat.append(float(rng.uniform(-84.0, 84.0)))
            qlon.append(float(rng.uniform(-180.0, 180.0)))
    # edge cases: poles, antimeridian, equator/meridian origin
    qlat += [89.5, -89.5, 10.0, -10.0, 0.0, 45.0, -45.0, 84.5]
    qlon += [10.0, -170.0, 179.9, -179.9, 0.0, 179.99, -179.99, 0.01]
    return pa.table(
        {
            "query_id": pa.array(range(n_q), pa.int64()),
            "lat": pa.array(np.round(qlat, 6), pa.float64()),
            "lon": pa.array(np.round(qlon, 6), pa.float64()),
            "k": pa.array([10] * n_q, pa.int32()),
        }
    )


def gen_gazetteer() -> pa.Table:
    """Place-name dimension (place, glat, glon): the 50 deterministic city
    centers the page texts mention. The geocoder joins extracted mentions
    against this table (the gazetteer-broadcast-join path, SURVEY §2.2)."""
    lat, lon, names = city_table()
    return pa.table(
        {
            "place": pa.array(names, pa.string()),
            "glat": pa.array(lat, pa.float64()),
            "glon": pa.array(lon, pa.float64()),
        }
    )


def gen_assets(n: int = 400, seed: int = SEED) -> pa.Table:
    """Deterministic multimodal asset fixture: opaque binary payloads with
    typed metadata (image/audio/video), plus PLANTED exact-duplicate
    payloads (every i with i%10==7 copies the payload of i-7) so the
    fingerprint near-dup join has a non-trivial oracle-checkable answer."""
    import hashlib

    kinds = ["image", "audio", "video"]

    def payload_of(i: int) -> bytes:
        return hashlib.sha256(f"{seed}:asset:{i}".encode()).digest() * (4 + (i % 4))

    ids, kind_l, payloads, w, h, sr, nf = [], [], [], [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        src = i - 7 if i % 10 == 7 else i
        ids.append(i)
        kind_l.append(kind)
        payloads.append(payload_of(src))
        w.append(64 if kind == "image" else 0)
        h.append(48 if kind == "image" else 0)
        sr.append(16_000 if kind == "audio" else 0)
        nf.append(30 if kind == "video" else (1 if kind == "image" else 0))
    return pa.table(
        {
            "asset_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_l, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "sample_rate": pa.array(sr, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
        }
    )


def gen_polygon_edges(n_poly: int = 30) -> pa.Table:
    """Convex-ish polygon rings as an exploded edge table
    (poly_id, seq, lat1, lon1, lat2, lon2) — SQL-friendly for the ray-casting
    oracle; one polygon is city-centered (non-empty), some are empty ocean."""
    rng = np.random.default_rng(SEED + 3)
    clat, clon, _ = city_table()
    pid, seq, la1, lo1, la2, lo2 = [], [], [], [], [], []
    for p in range(n_poly):
        if p < 20:
            c = rng.integers(0, N_CITIES)
            cy, cx = float(clat[c]), float(clon[c])
            r = float(rng.uniform(0.1, 2.0))
        else:
            cy, cx = float(rng.uniform(-70, 70)), float(rng.uniform(-160, 160))
            r = float(rng.uniform(0.5, 5.0))
        nv = int(rng.integers(5, 11))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        radii = r * rng.uniform(0.6, 1.4, nv)
        vy = np.round(np.clip(cy + radii * np.sin(angles), -84.9, 84.9), 6)
        vx = np.round(np.clip(cx + radii * np.cos(angles), -179.9, 179.9), 6)
        for j in range(nv):
            pid.append(p)
            seq.append(j)
            la1.append(float(vy[j]))
            lo1.append(float(vx[j]))
            la2.append(float(vy[(j + 1) % nv]))
            lo2.append(float(vx[(j + 1) % nv]))
    return pa.table(
        {
            "poly_id": pa.array(pid, pa.int64()),
            "seq": pa.array(seq, pa.int32()),
            "lat1": pa.array(la1, pa.float64()),
            "lon1": pa.array(lo1, pa.float64()),
            "lat2": pa.array(la2, pa.float64()),
            "lon2": pa.array(lo2, pa.float64()),
        }
    )


def fixture_dir(sf_name: str) -> str:
    return os.path.join(FIXTURE_ROOT, sf_name)


def sf_name_from_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name not in SF_ROWS:
        raise ValueError(f"unknown sf dir {sf_dir!r}; expected basename in {sorted(SF_ROWS)}")
    return name


def ensure_fixtures(sf_name: str) -> str:
    """Idempotently materialize pages/queries/polygons parquet for ``sf_name``;
    returns the fixture dir. Deterministic: same bytes every run."""
    out = fixture_dir(sf_name)
    os.makedirs(out, exist_ok=True)
    pages_path = os.path.join(out, "pages.parquet")
    truth_path = os.path.join(out, "pages_truth.parquet")
    if not os.path.exists(pages_path):
        n = SF_ROWS[sf_name]
        if n <= CHUNK:
            t = gen_pages(n)
            pq.write_table(t.select(["url", "warc_ts", "html", "text", "lang"]), pages_path, row_group_size=ROW_GROUP_ROWS)
            pq.write_table(t.select(["url", "_true_lat", "_true_lon"]), truth_path, row_group_size=ROW_GROUP_ROWS)
        else:
            pw = tw = None
            try:
                for off in range(0, n, CHUNK):
                    t = _gen_pages_chunk(min(CHUNK, n - off), off)
                    pt = t.select(["url", "warc_ts", "html", "text", "lang"])
                    tt = t.select(["url", "_true_lat", "_true_lon"])
                    if pw is None:
                        pw = pq.ParquetWriter(pages_path, pt.schema)
                        tw = pq.ParquetWriter(truth_path, tt.schema)
                    pw.write_table(pt, row_group_size=ROW_GROUP_ROWS)
                    tw.write_table(tt, row_group_size=ROW_GROUP_ROWS)
            finally:
                if pw is not None:
                    pw.close()
                if tw is not None:
                    tw.close()
    q_path = os.path.join(out, "knn_queries.parquet")
    if not os.path.exists(q_path):
        pq.write_table(gen_knn_queries(), q_path)
    p_path = os.path.join(out, "polygon_edges.parquet")
    if not os.path.exists(p_path):
        pq.write_table(gen_polygon_edges(), p_path)
    a_path = os.path.join(out, "assets.parquet")
    if not os.path.exists(a_path):
        pq.write_table(gen_assets(), a_path)
    g_path = os.path.join(out, "gazetteer.parquet")
    if not os.path.exists(g_path):
        pq.write_table(gen_gazetteer(), g_path)
    return out


def load_pages(spark, sf_dir: str):
    """pages DataFrame for the sf matching a testdata dir (fixtures are keyed
    by the same sf names as /root/testdata)."""
    out = ensure_fixtures(sf_name_from_dir(sf_dir))
    return spark.read.parquet(os.path.join(out, "pages.parquet"))


def load_knn_queries(spark, sf_dir: str):
    out = ensure_fixtures(sf_name_from_dir(sf_dir))
    return spark.read.parquet(os.path.join(out, "knn_queries.parquet"))


def load_polygon_edges(spark, sf_dir: str):
    out = ensure_fixtures(sf_name_from_dir(sf_dir))
    return spark.read.parquet(os.path.join(out, "polygon_edges.parquet"))


def load_gazetteer(spark, sf_dir: str):
    out = ensure_fixtures(sf_name_from_dir(sf_dir))
    return spark.read.parquet(os.path.join(out, "gazetteer.parquet"))
