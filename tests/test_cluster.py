"""Grid-density hotspot clustering: every stage vs its DuckDB oracle
(dense aggregate, wrapped adjacency, recursive-closure components), plus
structural properties (labels are component minima; noise excluded; the
longitude seam merges)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import cluster as CL
from countrymaam_spark.sources import pages as PG
from countrymaam_spark.operators.geotag import extract_geo, extract_geo_sql

RES, MIN_PTS = 9, 5


@pytest.fixture(scope="module")
def sf_dir():
    return PG.ensure_fixtures("sf0.001")


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    return extract_geo(PG.load_pages(spark, sf_dir)).cache()


@pytest.fixture(scope="module")
def pg_rel(sf_dir):
    return "(" + extract_geo_sql(f"'{sf_dir}/pages.parquet'") + ")"


def test_hotspot_cells_match_oracle(spark, geo, pg_rel):
    got = sorted(tuple(r) for r in CL.hotspot_cells(geo, RES, MIN_PTS).collect())
    want = sorted(tuple(t) for t in duckdb.sql(CL.hotspot_cells_sql(pg_rel, RES, MIN_PTS)).fetchall())
    assert got == want and len(got) > 0


def test_hotspot_pages_match_oracle(spark, geo, pg_rel):
    got = sorted(tuple(r) for r in CL.hotspot_pages(geo, RES, MIN_PTS).collect())
    want = sorted(tuple(t) for t in duckdb.sql(CL.hotspot_pages_sql(pg_rel, RES, MIN_PTS)).fetchall())
    assert got == want


def test_hotspot_stats_match_oracle_bit_exact(spark, geo, pg_rel):
    """Centroids use exact decimal sums + one IEEE division (the
    domain_spread determinism pattern) — values must match bit-for-bit."""
    got = sorted(tuple(r) for r in CL.hotspot_stats(geo, RES, MIN_PTS).collect())
    want = sorted(tuple(t) for t in duckdb.sql(CL.hotspot_stats_sql(pg_rel, RES, MIN_PTS)).fetchall())
    assert got == want


def test_labels_are_component_minima_and_dense_only(spark, geo):
    rows = CL.hotspot_cells(geo, RES, MIN_PTS).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["cell"])
        assert r["n_pts"] >= MIN_PTS
    for cid, cells in by_cluster.items():
        assert cid == min(cells)
    # multi-cell clusters exist at this config (adjacency actually merges)
    assert any(len(c) > 1 for c in by_cluster.values())


def test_noise_pages_excluded(spark, geo):
    from countrymaam_spark.functions import geo as G

    labeled = CL.hotspot_pages(geo, RES, MIN_PTS)
    n_geo = geo.filter(F.col("lat").isNotNull()).count()
    assert 0 < labeled.count() < n_geo  # DBSCAN semantics: noise dropped
    # every labeled page really sits in its claimed cell
    bad = (
        labeled.join(geo.select("url", "lat", "lon"), "url")
        .filter(G.encode_cell(F.col("lat"), F.col("lon"), RES) != F.col("cell"))
    )
    assert bad.count() == 0


def test_dateline_wrap_merges_clusters(spark):
    """Two dense pockets on either side of the +/-180 seam are grid
    neighbors (ring_cells pmods x) and must land in ONE cluster."""
    rows = []
    for i in range(6):
        rows.append((f"https://w{i}.example/", 10.0, 179.9))
        rows.append((f"https://e{i}.example/", 10.0, -179.9))
    df = spark.createDataFrame(rows, "url string, lat double, lon double")
    out = CL.hotspot_cells(df, 8, 5).collect()
    assert len(out) == 2  # two dense cells...
    assert len({r["cluster_id"] for r in out}) == 1  # ...one component


def test_plan_no_nested_loop_and_single_corpus_agg(spark, geo):
    """The only corpus-sized ops are the cell aggregate and the final label
    hash-join: no BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    plan = (
        CL.hotspot_pages(geo, RES, MIN_PTS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hotspots_from_stats_state_match_corpus_path(spark, geo):
    """Serving clustering from the persisted per-cell count state must be
    bit-identical to the corpus-scan path (same aggregate thresholded)."""
    from countrymaam_spark.operators.knn import build_cell_stats

    stats = build_cell_stats(geo, RES)
    a = sorted(tuple(r) for r in CL.hotspot_cells(geo, RES, MIN_PTS).collect())
    b = sorted(
        tuple(r)
        for r in CL.hotspot_cells(geo, RES, MIN_PTS, stats=stats).collect()
    )
    assert a == b


def test_hotspots_from_stream_maintained_state(spark, tmp_path):
    """End-to-end: pages stream -> maintained cell-lut state -> hotspot
    clustering over the state == clustering the batch corpus. Clustering is
    a pure consumer of the exactly-once streamed statistics."""
    import os

    import pyarrow.parquet as pq_

    from countrymaam_spark.functions import geo as G
    from countrymaam_spark.streaming import ingest, maintain

    out = PG.ensure_fixtures("sf0.001")
    t = pq_.read_table(os.path.join(out, "pages.parquet"))
    drops = tmp_path / "drops"
    drops.mkdir()
    pq_.write_table(t.slice(0, 1000), str(drops / "d1.parquet"))
    pq_.write_table(t.slice(1000), str(drops / "d2.parquet"))

    state = str(tmp_path / "state")
    batch_all = spark.read.parquet(str(drops))
    stream = ingest.stream_pages_from_dir(spark, str(drops), batch_all.schema)
    g = ingest.geotag_stream(stream, res=7)
    q = maintain.maintain_cell_lut_stream(g, state, str(tmp_path / "ck"), res=7)
    assert q.awaitTermination(180)

    lut = spark.read.parquet(os.path.join(state, "cell_lut"))
    stats = lut.filter(F.col("lv") == 7).select("cell", "cnt")
    got = sorted(
        tuple(r)
        for r in CL.hotspot_cells(None, 7, 5, stats=stats).collect()
    )
    geo_batch = extract_geo(batch_all).filter(F.col("lat").isNotNull())
    want = sorted(tuple(r) for r in CL.hotspot_cells(geo_batch, 7, 5).collect())
    assert got == want and len(got) > 0


# --- exact point-level DBSCAN ------------------------------------------------

DB_EPS, DB_MIN = 1.0, 3


def test_dbscan_points_match_oracle(spark, geo, pg_rel):
    got = sorted(
        tuple(r) for r in CL.dbscan_points(geo, DB_EPS, DB_MIN, res=13).collect()
    )
    want = sorted(
        tuple(t)
        for t in duckdb.sql(CL.dbscan_points_sql(pg_rel, DB_EPS, DB_MIN)).fetchall()
    )
    assert got == want and len(got) > 0
    roles = {r[1] for r in got}
    assert roles == {"core", "border", "noise"}  # config exercises all three


def test_dbscan_planted_geometry(spark):
    """The DBSCAN subtlety the grid approximation can't express: a BORDER
    point within eps of cores of TWO clusters must not merge them (clusters
    are components of the CORE subgraph only), and gets the deterministic
    min label. Geometry (degrees, ~111 km/deg): two 4-point blobs whose
    only core is the blob point nearest the bridge (4 nbrs + self = 5),
    the other blob points are border (3 nbrs + self = 4 < 5), the bridge
    reaches exactly one core per blob (2 nbrs), and one far point is
    noise."""
    import duckdb as dk

    rows = [
        ("a_far", 0.0, 0.0), ("a_up", 0.0, 0.003),
        ("a_core", 0.003, 0.0), ("a_diag", 0.003, 0.003),
        ("b_core", 0.017, 0.0), ("b_diag", 0.017, 0.003),
        ("b_far", 0.020, 0.0), ("b_up", 0.020, 0.003),
        ("bridge", 0.010, -0.002),
        ("lonely", 5.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "url string, lat double, lon double")
    got = {r["url"]: (r["role"], r["cluster_id"])
           for r in CL.dbscan_points(df, 0.9, 5, res=13).collect()}
    assert got["a_core"] == ("core", "a_core")
    assert got["b_core"] == ("core", "b_core")  # NOT merged through bridge
    assert got["bridge"] == ("border", "a_core")  # min-rule, deterministic
    assert got["lonely"] == ("noise", "")
    for u in ("a_far", "a_up", "a_diag"):
        assert got[u] == ("border", "a_core")
    for u in ("b_far", "b_up", "b_diag"):
        assert got[u] == ("border", "b_core")
    # oracle agrees on the planted geometry too
    vals = ", ".join(f"('{u}', {la!r}, {lo!r})" for u, la, lo in rows)
    rel = f"(SELECT * FROM (VALUES {vals}) t(url, lat, lon))"
    want = {u: (role, cid)
            for u, role, cid in dk.sql(CL.dbscan_points_sql(rel, 0.9, 5)).fetchall()}
    assert want == got


def test_dbscan_min_pts_one_isolated_points_are_core(spark):
    """min_pts=1: every point is its own cluster (the left-join totality
    path — isolated points have no pair row at all)."""
    rows = [("p1", 0.0, 0.0), ("p2", 3.0, 3.0)]
    df = spark.createDataFrame(rows, "url string, lat double, lon double")
    got = sorted(
        tuple(r) for r in CL.dbscan_points(df, 0.5, 1, res=13).collect()
    )
    assert got == [("p1", "core", "p1"), ("p2", "core", "p2")]


# --- kernel-density raster (heatmap) -----------------------------------------


def test_kde_heatmap_match_oracle(spark, geo, pg_rel):
    got = sorted(tuple(r) for r in CL.kde_heatmap(geo, 7, 2).collect())
    want = sorted(
        tuple(t) for t in duckdb.sql(CL.kde_heatmap_sql(pg_rel, 7, 2)).fetchall()
    )
    assert got == want and len(got) > 0


def test_kde_heatmap_planted_values(spark):
    """Hand-checked density: one page at a cell, radius 1 kernel
    w = 2 - (dx^2+dy^2) -> center 2, the four edge-neighbors 1, corners 0
    (outside the Euclidean disc). A second page in the center cell doubles
    everything. Mass conservation: sum(density) = n_pages * sum(weights)."""
    from countrymaam_spark.functions import geo as G

    rows = [("p1", 10.0, 20.0), ("p2", 10.0, 20.0)]
    df = spark.createDataFrame(rows, "url string, lat double, lon double")
    out = {r["cell"]: r["density"] for r in CL.kde_heatmap(df, 7, 1).collect()}
    [center] = [
        r["c"]
        for r in df.limit(1)
        .select(G.encode_cell(F.col("lat"), F.col("lon"), 7).alias("c"))
        .collect()
    ]
    assert out[center] == 4  # 2 pages * center weight 2
    assert len(out) == 5  # disc of radius 1: center + 4 edge neighbors
    assert sorted(out.values()) == [2, 2, 2, 2, 4]
    assert sum(out.values()) == 2 * sum(w for _, _, w in CL._kde_offsets(1))


def test_kde_heatmap_wraps_longitude_and_clamps_poles(spark):
    """A page in the last longitude column spreads across the antimeridian
    seam (pmod wrap); a page in the top latitude row loses its
    beyond-the-pole kernel rows (clamp) — checked against the oracle, which
    implements the identical topology independently."""
    rows = [("seam", 0.0, 179.9), ("pole", 89.9, 0.0)]
    df = spark.createDataFrame(rows, "url string, lat double, lon double")
    got = sorted(tuple(r) for r in CL.kde_heatmap(df, 5, 2).collect())
    vals = ", ".join(f"('{u}', {la!r}, {lo!r})" for u, la, lo in rows)
    rel = f"(SELECT * FROM (VALUES {vals}) t(url, lat, lon))"
    want = sorted(tuple(t) for t in duckdb.sql(CL.kde_heatmap_sql(rel, 5, 2)).fetchall())
    assert got == want and len(got) > 0
    # clamp really dropped rows: pole page contributes < full-disc weight
    total = sum(d for _, d in got)
    assert total < 2 * sum(w for _, _, w in CL._kde_offsets(2))
    # wrap really happened: some output cell is in the x=0 column while no
    # input page is (seam page at lon 179.9 -> last column at res 5)
    from countrymaam_spark.functions.geo import _R_SHIFT, _X_SHIFT
    xs = {(c % _R_SHIFT) // _X_SHIFT for c, _ in got}
    assert 0 in xs


def test_kde_contours_match_oracle(spark, geo, pg_rel):
    got = sorted(
        tuple(r) for r in CL.kde_contours(geo, 7, 2, [5, 50, 500]).collect()
    )
    want = sorted(
        tuple(t)
        for t in duckdb.sql(CL.kde_contours_sql(pg_rel, 7, 2, [5, 50, 500])).fetchall()
    )
    assert got == want and len(got) > 0
    assert {lv for lv, _, _ in got} <= {5, 50, 500}


def test_kde_contours_planted_merge_and_empty_level(spark):
    """Two 5-page blobs 4 cells apart: their radius-2 kernel smears overlap,
    so the low contour level is ONE region while the high level (centers
    only, density 25) is TWO; an impossible level contributes zero rows
    (empty-level totality). Region ids are the min member cell."""
    from countrymaam_spark.functions import geo as G

    # res 5: cell edge 360/64 = 5.625 deg; centers 4 cells apart in x
    rows = [(f"a{i}", 2.0, 2.0) for i in range(5)] + [
        (f"b{i}", 2.0, 2.0 + 4 * 5.625) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "url string, lat double, lon double")
    out = CL.kde_contours(df, 5, 2, [5, 25, 999999]).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r["level"], set()).add(r["region_id"])
    assert 999999 not in by_level  # empty level: zero rows, no crash
    assert len(by_level[25]) == 2  # centers separate
    assert len(by_level[5]) == 1  # smears merge through the overlap
    # the merged region is labeled by the min cell of its members
    cells5 = [r["cell"] for r in out if r["level"] == 5]
    (lbl5,) = by_level[5]
    assert lbl5 == min(cells5)


def test_kde_from_stats_state_equals_corpus_path(spark, geo):
    """Serving the raster (and its contours) from the persisted per-cell
    count state is bit-identical to the corpus path — the state-serving
    shape shared with hotspot_cells(stats=...), including after an
    incremental append."""
    from countrymaam_spark.operators.knn import build_cell_stats, update_cell_stats

    g = geo.filter(F.col("lat").isNotNull())
    half_a = g.filter(F.crc32(F.col("url").cast("binary")) % 2 == 0)
    half_b = g.filter(F.crc32(F.col("url").cast("binary")) % 2 == 1)
    stats = update_cell_stats(build_cell_stats(half_a, 7), half_b, 7)
    want = sorted(tuple(r) for r in CL.kde_heatmap(g, 7, 2).collect())
    got = sorted(
        tuple(r) for r in CL.kde_heatmap(None, 7, 2, stats=stats).collect()
    )
    assert got == want and len(got) > 0
    want_c = sorted(tuple(r) for r in CL.kde_contours(g, 7, 2, [5, 50]).collect())
    got_c = sorted(
        tuple(r)
        for r in CL.kde_contours(None, 7, 2, [5, 50], stats=stats).collect()
    )
    assert got_c == want_c and len(got_c) > 0


# --- Getis-Ord Gi* statistical hotspots --------------------------------------


def test_gi_star_matches_oracle(spark, geo, pg_rel):
    got = sorted(tuple(r) for r in CL.gi_star(geo, 7, 2).collect())
    want = sorted(
        tuple(t) for t in duckdb.sql(CL.gi_star_sql(pg_rel, 7, 2)).fetchall()
    )
    assert got == want and len(got) > 0
    # the fixture's city blobs must be extreme statistical hotspots
    assert max(z for _, _, z in got) > 5.0


def test_gi_star_planted_hand_computed(spark):
    """One 10-page cell in an otherwise empty world: the z-score of every
    covered interior cell equals the hand-evaluated Getis-Ord formula (the
    same IEEE expression tree over the same exact integers), and a
    pole-row cell has a clamp-shrunk neighbor count with a correspondingly
    LARGER z for the same box sum."""
    import math as m

    res, radius = 5, 1
    nx, ny = 2 << res, 1 << res
    rows = [(f"p{i}", 0.1, 0.1) for i in range(10)] + [("polar", 89.0, 0.1)]
    df = spark.createDataFrame(rows, "url string, lat double, lon double")
    out = {r["cell"]: (r["w_n"], r["gi_z"]) for r in CL.gi_star(df, res, radius).collect()}
    n = nx * ny
    sx, sxx = 11, 101  # 10^2 + 1^2
    xbar = sx / n
    s = m.sqrt(sxx / n - xbar * xbar)

    def z(l, w):
        return round((l - xbar * w) / (s * m.sqrt((n * w - w * w) / float(n - 1))), 6)

    # equator source: the 9 cells covering it have W = 9, box sum 10
    assert sum(1 for wn, gz in out.values() if (wn, gz) == (9, z(10, 9))) == 9
    # the polar page sits in the TOP row (y = ny-1): the 3 covered top-row
    # cells have W = 3*2 = 6 (dy=+1 clamped away); the 3 covered cells one
    # row below still see the full 3x3 box (W = 9) with box sum 1
    assert sum(1 for wn, gz in out.values() if (wn, gz) == (6, z(1, 6))) == 3
    assert sum(1 for wn, gz in out.values() if (wn, gz) == (9, z(1, 9))) == 3
    assert len(out) == 15
    # the clamp shrinks W, which must RAISE z for the same box sum
    assert z(1, 6) > z(1, 9)


def test_morans_i_matches_oracle(spark, geo, pg_rel):
    got = [tuple(r) for r in CL.morans_i(geo, 7, 2).collect()]
    want = [tuple(t) for t in duckdb.sql(CL.morans_i_sql(pg_rel, 7, 2)).fetchall()]
    assert got == want and len(got) == 1


def test_morans_i_clustered_beats_scattered(spark):
    """Two loads in ADJACENT cells autocorrelate; the same loads on opposite
    sides of the world do not — planted geometry, oracle agreement on both
    (res 3: 5.625-deg rows at the equator are ~625 km tall, 22.5-deg cols)."""
    import duckdb as dk

    near = [(f"a{i}", 0.1, 0.1) for i in range(10)] + [
        (f"b{i}", 0.1, 23.0) for i in range(10)  # next cell over in x
    ]
    far = [(f"a{i}", 0.1, 0.1) for i in range(10)] + [
        (f"b{i}", 0.1, 179.0) for i in range(10)
    ]
    vals = {}
    for name, rows in (("near", near), ("far", far)):
        df = spark.createDataFrame(rows, "url string, lat double, lon double")
        [(n, wt, i)] = [tuple(r) for r in CL.morans_i(df, 3, 1).collect()]
        sql_rows = ", ".join(f"('{u}', {la!r}, {lo!r})" for u, la, lo in rows)
        rel = f"(SELECT * FROM (VALUES {sql_rows}) t(url, lat, lon))"
        want = [tuple(t) for t in dk.sql(CL.morans_i_sql(rel, 3, 1)).fetchall()]
        assert want == [(n, wt, i)], name
        vals[name] = i
    assert vals["near"] > 0 > vals["far"] or vals["near"] > vals["far"] > -1
    assert vals["near"] > vals["far"]


def test_local_morans_i_matches_oracle_and_signs(spark, geo, pg_rel):
    got = sorted(tuple(r) for r in CL.local_morans_i(geo, 7, 2).collect())
    want = sorted(
        tuple(t) for t in duckdb.sql(CL.local_morans_i_sql(pg_rel, 7, 2)).fetchall()
    )
    assert got == want and len(got) > 0
    vals = [v for _, _, v in got]
    # the fixture has both cluster cores (positive) and spatial outliers
    # (isolated loaded cells -> negative)
    assert max(vals) > 1.0 and min(vals) < 0.0
