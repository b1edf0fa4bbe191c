"""Douglas-Peucker simplification: the DP invariant (every original vertex
within eps of the simplified shape, measured with the SHARED segment
metric), identity at eps=0, monotone reduction, closed-ring closure, and
determinism — the non-relational-kernel verification pattern."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import simplify as S
from countrymaam_spark.sources import pages as PG

SF_DIR = "/root/testdata/sf0.001"


def _zigzag_route(spark, n=60, amp=0.005, route_id=1):
    """A noisy near-straight line: DP should collapse it hard."""
    rng = np.random.default_rng(7)
    lats = 10.0 + np.linspace(0, 2.0, n) + rng.normal(0, amp, n)
    lons = 20.0 + np.linspace(0, 3.0, n)
    rows = [
        (route_id, i, float(lats[i]), float(lons[i]), float(lats[i + 1]), float(lons[i + 1]))
        for i in range(n - 1)
    ]
    return spark.createDataFrame(
        rows, "route_id long, seq int, lat1 double, lon1 double, lat2 double, lon2 double"
    )


def _vertices(rows):
    rows = sorted(rows, key=lambda r: r["seq"])
    v = [(r["lat1"], r["lon1"]) for r in rows]
    v.append((rows[-1]["lat2"], rows[-1]["lon2"]))
    return v


def test_identity_at_eps_zero(spark):
    e = _zigzag_route(spark)
    out = S.simplify_routes(e, 0.0).collect()
    assert _vertices(out) == _vertices(e.collect())


def test_dp_invariant_and_monotone_reduction(spark):
    e = _zigzag_route(spark)
    orig = _vertices(e.collect())
    prev_n = len(orig)
    for eps in (0.5, 2.0, 50.0):
        out = S.simplify_routes(e, eps).collect()
        v = _vertices(out)
        # endpoints preserved
        assert v[0] == orig[0] and v[-1] == orig[-1]
        # monotone: larger eps never keeps more vertices
        assert len(v) <= prev_n
        prev_n = len(v)
        # DP invariant: every ORIGINAL vertex within eps of SOME kept edge
        ol = np.array([p[0] for p in orig])
        oo = np.array([p[1] for p in orig])
        dmin = np.full(len(orig), np.inf)
        for (a1, o1), (a2, o2) in zip(v[:-1], v[1:]):
            d = S._seg_dist_km(ol, oo, a1, o1, a2, o2)
            dmin = np.minimum(dmin, d)
        assert (dmin <= eps + 1e-9).all()
    # the noisy straight line really collapses at 50 km
    assert prev_n == 2


def test_closed_ring_stays_closed(spark):
    """Fixture polygon rings: simplified output must still close and obey
    the DP invariant for every polygon."""
    edges = PG.load_polygon_edges(spark, SF_DIR)
    out = S.simplify_routes(edges, 5.0).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["poly_id"], []).append(r)
    orig = edges.collect()
    orig_by_id: dict[int, list] = {}
    for r in orig:
        orig_by_id.setdefault(r["poly_id"], []).append(r)
    assert set(by_id) == set(orig_by_id)  # no polygon vanishes
    for pid, rows in by_id.items():
        v = _vertices(rows)
        ov = _vertices(orig_by_id[pid])
        assert v[0] == ov[0] and v[-1] == ov[-1]
        assert ov[0] == ov[-1]  # fixture rings close
        assert v[0] == v[-1]  # ...and stay closed
        assert len(v) <= len(ov)


def test_deterministic(spark):
    e = _zigzag_route(spark)
    a = sorted(map(tuple, S.simplify_routes(e, 2.0).collect()))
    b = sorted(map(tuple, S.simplify_routes(e, 2.0).collect()))
    assert a == b
