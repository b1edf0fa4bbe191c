"""Vector geometry simplification: Douglas–Peucker polyline/ring reduction
over the edge-table representation.

Raster→vector produces edge tables (``tile_bounds``, polygon covers); web-map
serving then wants them REDUCED per zoom level — the classic cartographic
pipeline step (Douglas & Peucker 1973, public). This is the inverse-budget
knob to the cover resolution: ``eps_km`` bounds the max deviation of the
dropped vertices from the kept polyline.

Distribution shape: one ``applyInPandas`` group per polyline/ring id — the
same per-group kernel contract as the tree builds (a geometry's vertex list
is perimeter-sized and fits a task by the same argument as the polygon edge
tables; a geometry too big for one task should be split upstream). Inside
the group the kernel is an ITERATIVE stack DP (no recursion depth limit) in
numpy, using the identical equirectangular point-to-segment metric as every
other boundary operator (functions/geo.point_segment_dist_km) so "within
eps_km of the simplified shape" means the same thing the corridor join
measures.

Guarantees (pytest-pinned):
- endpoints always kept; closed rings stay closed;
- every ORIGINAL vertex lies within eps_km of the simplified polyline
  (the DP invariant, verified with the shared metric);
- eps_km = 0 is the identity; vertex count is non-increasing in eps_km;
- deterministic (pure function of the ordered vertex list).

No SQL oracle: the recursive split is not expressible in ANSI SQL — the
properties above are the verification (SURVEY.md §5 pattern for
non-relational kernels).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KM_PER_DEG = 111.194926644559


def _seg_dist_km(plat, plon, lat1, lon1, lat2, lon2):
    """Vectorized numpy replica of functions/geo.point_segment_dist_km
    (equirectangular t-solve anchored at the point's latitude + exact
    haversine to the clamped closest point)."""
    scale = np.cos(np.radians(plat))
    vx, vy = (lon2 - lon1) * scale, lat2 - lat1
    wx, wy = (plon - lon1) * scale, plat - lat1
    den = vx * vx + vy * vy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(den <= 0.0, 0.0, np.clip((wx * vx + wy * vy) / den, 0.0, 1.0))
    clat = lat1 + t * (lat2 - lat1)
    clon = lon1 + t * (lon2 - lon1)
    # haversine
    rl1, rl2 = np.radians(plat), np.radians(clat)
    dlat = rl2 - rl1
    dlon = np.radians(clon - plon)
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * 6371.0088 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def _dp_keep(lats: np.ndarray, lons: np.ndarray, eps_km: float) -> np.ndarray:
    """Boolean keep-mask over the vertex arrays: iterative-stack
    Douglas-Peucker with the great-circle segment metric."""
    n = len(lats)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        sl = slice(i + 1, j)
        d = _seg_dist_km(lats[sl], lons[sl], lats[i], lons[i], lats[j], lons[j])
        kmax = int(d.argmax())
        if d[kmax] > eps_km:
            mid = i + 1 + kmax
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return keep


def simplify_routes(edges: DataFrame, eps_km: float) -> DataFrame:
    """Edge table (route_id|poly_id, seq, lat1, lon1, lat2, lon2) ->
    the same schema with vertices farther than ``eps_km`` from the
    simplified shape removed and ``seq`` renumbered densely.

    Open polylines (last vertex != first) keep both endpoints; closed rings
    (edge list returns to the start vertex) keep the ring's anchor vertex
    and stay closed. One group per geometry id."""
    id_col = "route_id" if "route_id" in edges.columns else "poly_id"
    sel = edges.select(
        F.col(id_col).alias("_gid"), "seq", "lat1", "lon1", "lat2", "lon2"
    )

    out_schema = (
        f"{id_col} long, seq int, "
        "lat1 double, lon1 double, lat2 double, lon2 double"
    )

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        lats = np.append(pdf["lat1"].to_numpy(), pdf["lat2"].to_numpy()[-1])
        lons = np.append(pdf["lon1"].to_numpy(), pdf["lon2"].to_numpy()[-1])
        keep = _dp_keep(lats, lons, eps_km)
        kl, ko = lats[keep], lons[keep]
        gid = pdf["_gid"].iloc[0]
        if len(kl) < 2:
            return pd.DataFrame(
                columns=[id_col, "seq", "lat1", "lon1", "lat2", "lon2"]
            )
        return pd.DataFrame(
            {
                id_col: np.full(len(kl) - 1, gid),
                "seq": np.arange(len(kl) - 1, dtype=np.int32),
                "lat1": kl[:-1],
                "lon1": ko[:-1],
                "lat2": kl[1:],
                "lon2": ko[1:],
            }
        )

    return sel.groupBy("_gid").applyInPandas(one_group, out_schema)
