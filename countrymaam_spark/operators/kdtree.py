"""Per-partition kd-tree kernel (numpy) — the build/search logic that runs
INSIDE applyInPandas groups. This is the direct Spark-era restatement of the
reference's BSP machinery:

- build: recursive split on a high-variance axis chosen uniformly among the
  top-2 candidate axes (FLANN-style randomized tie-break), cut at the axis
  mean, stop at ``leaf_size`` — countrymaam's kd cut plane + buildSubTree
  (/root/reference/bsp_tree/kd.go:34-81, /root/reference/bsp_tree/bsp_tree.go:22-60).
- layout: flattened arrays (indice permutation + node table with [begin, end)
  ranges and child ids, 0 = null child) — countrymaam's BspTree
  (/root/reference/bsp_tree/bsp_tree.go:10-13).
- search: best-first branch & bound over a heap seeded with the root; far
  children deferred with priority = |signed plane distance|, leaves scanned
  exactly, visit budget = ``max_leaves`` (the search_k analog) —
  countrymaam's SearchChannel (/root/reference/index/bsp_tree_index.go:35-92).

Unlike the reference (unseeded, bsp_tree/kd.go:72) every random choice is
seeded, so index builds are reproducible per (partition, seed).
"""

from __future__ import annotations

import heapq
import io
import pickle
import zlib

import numpy as np

LEAF_SIZE = 32
VAR_SAMPLE = 100  # sample cap for axis variance, as the reference's sampleFeatures
TOP_AXES = 2


def build(
    points: np.ndarray,
    leaf_size: int = LEAF_SIZE,
    seed: int = 42,
    kind: str = "kd",
) -> dict:
    """points: (n, d) float64 -> flattened tree dict.

    ``kind='kd'``: axis-aligned cut planes (variance-ranked axis, mean cut —
    /root/reference/bsp_tree/kd.go:34-81).
    ``kind='rp'``: oblique cut planes — a 2-means-refined random projection
    (normal = normalized difference of two sampled centroids, offset at the
    midpoint — /root/reference/bsp_tree/random_projection.go:34-106). Stored
    as rows of ``normals`` with ``split_val`` = -offset.

    Arrays: indice (n,), begin/end/left/right/split_dim (m,), split_val (m,),
    normals (m, d) for rp. Node 0 is the root; child id 0 means "no child"
    (leaf), as in the reference layout.
    """
    n = len(points)
    d = points.shape[1] if points.ndim == 2 else 0
    rng = np.random.default_rng(seed)
    indice = rng.permutation(n).astype(np.int64)
    begin, end, left, right = [], [], [], []
    split_dim, split_val, normals = [], [], []

    def new_node(b: int, e: int) -> int:
        begin.append(b)
        end.append(e)
        left.append(0)
        right.append(0)
        split_dim.append(-1)
        split_val.append(0.0)
        normals.append(np.zeros(d))
        return len(begin) - 1

    if n == 0:
        return _pack(indice, begin, end, left, right, split_dim, split_val, normals, kind)

    stack = [(new_node(0, n), 0, n)]
    while stack:
        node, b, e = stack.pop()
        if e - b <= leaf_size:
            continue
        idx = indice[b:e]
        sample = idx if len(idx) <= VAR_SAMPLE else rng.choice(idx, VAR_SAMPLE, replace=False)
        if kind == "kd":
            var = points[sample].var(axis=0)
            order = np.argsort(var)[::-1]
            cand = order[: min(TOP_AXES, len(order))]
            dim = int(rng.choice(cand))
            val = float(points[sample, dim].mean())
            proj = points[idx, dim]
        else:  # rp: refined random projection (online 2-means, maxIter=8)
            dim = -1
            seeds = rng.choice(idx, 2, replace=False)
            c0, c1 = points[seeds[0]].astype(float), points[seeds[1]].astype(float)
            for _ in range(8):
                sp = points[sample]
                d0 = ((sp - c0) ** 2).sum(axis=1)
                d1 = ((sp - c1) ** 2).sum(axis=1)
                m0, m1 = d0 <= d1, d0 > d1
                if m0.any():
                    c0 = sp[m0].mean(axis=0)
                if m1.any():
                    c1 = sp[m1].mean(axis=0)
            normal = c1 - c0
            nn = np.linalg.norm(normal)
            if nn < 1e-12:
                normal = rng.standard_normal(d)
                nn = np.linalg.norm(normal)
            normal = normal / nn
            val = float(normal @ ((c0 + c1) / 2.0))
            proj = points[idx] @ normal
        mask = proj < val
        m = int(mask.sum())
        if m == 0 or m == len(idx):
            m = len(idx) // 2  # degenerate split -> midpoint fallback
            # (reference: collection/ops.go:21-23)
            part = np.argsort(proj, kind="stable")
            indice[b:e] = idx[part]
            val = float(np.sort(proj, kind="stable")[m])
        else:
            indice[b:e] = np.concatenate([idx[mask], idx[~mask]])
        lid = new_node(b, b + m)
        rid = new_node(b + m, e)
        left[node], right[node] = lid, rid
        split_dim[node], split_val[node] = dim, val
        if kind == "rp":
            normals[node] = normal
        stack.append((lid, b, b + m))
        stack.append((rid, b + m, e))
    return _pack(indice, begin, end, left, right, split_dim, split_val, normals, kind)


def _pack(indice, begin, end, left, right, split_dim, split_val, normals, kind) -> dict:
    out = {
        "indice": np.asarray(indice, dtype=np.int64),
        "begin": np.asarray(begin, dtype=np.int64),
        "end": np.asarray(end, dtype=np.int64),
        "left": np.asarray(left, dtype=np.int64),
        "right": np.asarray(right, dtype=np.int64),
        "split_dim": np.asarray(split_dim, dtype=np.int64),
        "split_val": np.asarray(split_val, dtype=np.float64),
        "kind": kind,
    }
    if kind == "rp":
        out["normals"] = np.asarray(normals, dtype=np.float64)
    return out


def serialize(tree: dict) -> bytes:
    buf = io.BytesIO()
    pickle.dump({k: v for k, v in tree.items()}, buf, protocol=4)
    return buf.getvalue()


def deserialize(blob: bytes) -> dict:
    return pickle.loads(blob)


# --- serving-blob payload (compact v2) --------------------------------------
#
# Tree serving is BANDWIDTH-bound (91-94% of the measured single-box membw
# ceiling under the interleaved N-vs-4N protocol): every probe streams blob
# bytes through parquet decode -> Arrow -> Python memcpy -> unpickle. The v1
# pickle payload per 5k-row group measured ~302 KB: urls 53% (utf-8 text,
# highly compressible, but shipped raw through every layer since parquet
# decompresses at scan), coords 27%, int64 tree arrays 20%. v2 keeps urls
# zlib-compressed INSIDE the payload (only candidate urls are ever decoded,
# via the (buf, offsets) form) and downcasts tree arrays (node ids/offsets
# int32, split_dim int8) — ~2.4x fewer streamed bytes per blob, identical
# search numerics (split_val and coords stay float64).

_PAYLOAD_MAGIC = b"CMTB2\x00"


def _tree_compact(tree: dict) -> dict:
    out = {
        "indice": np.asarray(tree["indice"], dtype=np.int32),
        "begin": np.asarray(tree["begin"], dtype=np.int32),
        "end": np.asarray(tree["end"], dtype=np.int32),
        "left": np.asarray(tree["left"], dtype=np.int32),
        "right": np.asarray(tree["right"], dtype=np.int32),
        "split_dim": np.asarray(tree["split_dim"], dtype=np.int8),
        "split_val": np.asarray(tree["split_val"], dtype=np.float64),
        "kind": tree["kind"],
    }
    if "normals" in tree:
        out["normals"] = np.asarray(tree["normals"], dtype=np.float64)
    return out


def pack_payload(
    trees: list, urls: np.ndarray, lat: np.ndarray, lon: np.ndarray, cos0: float
) -> bytes:
    """Compact serving-blob bytes. Deterministic (fixed zlib level), so blob
    builds stay a pure function of (row set, seed) — the incremental-add
    bit-equivalence contract."""
    ubytes = [str(u).encode("utf-8") for u in urls]
    off = np.zeros(len(ubytes) + 1, dtype=np.uint32)
    if ubytes:
        np.cumsum([len(b) for b in ubytes], out=off[1:])
    body = {
        "trees": [_tree_compact(t) for t in trees],
        "url_z": zlib.compress(b"".join(ubytes), 6),
        "url_off_z": zlib.compress(off.tobytes(), 6),
        "n_urls": len(ubytes),
        "lat": np.asarray(lat, dtype=np.float64),
        "lon": np.asarray(lon, dtype=np.float64),
        "cos0": float(cos0),
    }
    return _PAYLOAD_MAGIC + pickle.dumps(body, protocol=4)


def unpack_payload(blob: bytes) -> dict:
    """Inverse of pack_payload -> {trees, url_buf, url_off, lat, lon, cos0}.

    ``url_buf``/``url_off`` replace the v1 object-array ``urls``: consumers
    decode ONLY selected candidates via ``url_buf[url_off[i]:url_off[i+1]]``
    (per-probe decode cost scales with candidates, not blob rows). v1 pickle
    blobs (pre-existing persisted state) are detected and adapted."""
    if blob[: len(_PAYLOAD_MAGIC)] == _PAYLOAD_MAGIC:
        body = pickle.loads(blob[len(_PAYLOAD_MAGIC):])
        return {
            "trees": body["trees"],
            "url_buf": zlib.decompress(body["url_z"]),
            "url_off": np.frombuffer(
                zlib.decompress(body["url_off_z"]), dtype=np.uint32
            ),
            "lat": body["lat"],
            "lon": body["lon"],
            "cos0": body["cos0"],
        }
    old = pickle.loads(blob)
    ubytes = [str(u).encode("utf-8") for u in old["urls"]]
    off = np.zeros(len(ubytes) + 1, dtype=np.uint32)
    if ubytes:
        np.cumsum([len(b) for b in ubytes], out=off[1:])
    return {
        "trees": old["trees"],
        "url_buf": b"".join(ubytes),
        "url_off": off,
        "lat": np.asarray(old["lat"], dtype=np.float64),
        "lon": np.asarray(old["lon"], dtype=np.float64),
        "cos0": old["cos0"],
    }


def decode_urls(url_buf: bytes, url_off: np.ndarray, isel: np.ndarray) -> list:
    """Decode just the selected candidate urls out of the packed buffer."""
    return [
        url_buf[url_off[i] : url_off[i + 1]].decode("utf-8") for i in isel
    ]


def leaf_bounds(tree: dict, d: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """kd tree -> (leaf_node_ids, lo (L,d), hi (L,d)) axis-aligned leaf boxes.

    One O(nodes) traversal per (blob, task) — amortized over the whole query
    batch. Valid for the midpoint fallback too: fallback splits at the sorted
    projection value, so left points are <= val and right points >= val.
    Only meaningful for ``kind='kd'`` (rp leaves are halfspace intersections,
    not boxes).
    """
    if len(tree["begin"]) == 0:
        return np.empty(0, np.int64), np.empty((0, d)), np.empty((0, d))
    lids, los, his = [], [], []
    stack = [(0, np.full(d, -np.inf), np.full(d, np.inf))]
    while stack:
        node, lo, hi = stack.pop()
        l, r = int(tree["left"][node]), int(tree["right"][node])
        if l == 0 and r == 0:
            lids.append(node)
            los.append(lo)
            his.append(hi)
            continue
        dim = int(tree["split_dim"][node])
        val = float(tree["split_val"][node])
        lhi = hi.copy()
        lhi[dim] = min(hi[dim], val)
        rlo = lo.copy()
        rlo[dim] = max(lo[dim], val)
        stack.append((l, lo, lhi))
        stack.append((r, rlo, hi))
    return (
        np.asarray(lids, dtype=np.int64),
        np.stack(los),
        np.stack(his),
    )


def search_batch(
    tree: dict,
    points: np.ndarray,
    qpts: np.ndarray,
    k: int,
    max_leaves: int = 32,
    chunk: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Budgeted kNN for a WHOLE query batch against one kd tree.

    Returns (query_rows, point_indices): for each query row, its top-k
    candidate indices among the ``max_leaves`` leaves with smallest exact
    box lower bound. Semantics vs the per-query ``search``: same budget
    knob, same exact-when-budget>=leaves invariant; the leaf visit order is
    the TRUE box lower bound (tighter than best-first's inherited plane
    bound, so per-budget recall can only improve). The point: ~Python-loop-
    free serving — per chunk the work is one (Q, L, d) bound tensor, one
    argpartition, and one vectorized distance block per touched LEAF
    (amortized over all queries probing it), not a heap walk per query.
    """
    n_q = len(qpts)
    if n_q == 0 or len(points) == 0 or len(tree["begin"]) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if tree.get("kind") != "kd":
        # rp trees have no box bounds: per-query best-first fallback
        rows_q, rows_i = [], []
        for r in range(n_q):
            idx, _ = search(tree, points, qpts[r], k, max_leaves=max_leaves)
            if len(idx):
                rows_q.append(np.full(len(idx), r, dtype=np.int64))
                rows_i.append(idx)
        if not rows_q:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(rows_q), np.concatenate(rows_i)
    d = points.shape[1]
    lids, lo, hi = leaf_bounds(tree, d)
    L = len(lids)
    nb = min(max_leaves, L)
    begin, end, indice = tree["begin"], tree["end"], tree["indice"]
    n = len(points)
    p2 = (points * points).sum(axis=1)
    sizes = (end[lids] - begin[lids]).astype(np.int64) if L else np.empty(0, np.int64)
    leaf_max = int(sizes.max()) if L else 0
    # DENSE shortcut: when the budget's candidate volume (nb * leaf_max) is
    # within ~4x of the whole blob, the leaf machinery costs more than it
    # saves — one |p|^2 - 2 q.p dgemm over ALL points per chunk is cheaper
    # than gathering the selected-leaf candidates (random-access reads).
    # Semantics: this serves the blob EXACTLY, a strict superset of the
    # budgeted result — the budget is a recall FLOOR (reference invariant:
    # recall monotone in budget, budget >= corpus => exact). The gathered
    # branch remains the at-scale path (200k-row blobs, budget ~4% of
    # leaves, where dense dgemm would be 25x the selected volume).
    dense = n <= 4 * nb * leaf_max if leaf_max else True
    pad_pts = None
    if not dense:
        # padded leaf->points lookup (once per blob): (L, leaf_max), -1 pad.
        # Selected candidates come from ONE fancy-indexed gather per chunk —
        # no per-leaf Python loop, no global lexsort (a first cut grouped by
        # leaf and lexsorted ~2M candidate rows per chunk; the sort alone
        # dominated serving at volume).
        pad_pts = np.full((L, leaf_max), -1, dtype=np.int64)
        for j in range(L):
            node = int(lids[j])
            pad_pts[j, : sizes[j]] = indice[begin[node] : end[node]]
    out_q: list[np.ndarray] = []
    out_i: list[np.ndarray] = []
    # preallocated chunk buffers, reused across every chunk: numpy frees
    # mmap-sized temporaries back to the OS each iteration, and on this
    # class of sandboxed box a 40 MB first-touch costs SECONDS (measured
    # 0.03 s warm vs 8.8 s first-touch for one 256x20k elementwise op);
    # buffer reuse + in-place ops make the cost once-per-task, not
    # once-per-chunk
    cmax = min(chunk, n_q)
    if dense:
        dist_buf = np.empty((cmax, n))
    else:
        m = nb * leaf_max
        dist_buf = np.empty((cmax, m))
        gath_buf = np.empty((cmax, m, d))
    for s in range(0, n_q, chunk):
        qc = qpts[s : s + chunk]
        c = len(qc)
        if dense:
            dist = dist_buf[:c]
            np.matmul(qc, points.T, out=dist)  # (c, n)
            dist *= -2.0
            dist += p2[None, :]  # + |q|^2 = const/row, irrelevant to rank
            kr = min(k, n)
            for r in range(c):
                idxk = np.argpartition(dist[r], kr - 1)[:kr] if kr < n else np.arange(n)
                out_q.append(np.full(len(idxk), s + r, dtype=np.int64))
                out_i.append(idxk.astype(np.int64))
            continue
        gap = np.maximum(np.maximum(lo[None, :, :] - qc[:, None, :], qc[:, None, :] - hi[None, :, :]), 0.0)
        bound = (gap * gap).sum(axis=2)  # (c, L) exact box lower bounds
        if nb < L:
            sel = np.argpartition(bound, nb - 1, axis=1)[:, :nb]
        else:
            sel = np.broadcast_to(np.arange(L), (c, L))
        flat = pad_pts[sel].reshape(c, -1)  # (c, nb*leaf_max) point ids, -1 pad
        valid = flat >= 0
        safe = np.where(valid, flat, 0)
        # |p|^2 - 2 p.q via gather + einsum into reused buffers: one fused
        # pass, ~half the temporary traffic of a diff-square-sum chain
        gath = gath_buf[:c]
        np.take(points, safe, axis=0, out=gath)
        dist = dist_buf[:c]
        np.einsum("cmd,cd->cm", gath, qc, out=dist)
        dist *= -2.0
        dist += p2[safe]
        dist[~valid] = np.inf
        # per-row top-k: argpartition per contiguous row (fast; the axis=1
        # variant is ~9x slower — microbenchmarked)
        for r in range(c):
            nv = int(valid[r].sum())
            if nv == 0:
                continue
            kr = min(k, nv)
            idxk = np.argpartition(dist[r], kr - 1)[:kr]
            out_q.append(np.full(kr, s + r, dtype=np.int64))
            out_i.append(flat[r][idxk])
    if not out_q:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_q), np.concatenate(out_i)


def search(
    tree: dict,
    points: np.ndarray,
    query: np.ndarray,
    k: int,
    max_leaves: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """Best-first kNN in one tree; returns (row_indices, sq_dists) ascending.

    ``max_leaves`` is the candidate budget (reference maxCandidates /
    search_k, /root/reference/countrymaam.go:40-45): more leaves -> higher
    recall; >= number of leaves -> exact within this partition.
    """
    if len(tree["begin"]) == 0 or len(points) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    is_rp = tree.get("kind") == "rp"
    heap: list[tuple[float, int]] = [(0.0, 0)]
    # leaf candidates accumulate as numpy blocks; the k-th-smallest-so-far
    # (the branch-and-bound prune bound) is maintained with argpartition —
    # identical semantics to the former per-point heap, without a Python
    # loop per leaf point (the serving hot path's constant factor)
    cand_i: list[np.ndarray] = []
    cand_d: list[np.ndarray] = []
    n_cand = 0
    kth = np.inf
    leaves = 0
    while heap and leaves < max_leaves:
        bound, node = heapq.heappop(heap)
        if n_cand >= k and bound * bound >= kth:
            continue
        while tree["left"][node] != 0 or tree["right"][node] != 0:
            val = tree["split_val"][node]
            if is_rp:
                d = float(tree["normals"][node] @ query) - val
            else:
                d = query[tree["split_dim"][node]] - val
            near, far = (
                (tree["left"][node], tree["right"][node])
                if d < 0
                else (tree["right"][node], tree["left"][node])
            )
            heapq.heappush(heap, (max(abs(d), bound), int(far)))
            node = int(near)
        b, e = tree["begin"][node], tree["end"][node]
        idx = tree["indice"][b:e]
        if len(idx):
            d2 = ((points[idx] - query) ** 2).sum(axis=1)
            cand_i.append(idx)
            cand_d.append(d2)
            n_cand += len(idx)
            if n_cand >= k:
                alld = np.concatenate(cand_d) if len(cand_d) > 1 else cand_d[0]
                if len(alld) > 4 * max(k, 32):
                    # compact: keep exactly the k best (bound unchanged)
                    alli = np.concatenate(cand_i)
                    sel = np.argpartition(alld, k - 1)[:k]
                    cand_d, cand_i = [alld[sel]], [alli[sel]]
                    n_cand = k
                    kth = float(alld[sel].max())
                else:
                    kth = float(np.partition(alld, k - 1)[k - 1])
        leaves += 1
    if n_cand == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    alld = np.concatenate(cand_d) if len(cand_d) > 1 else cand_d[0]
    alli = np.concatenate(cand_i) if len(cand_i) > 1 else cand_i[0]
    ord_ = np.argsort(alld, kind="stable")[: min(k, len(alld))]
    return alli[ord_].astype(np.int64), alld[ord_].astype(np.float64)
