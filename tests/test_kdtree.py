"""kd-tree kernel: exactness at full budget, budget monotonicity,
determinism, degenerate inputs (ports the reference's golden-test strategy,
countrymaam_test.go:183-225 / 230-277)."""

import numpy as np
import pytest

from countrymaam_spark.operators import kdtree


def brute(points, q, k):
    d2 = ((points - q) ** 2).sum(axis=1)
    order = np.argsort(d2, kind="stable")[:k]
    return set(order.tolist())


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    return rng.normal(0, 1, (2000, 2))


def test_full_budget_exact(cloud):
    tree = kdtree.build(cloud, leaf_size=16, seed=1)
    n_leaves = int((tree["left"] == 0).sum())
    for qi in range(10):
        q = cloud[qi] + 0.01
        idx, d = kdtree.search(tree, cloud, q, k=5, max_leaves=n_leaves + 1)
        assert set(idx.tolist()) == brute(cloud, q, 5)
        assert list(d) == sorted(d)


def test_budget_monotone_recall(cloud):
    tree = kdtree.build(cloud, leaf_size=16, seed=1)
    recalls = []
    for budget in (1, 4, 16, 64, 256):
        hits = 0
        for qi in range(20):
            q = cloud[qi] * 1.01
            idx, _ = kdtree.search(tree, cloud, q, k=5, max_leaves=budget)
            hits += len(set(idx.tolist()) & brute(cloud, q, 5))
        recalls.append(hits / (20 * 5))
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0


def test_deterministic(cloud):
    a = kdtree.build(cloud, seed=3)
    b = kdtree.build(cloud, seed=3)
    for k in a:
        assert np.array_equal(a[k], b[k])
    c = kdtree.build(cloud, seed=4)
    assert not np.array_equal(a["indice"], c["indice"])


def test_empty_and_tiny():
    empty = kdtree.build(np.empty((0, 2)), seed=1)
    idx, d = kdtree.search(empty, np.empty((0, 2)), np.array([0.0, 0.0]), k=3)
    assert len(idx) == 0
    one = np.array([[1.0, 2.0]])
    t = kdtree.build(one, seed=1)
    idx, d = kdtree.search(t, one, np.array([0.0, 0.0]), k=3)
    assert idx.tolist() == [0]


def test_duplicate_points_degenerate_split():
    pts = np.ones((200, 2))  # all identical -> every split degenerate
    t = kdtree.build(pts, leaf_size=16, seed=1)
    idx, d = kdtree.search(t, pts, np.array([1.0, 1.0]), k=5, max_leaves=1000)
    assert len(idx) == 5 and np.allclose(d, 0.0)


def test_rp_tree_full_budget_exact(cloud):
    tree = kdtree.build(cloud, leaf_size=16, seed=2, kind="rp")
    n_leaves = int((tree["left"] == 0).sum())
    for qi in range(10):
        q = cloud[qi] + 0.01
        idx, d = kdtree.search(tree, cloud, q, k=5, max_leaves=n_leaves + 1)
        assert set(idx.tolist()) == brute(cloud, q, 5)


def test_rp_tree_budget_recall(cloud):
    tree = kdtree.build(cloud, leaf_size=16, seed=2, kind="rp")
    hits = 0
    for qi in range(20):
        q = cloud[qi] * 1.01
        idx, _ = kdtree.search(tree, cloud, q, k=5, max_leaves=16)
        hits += len(set(idx.tolist()) & brute(cloud, q, 5))
    assert hits / 100 >= 0.5  # oblique planes prune well on gaussian data


def test_rp_deterministic(cloud):
    a = kdtree.build(cloud, seed=5, kind="rp")
    b = kdtree.build(cloud, seed=5, kind="rp")
    for k in ("indice", "split_val", "normals"):
        assert np.array_equal(a[k], b[k])


def test_serde_roundtrip(cloud):
    t = kdtree.build(cloud, seed=9)
    t2 = kdtree.deserialize(kdtree.serialize(t))
    for k in t:
        assert np.array_equal(t[k], t2[k])


def test_search_batch_full_budget_exact(cloud):
    """Batched descent at full budget == brute force, for every query."""
    tree = kdtree.build(cloud, leaf_size=16, seed=1)
    n_leaves = int(((tree["left"] == 0) & (tree["right"] == 0)).sum())
    qpts = cloud[:32] + 0.01
    bq, bi = kdtree.search_batch(tree, cloud, qpts, k=5, max_leaves=n_leaves + 1)
    per = {}
    for r, i in zip(bq, bi):
        per.setdefault(int(r), set()).add(int(i))
    for r in range(len(qpts)):
        assert per[r] == brute(cloud, qpts[r], 5)


def test_search_batch_recall_at_least_per_query_search(cloud):
    """At a finite budget the batched box-bound leaf order must match or beat
    the per-query inherited-bound order (the box bound is tighter)."""
    tree = kdtree.build(cloud, leaf_size=16, seed=1)
    qpts = cloud[100:140] + 0.005
    budget = 8
    bq, bi = kdtree.search_batch(tree, cloud, qpts, k=5, max_leaves=budget)
    per = {}
    for r, i in zip(bq, bi):
        per.setdefault(int(r), set()).add(int(i))
    rec_batch, rec_single = 0, 0
    for r in range(len(qpts)):
        want = brute(cloud, qpts[r], 5)
        idx, _ = kdtree.search(tree, cloud, qpts[r], k=5, max_leaves=budget)
        rec_batch += len(per.get(r, set()) & want)
        rec_single += len(set(idx.tolist()) & want)
    assert rec_batch >= rec_single


def test_search_batch_rp_fallback(cloud):
    """rp trees have no box bounds: search_batch falls back to the per-query
    path and stays exact at full budget."""
    tree = kdtree.build(cloud, leaf_size=16, seed=3, kind="rp")
    n_leaves = int(((tree["left"] == 0) & (tree["right"] == 0)).sum())
    qpts = cloud[:8] + 0.01
    bq, bi = kdtree.search_batch(tree, cloud, qpts, k=3, max_leaves=n_leaves + 1)
    per = {}
    for r, i in zip(bq, bi):
        per.setdefault(int(r), set()).add(int(i))
    for r in range(len(qpts)):
        assert per[r] == brute(cloud, qpts[r], 3)


def test_payload_pack_roundtrip_and_v1_fallback(cloud):
    """Serving-blob payload v2: compact arrays + compressed urls must
    round-trip exactly (search numerics: split_val/coords float64
    untouched), decode only selected candidate urls, read pre-existing v1
    pickle blobs, and be deterministic (blob builds stay a pure function of
    (row set, seed))."""
    n = len(cloud)
    lat = cloud[:, 0]
    lon = cloud[:, 1]
    urls = np.array([f"https://u{i:05d}.example/p{i}" for i in range(n)], dtype=object)
    trees = [
        kdtree.build(cloud, leaf_size=16, seed=2, kind="kd"),
        kdtree.build(cloud, leaf_size=16, seed=3, kind="rp"),
    ]
    blob = kdtree.pack_payload(trees, urls, lat, lon, 0.7)
    assert blob == kdtree.pack_payload(trees, urls, lat, lon, 0.7)
    # materially smaller than the v1 pickle of the same payload
    v1 = kdtree.serialize(
        {"trees": trees, "urls": urls, "lat": lat, "lon": lon, "cos0": 0.7}
    )
    assert len(blob) < 0.7 * len(v1)

    for p in (kdtree.unpack_payload(blob), kdtree.unpack_payload(v1)):
        assert p["cos0"] == 0.7
        assert np.array_equal(p["lat"], lat) and np.array_equal(p["lon"], lon)
        isel = np.array([0, 3, n - 1])
        assert kdtree.decode_urls(p["url_buf"], p["url_off"], isel) == [
            str(urls[i]) for i in isel
        ]
        for t_in, t_out in zip(trees, p["trees"]):
            for key in ("indice", "begin", "end", "left", "right", "split_dim"):
                assert np.array_equal(t_in[key], t_out[key]), key
            assert np.array_equal(t_in["split_val"], t_out["split_val"])
            if t_in["kind"] == "rp":
                assert np.array_equal(t_in["normals"], t_out["normals"])
            # budgeted batch search over the unpacked tree: identical
            # candidates (int downcasts must not perturb descent)
            qpts = cloud[:6] + 0.01
            a = kdtree.search_batch(t_in, cloud, qpts, k=3, max_leaves=4)
            b = kdtree.search_batch(t_out, cloud, qpts, k=3, max_leaves=4)
            assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_payload_urls_adversarial_roundtrip():
    """The packed url buffer must survive adversarial url content: unicode
    (IDN paths), empty strings, embedded newlines/NULs, 4-byte UTF-8, and
    multi-KB outliers — the (buffer, offsets) form indexes by BYTE offsets,
    so decode must never depend on separators or ASCII-ness."""
    urls = np.array(
        [
            "https://example.com/",
            "",  # empty url (degenerate row)
            "https://xn--bcher-kva.example/bücher/straße",
            "https://example.jp/東京/\U0001f30d",
            "https://weird.example/a\nb\x00c",
            "https://long.example/" + "x" * 4096,
        ],
        dtype=object,
    )
    n = len(urls)
    lat = np.linspace(-1.0, 1.0, n)
    lon = np.linspace(10.0, 11.0, n)
    pts = np.stack([lat, lon], axis=1)
    tree = kdtree.build(pts, leaf_size=2, seed=7)
    blob = kdtree.pack_payload([tree], urls, lat, lon, 1.0)
    p = kdtree.unpack_payload(blob)
    every = np.arange(n)
    assert kdtree.decode_urls(p["url_buf"], p["url_off"], every) == list(urls)
    # v1 fallback sees the same adversarial content
    v1 = kdtree.serialize(
        {"trees": [tree], "urls": urls, "lat": lat, "lon": lon, "cos0": 1.0}
    )
    p1 = kdtree.unpack_payload(v1)
    assert kdtree.decode_urls(p1["url_buf"], p1["url_off"], every) == list(urls)
