"""Embedding similarity search: brute force vs DuckDB oracle; LSH recall
properties (reference invariant: candidate budget >= corpus -> exact,
/root/reference/countrymaam_test.go:212)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from countrymaam_spark.operators import ann

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return (
        corpus.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .cache()
    )


def _key(rows):
    return sorted((r["query_id"], r["rk"], r["vec_id"]) for r in rows)


def test_brute_knn_matches_duckdb(spark, corpus, queries):
    got = _key(ann.brute_knn(corpus, queries, k=5).collect())
    sql = ann.brute_knn_sql(f"'{EMB}'", f"(SELECT * FROM '{EMB}' WHERE vec_id < 8)", k=5)
    want = sorted((q, rk, v) for q, rk, v, _ in duckdb.sql(sql).fetchall())
    assert got == want


def test_brute_knn_cosine_matches_duckdb(spark, corpus, queries):
    got = _key(ann.brute_knn(corpus, queries, k=5, metric="cosine").collect())
    sql = ann.brute_knn_sql(f"'{EMB}'", f"(SELECT * FROM '{EMB}' WHERE vec_id < 8)", k=5, metric="cosine")
    want = sorted((q, rk, v) for q, rk, v, _ in duckdb.sql(sql).fetchall())
    assert got == want


def test_lsh_full_budget_is_exact(spark, corpus, queries):
    """bits=1, several tables -> candidate set ~= corpus -> exact results."""
    brute = _key(ann.brute_knn(corpus, queries, k=5).collect())
    lsh = _key(ann.rp_lsh_knn(corpus, queries, k=5, n_tables=6, bits=1).collect())
    # recall@5
    b = {(q, v) for q, _, v in brute}
    l = {(q, v) for q, _, v in lsh}
    recall = len(b & l) / len(b)
    assert recall >= 0.99


def test_lsh_recall_reasonable(spark, corpus, queries):
    brute = {(q, v) for q, _, v in _key(ann.brute_knn(corpus, queries, k=5).collect())}
    lsh = {(q, v) for q, _, v in _key(ann.rp_lsh_knn(corpus, queries, k=5, n_tables=8, bits=4).collect())}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.3


def test_cosine_near_pairs_matches_duckdb(spark, corpus):
    got = {(r["id_a"], r["id_b"]) for r in ann.cosine_near_pairs(corpus, tau=0.5).collect()}
    want = {(a, b) for a, b, _ in duckdb.sql(ann.cosine_near_pairs_sql(f"'{EMB}'", tau=0.5)).fetchall()}
    assert got == want


def test_u8_knn_matches_duckdb_bit_exact(spark, corpus, queries):
    """Packed-uint8 flavor (reference linalg.go:38-53): integer distances
    must match the oracle's replicated quantization EXACTLY (values, not
    just ids — no float rounding in this dtype)."""
    got = sorted(
        (r["query_id"], r["rk"], r["vec_id"], r["dist"])
        for r in ann.brute_knn_u8(corpus, queries, k=5).collect()
    )
    sql = ann.brute_knn_u8_sql(f"'{EMB}'", f"(SELECT * FROM '{EMB}' WHERE vec_id < 8)", k=5)
    want = sorted(tuple(t) for t in duckdb.sql(sql).fetchall())
    assert got == want


def test_u8_quantize_shape_and_range(spark, corpus):
    """Each vector packs to exactly dim bytes; all byte values legal."""
    row = corpus.select(
        F.length(ann.quantize_u8(F.col("embedding"))).alias("nbytes"),
        F.size(F.col("embedding")).alias("dim"),
    ).collect()
    assert all(r["nbytes"] == r["dim"] for r in row)


def test_u8_knn_agrees_with_float_on_separated_corpus(spark, corpus, queries):
    """Quantization at 128 buckets/unit keeps the same top-1 as the float
    kernel for the fixture's well-separated vectors (sanity: the dtype
    flavor changes precision, not semantics)."""
    f32 = {(q, v) for q, rk, v in (
        (r["query_id"], r["rk"], r["vec_id"])
        for r in ann.brute_knn(corpus, queries, k=1).collect())}
    u8 = {(r["query_id"], r["vec_id"])
          for r in ann.brute_knn_u8(corpus, queries, k=1).collect()}
    assert len(f32 & u8) / len(f32) >= 0.75


def test_brute_knn_plan_shape(spark, corpus, queries):
    """Plan regression: queries broadcast against one corpus pass +
    WindowGroupLimit partial top-k — for both dtype flavors."""
    for df in (
        ann.brute_knn(corpus, queries, k=3),
        ann.brute_knn_u8(corpus, queries, k=3),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "WindowGroupLimit" in plan


def test_ivf_full_probe_is_exact(spark, corpus, queries):
    """n_probe == n_lists probes every inverted list -> exact (reference
    invariant: budget >= corpus => exact results)."""
    brute = _key(ann.brute_knn(corpus, queries, k=5).collect())
    ivf = _key(ann.ivf_knn(corpus, queries, k=5, n_lists=8, n_probe=8).collect())
    assert ivf == brute


def test_ivf_recall_monotone_in_probe(spark, corpus, queries):
    brute = {(q, v) for q, _, v in _key(ann.brute_knn(corpus, queries, k=5).collect())}

    def recall(n_probe):
        got = {(q, v) for q, _, v in _key(
            ann.ivf_knn(corpus, queries, k=5, n_lists=8, n_probe=n_probe).collect())}
        return len(brute & got) / len(brute)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 >= 0.5


def test_ivf_sample_is_not_a_prefix_on_clustered_corpus(spark):
    """Regression (r2 verdict #4): limit() takes a PREFIX — on a corpus
    sorted by cluster the old 2048-row prefix was one region of the space
    and the coarse quantizer degenerated. The seeded random sample spans the
    clusters; the prefix demonstrably does not."""
    import numpy as np

    rng = np.random.default_rng(5)
    centers = np.array([[float(10 * c), float(10 * ((c * 3) % 8))] for c in range(8)])
    rows = []
    for c in range(8):  # ORDERED by cluster: prefix = clusters 0..1 only
        for i in range(64):
            v = centers[c] + rng.normal(0, 0.3, 2)
            rows.append((c * 64 + i, [float(v[0]), float(v[1])], c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).cache()

    def coverage(cents):
        d = ((cents[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        return len(set(d.argmin(axis=1).tolist()))

    # old behavior: prefix sample -> centroids stuck in the first clusters
    pdf = emb.select("embedding").limit(64).toPandas()
    x = np.stack([np.asarray(v) for v in pdf["embedding"]])
    cov_prefix = coverage(ann._kmeans_np(x, 8, 8, seed=1))
    cov_random = coverage(ann._kmeans_centroids(emb, "embedding", 8, 64, 8, seed=1))
    assert cov_prefix <= 2  # the failure mode the fix targets
    assert cov_random >= 6  # seeded sample spans the space
    # end-to-end: recall@1 at n_probe=1 survives the clustered layout
    q = emb.filter(F.col("vec_id") % 64 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = {(r["query_id"], r["vec_id"]) for r in ann.brute_knn(emb, q, k=1).collect()}
    got = {(r["query_id"], r["vec_id"])
           for r in ann.ivf_knn(emb, q, k=1, n_lists=8, n_probe=1, sample_n=64, seed=1).collect()}
    assert len(brute & got) / len(brute) >= 0.9


def test_ivf_u8_full_probe_matches_u8_brute(spark, corpus, queries):
    """u8 dtype through the indexed path: full probe == the bit-exact u8
    brute result (reference dtype dispatch across index families)."""
    brute = _key(ann.brute_knn_u8(corpus, queries, k=5).collect())
    ivf = _key(ann.ivf_knn_u8(corpus, queries, k=5, n_lists=8, n_probe=8).collect())
    assert ivf == brute


def test_ivf_u8_recall_monotone_in_probe(spark, corpus, queries):
    brute = {(q, v) for q, _, v in _key(ann.brute_knn_u8(corpus, queries, k=5).collect())}

    def recall(n_probe):
        got = {(q, v) for q, _, v in _key(
            ann.ivf_knn_u8(corpus, queries, k=5, n_lists=8, n_probe=n_probe).collect())}
        return len(brute & got) / len(brute)

    assert recall(1) <= recall(4) <= recall(8) == 1.0


def test_ivf_persist_load_serve_roundtrip(spark, corpus, queries, tmp_path):
    """IVF Save/Load (reference index/io.go): centroids + assignments persist
    through the Manifest; a rerun skips both stages; serving from the loaded
    state equals the build-and-serve path."""
    from countrymaam_spark.plans import pipeline as PL

    out = str(tmp_path / "ivf")
    rep1 = PL.build_ivf_pipeline(spark, corpus, out, n_lists=8, seed=1)
    assert not rep1["ivf_centroids"]["skipped"] and not rep1["ivf_lists"]["skipped"]
    rep2 = PL.build_ivf_pipeline(spark, corpus, out, n_lists=8, seed=1)
    assert rep2["ivf_centroids"]["skipped"] and rep2["ivf_lists"]["skipped"]
    lists_df, cents = PL.load_ivf(spark, out)
    served = _key(
        ann.ivf_knn_from_state(lists_df, cents, queries, k=5, n_probe=8).collect()
    )
    direct = _key(
        ann.ivf_knn(corpus, queries, k=5, n_lists=8, n_probe=8, seed=1).collect()
    )
    assert served == direct


def test_ivf_param_change_invalidates_both_stages(spark, corpus, queries, tmp_path):
    """Round-3 advisor (medium): a rerun with a changed n_lists must rebuild
    BOTH stages — the assignment table's row count never changes (always =
    corpus size), so a rows-only skip would serve assignments inconsistent
    with the fresh centroids and silently lose recall at n_probe < n_lists.
    Params are one shared manifest key for the dependent stages."""
    from countrymaam_spark.plans import pipeline as PL

    out = str(tmp_path / "ivf_inval")
    PL.build_ivf_pipeline(spark, corpus, out, n_lists=8, seed=1)
    rep = PL.build_ivf_pipeline(spark, corpus, out, n_lists=4, seed=1)
    assert not rep["ivf_centroids"]["skipped"]
    assert not rep["ivf_lists"]["skipped"]
    # and the rebuilt state actually serves the n_lists=4 quantizer exactly
    lists_df, cents = PL.load_ivf(spark, out)
    assert len(cents) == 4
    served = _key(
        ann.ivf_knn_from_state(lists_df, cents, queries, k=5, n_probe=4).collect()
    )
    direct = _key(
        ann.ivf_knn(corpus, queries, k=5, n_lists=4, n_probe=4, seed=1).collect()
    )
    assert served == direct


def test_ivf_snapshot_partition_pruning(spark, corpus, queries, tmp_path):
    """Round-3 verdict #7: the persisted assignment table is directory-
    partitioned by list_id, so (a) a literal probe filter prunes partitions
    at plan time and (b) the serving equi-join gets a dynamic-partition-
    pruning filter — probes never scan unprobed lists' files."""
    from countrymaam_spark.plans import pipeline as PL

    out = str(tmp_path / "ivf_part")
    PL.build_ivf_pipeline(spark, corpus, out, n_lists=8, seed=1)
    import os as _os
    part_dirs = [d for d in _os.listdir(_os.path.join(out, "ivf_lists")) if d.startswith("list_id=")]
    assert len(part_dirs) == 8
    lists_df, cents = PL.load_ivf(spark, out)
    static = lists_df.filter(F.col("list_id") == 3)
    splan = static._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in splan and "list_id" in splan
    served = ann.ivf_knn_from_state(lists_df, cents, queries, k=5, n_probe=2)
    jplan = served._jdf.queryExecution().executedPlan().toString()
    # the probed-list IN filter lands in the snapshot scan's PartitionFilters
    # (plan-time pruning; DPP declines on the stats-less UDF probe side)
    import re as _re
    assert _re.search(r"PartitionFilters: \[[^\]]*list_id", jplan)
    # and pruned serving equals unpruned serving
    unpruned = ann.ivf_knn_from_state(
        lists_df, cents, queries, k=5, n_probe=2, prune_lists=False
    )
    assert _key(served.collect()) == _key(unpruned.collect())


def test_ivf_append_pipeline_equals_full_reassign(spark, corpus, queries, tmp_path):
    """Incremental IVF append: the quantizer is frozen, so appending must be
    bit-equivalent to re-assigning the FULL corpus against the same
    centroids — one narrow map over the delta plus a parquet append into the
    list_id-partitioned snapshot (no k-means re-run, no corpus re-shuffle).
    Serving from the appended state at full probe is exact, the partition
    layout survives, and a subsequent build re-run resumes the appended
    table (manifest rows + hash refreshed)."""
    import os

    from countrymaam_spark.plans import pipeline as PL

    out = str(tmp_path / "ivf_app")
    old = corpus.filter(F.col("vec_id") % 5 != 0)
    new = corpus.filter(F.col("vec_id") % 5 == 0)
    PL.build_ivf_pipeline(spark, old, out, n_lists=8, seed=1)
    rep = PL.append_ivf_pipeline(spark, new, out)
    assert rep["ivf_lists"]["appended"] == new.count()
    assert rep["ivf_lists"]["rows"] == corpus.count()

    lists_df, cents = PL.load_ivf(spark, out)
    # bit-equivalence: appended assignment table == assign-all with the same
    # frozen centroids
    got = sorted(
        (r["cid"], r["list_id"]) for r in lists_df.select("cid", "list_id").collect()
    )
    want = sorted(
        (r["cid"], r["list_id"])
        for r in ann.ivf_assignments(corpus, cents).select("cid", "list_id").collect()
    )
    assert got == want
    # the append preserved directory partitioning (probe pruning intact)
    part_dirs = [
        d for d in os.listdir(os.path.join(out, "ivf_lists")) if d.startswith("list_id=")
    ]
    assert len(part_dirs) >= 1 and all("=" in d for d in part_dirs)
    # serving from appended state at full probe == brute force over ALL rows
    served = {
        (r["query_id"], r["vec_id"])
        for r in ann.ivf_knn_from_state(lists_df, cents, queries, k=5, n_probe=8).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in ann.brute_knn(corpus, queries, k=5).collect()
    }
    assert served == exact
    # resume: a build re-run with the original params accepts the appended
    # snapshot (refreshed manifest) instead of rebuilding
    rep2 = PL.build_ivf_pipeline(spark, old, out, n_lists=8, seed=1)
    assert rep2["ivf_lists"]["skipped"] and rep2["ivf_centroids"]["skipped"]
    assert rep2["ivf_lists"]["rows"] == corpus.count()


# --- exact IVF range search ---------------------------------------------------


def test_range_search_matches_brute_oracle(spark, corpus, queries):
    """Triangle-inequality list pruning never loses a row: the pruned probe
    equals the brute threshold scan exactly, at two radii."""
    for tau in (1.1, 1.35):
        got = sorted(
            tuple(r)
            for r in ann.ivf_range_search(corpus, queries, tau=tau, n_lists=8).collect()
        )
        want = sorted(
            tuple(t)
            for t in duckdb.sql(
                ann.range_search_sql(
                    f"'{EMB}'", f"(SELECT * FROM '{EMB}' WHERE vec_id < 8)", tau=tau
                )
            ).fetchall()
        )
        assert got == want, tau
    assert len(got) > 0


def test_range_search_prunes_and_handles_empty(spark, corpus):
    """A query far from the whole corpus keeps ZERO candidate lists (the
    prune bound kills every list) and emits zero rows — no scan, no crash;
    a tiny tau on a real query prunes to a strict subset of lists."""
    import numpy as np

    dim = len(corpus.select("embedding").first()[0])
    far = spark.createDataFrame(
        [(999999, [100.0] * dim)], "query_id long, query_vec array<float>"
    )
    got = ann.ivf_range_search(corpus, far, tau=1.0, n_lists=8).collect()
    assert got == []
    # prune evidence: the candidate-list UDF keeps < n_lists lists for a
    # small radius around an actual corpus vector
    cents = ann._kmeans_centroids(corpus, "embedding", 8, 2048, 8, 42)
    asg_radii = np.zeros(8)  # radii of empty lists stay 0 -> prunable
    q = corpus.limit(1).select(
        ann._lists_within(F.col("embedding"), cents, asg_radii, 0.5).alias("ls")
    )
    kept = len(q.first()["ls"])
    assert kept < 8


def test_range_search_u8_matches_brute_oracle(spark, corpus, queries):
    """u8 range search is WHOLLY integer at the compare: pruned probe equals
    the brute integer threshold scan bit-for-bit."""
    for tau_sq in (20000, 24000):
        got = sorted(
            tuple(r)
            for r in ann.ivf_range_search_u8(
                corpus, queries, tau_sq=tau_sq, n_lists=8
            ).collect()
        )
        want = sorted(
            tuple(t)
            for t in duckdb.sql(
                ann.range_search_u8_sql(
                    f"'{EMB}'", f"(SELECT * FROM '{EMB}' WHERE vec_id < 8)",
                    tau_sq=tau_sq,
                )
            ).fetchall()
        )
        assert got == want, tau_sq
    assert len(got) > 0


def test_multiprobe_recall_dominates_single_probe(spark, corpus, queries):
    """Multi-probe at the same table count strictly improves recall (the
    flipped low-margin buckets are extra candidates, a superset), and the
    (8 tables, 5 probes, 4 bits) config is EXACT on the fixture — the
    config the driver row pins against the brute oracle."""
    exact = _key(ann.brute_knn(corpus, queries, k=5).collect())

    def recall(nt, npb):
        got = set(
            (r["query_id"], r["vec_id"])
            for r in ann.rp_lsh_knn(
                corpus, queries, k=5, n_tables=nt, bits=4, n_probes=npb
            ).collect()
        )
        want = set((q, v) for q, _, v in exact)
        return len(got & want) / len(want)

    r1, r3, r5 = recall(4, 1), recall(4, 3), recall(4, 5)
    assert r1 <= r3 <= r5
    assert r5 > r1  # probes actually bought recall at fixed table count
    assert _key(
        ann.rp_lsh_knn(corpus, queries, k=5, n_tables=8, bits=4, n_probes=5).collect()
    ) == exact


def test_lsh_state_round_trip_and_append(spark, corpus, queries, tmp_path):
    """build_lsh_pipeline -> load_lsh -> rp_lsh_knn_from_state is
    bit-identical to the in-session path (multi-probe included); appending
    the second half onto a half-built snapshot equals the full build; a
    re-run with identical params SKIPS the signing stage."""
    from countrymaam_spark.plans import pipeline as P

    want = _key(
        ann.rp_lsh_knn(corpus, queries, k=5, n_tables=8, bits=4, n_probes=3).collect()
    )
    out = str(tmp_path / "lsh_full")
    r1 = P.build_lsh_pipeline(spark, corpus, out, n_tables=8, bits=4)
    assert not r1["lsh_signatures"]["skipped"]
    c_sig, planes = P.load_lsh(spark, out)
    got = _key(
        ann.rp_lsh_knn_from_state(c_sig, planes, queries, k=5, n_probes=3).collect()
    )
    assert got == want
    r2 = P.build_lsh_pipeline(spark, corpus, out, n_tables=8, bits=4)
    assert r2["lsh_signatures"]["skipped"]  # resume verified, not rebuilt

    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)
    out2 = str(tmp_path / "lsh_inc")
    P.build_lsh_pipeline(spark, half_a, out2, n_tables=8, bits=4)
    P.append_lsh_pipeline(spark, half_b, out2)
    c_sig2, planes2 = P.load_lsh(spark, out2)
    got2 = _key(
        ann.rp_lsh_knn_from_state(c_sig2, planes2, queries, k=5, n_probes=3).collect()
    )
    assert got2 == want
