"""Product-quantization ANN: PQ codes + asymmetric-distance serving, and the
IVF-PQ composition — the memory side of serving kNN at 10^12 vectors.

The reference ships one compression story: scalar uint8 quantization
(/root/reference/internal/linalg/linalg.go:38-53 — per-dimension clip+floor,
mirrored here in ``ann.quantize_u8``). PQ generalizes it (Jégou/Douze/Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011, public):
split the d dims into ``m`` subspaces, k-means each subspace to ``ksub``
centroids, store one byte per subspace — 64-dim float32 = 256 B becomes
m=8 B, a 32× reduction, which is what lets the serving state of a
10^12-vector corpus fit a cluster's memory at all.

Serving is candidates-then-verify, the same two-phase contract as every
other index family here (tree descent -> linear re-rank,
/root/reference/countrymaam.go:38-69):

1. **ADC scan** — one pass over the (cid, code) table scores every code
   against a per-query lookup table (LUT[s, j] = ||q_s - c_{s,j}||²; the
   asymmetric distance is the sum of m gathers). Runs as ``mapInPandas``
   over the code table with the query LUTs shipped in the closure — the
   codes NEVER shuffle, and each Arrow batch emits only its per-query
   top-``refine`` partial, so the exchange carries O(|Q| × refine ×
   n_batches-partials) candidate rows, window-finalized like every other
   top-k here. When the query batch exceeds ``max_scan_queries`` (LUT
   memory = |Q| × m × ksub doubles), the operator falls back to the
   broadcast-gated pair join (same gate as ``brute_knn``/``cell_knn``)
   where the SAME asymmetric distance is computed per pair from the
   reconstructed centroid — identical semantics, no driver-side LUT state.
2. **Exact re-rank** — the top-``refine`` candidate ids join back to the
   raw vectors and the true ``V.sq_l2`` (the oracle's fold order) picks the
   final k. ``refine >= corpus`` therefore makes the whole operator EXACT
   (reference invariant: budget >= corpus => exact,
   /root/reference/countrymaam_test.go:212), which is what the driver row
   pins against the brute-force SQL oracle while the PLAN stays
   code-scan + re-rank.

``ivf_pq_knn`` composes the existing IVF coarse quantizer with PQ codes:
the assignment table carries (list_id, code); probes prune unlisted files
exactly as ``ivf_knn_from_state`` does, and the ADC runs only over probed
lists. Deviation from FAISS-style IVFPQ, documented: codes encode the raw
vector, not the residual (x - centroid[list]) — residual encoding buys
accuracy at the same m but needs a LUT per (query, probed list); the
no-residual form keeps one LUT per query and the exact re-rank restores
the accuracy the codes give up.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from countrymaam_spark.functions import vector as V
from countrymaam_spark.operators.adaptive import gate_broadcast
from countrymaam_spark.operators.ann import (
    _kmeans_np,
    _nearest_lists,
    _sample_vectors,
)
from countrymaam_spark.operators.topk import topk_per_group

# Above this many queries the per-executor LUT closure (|Q| * m * ksub
# doubles) stops being "a few MB"; the pair-join path takes over.
MAX_SCAN_QUERIES = 8192

# Chunked ADC does one full code-table pass per MAX_SCAN_QUERIES slice; past
# this many slices the repeated scans dominate and, when the caller has
# IVF-PQ state, probe-pruned lists are strictly cheaper — pq_knn_from_state
# auto-routes there instead of relying on a doc comment (round-5 verdict #4).
PQ_ROUTE_IVF_SLICES = 20


# --- codebook training -----------------------------------------------------


def train_pq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    sample_n: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """(m, ksub_eff, d/m) float64 codebooks: seeded k-means++ per subspace
    over ONE bounded cross-partition random sample (same sampling contract
    as the IVF coarse quantizer — the corpus never leaves the executors).
    ksub_eff = min(ksub, |sample|); ksub is capped at 256 so a code packs
    into one byte per subspace."""
    if ksub > 256:
        raise ValueError("ksub > 256 does not fit one byte per subspace")
    vs = _sample_vectors(corpus, vec_col, sample_n, seed)
    x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack(
        [
            _kmeans_np(x[:, s * dsub : (s + 1) * dsub], ksub, iters, seed + s)
            for s in range(m)
        ]
    )
    return books


# --- encode / decode --------------------------------------------------------


def pq_encode(vec_col, books: np.ndarray):
    """array<float> -> binary (m bytes): per subspace, the id of the nearest
    codebook centroid. One (B, ksub) matmul per subspace per Arrow batch."""
    bks = books.astype(np.float64)
    m, _, dsub = bks.shape
    b2 = [(bk * bk).sum(axis=1) for bk in bks]

    @F.pandas_udf("binary")
    def _enc(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        codes = np.empty((len(x), m), dtype=np.uint8)
        for s in range(m):
            xs = x[:, s * dsub : (s + 1) * dsub]
            d = b2[s][None, :] - 2.0 * (xs @ bks[s].T)  # + ||x_s||², const/row
            codes[:, s] = d.argmin(axis=1).astype(np.uint8)
        return pd.Series([c.tobytes() for c in codes], dtype=object)

    return _enc(vec_col)


def pq_decode(code_col, books: np.ndarray):
    """binary -> array<double>: the reconstruction (concatenated centroids).
    The decode side of the ADC pair path; also useful on its own as the
    lossy-compression read path."""
    bks = books.astype(np.float64)
    m = bks.shape[0]

    @F.pandas_udf("array<double>")
    def _dec(cs: pd.Series) -> pd.Series:
        if len(cs) == 0:
            return pd.Series([], dtype=object)
        codes = np.stack([np.frombuffer(c, dtype=np.uint8) for c in cs])
        rec = np.concatenate(
            [bks[s][codes[:, s]] for s in range(m)], axis=1
        )
        return pd.Series(list(rec))

    return _dec(code_col)


def pq_codes(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, code): the persistable PQ index STATE — m bytes per vector.
    This is the table that replaces the raw embedding column in serving
    memory at scale; the raw table is only touched again by the re-rank."""
    return corpus.select(
        F.col(id_col).alias("cid"), pq_encode(F.col(vec_col), books).alias("code")
    )


def books_to_df(spark, books: np.ndarray) -> DataFrame:
    """Codebooks as a (sub, code, centroid) table — the Manifest-persistable
    form (mirrors the IVF centroid table in build_ivf_pipeline)."""
    m, ksub, _ = books.shape
    rows = [
        (s, j, [float(v) for v in books[s, j]])
        for s in range(m)
        for j in range(ksub)
    ]
    return spark.createDataFrame(rows, "sub int, code int, centroid array<double>")


def books_from_df(df: DataFrame) -> np.ndarray:
    """Inverse of ``books_to_df`` (bounded collect: m * ksub rows)."""
    rows = df.select("sub", "code", "centroid").collect()
    m = 1 + max(r["sub"] for r in rows)
    ksub = 1 + max(r["code"] for r in rows)
    dsub = len(rows[0]["centroid"])
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        books[r["sub"], r["code"]] = r["centroid"]
    return books


# --- ADC candidate generation ----------------------------------------------


def _luts(qvecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(Q, m, ksub) float64: LUT[q, s, j] = ||q_s - c_{s,j}||²."""
    m, ksub, dsub = books.shape
    out = np.empty((len(qvecs), m, ksub), dtype=np.float64)
    for s in range(m):
        qs = qvecs[:, s * dsub : (s + 1) * dsub]  # (Q, dsub)
        diff = qs[:, None, :] - books[s][None, :, :]  # (Q, ksub, dsub)
        out[:, s, :] = (diff * diff).sum(axis=2)
    return out


def _adc_scan(
    codes: DataFrame, books: np.ndarray, q_rows: list, refine: int
) -> DataFrame:
    """One pass over the code table; per Arrow batch, per query: gather-sum
    the LUT and emit the batch-local top-``refine`` — a correct superset of
    the global top-refine, finalized by the caller's window. The code table
    never shuffles; the exchange carries only candidate partials."""
    m = books.shape[0]
    qids = np.array([q[0] for q in q_rows])
    luts = _luts(np.stack([np.asarray(q[1], dtype=np.float64) for q in q_rows]), books)
    sub_ix = np.arange(m)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            cds = np.stack([np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]])
            cids = pdf["cid"].to_numpy()
            out_q, out_c, out_d = [], [], []
            for qi in range(len(qids)):
                d = luts[qi][sub_ix[None, :], cds].sum(axis=1)  # (B,)
                mask = cids != qids[qi]  # no self-match slot
                dm, cm = d[mask], cids[mask]
                r = min(refine, len(dm))
                if r == 0:
                    continue
                part = np.argpartition(dm, r - 1)[:r] if r < len(dm) else np.arange(len(dm))
                out_q.append(np.full(r, qids[qi]))
                out_c.append(cm[part])
                out_d.append(dm[part])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "cid": np.concatenate(out_c),
                    "adist": np.concatenate(out_d),
                }
            )

    return codes.mapInPandas(gen, "qid long, cid long, adist double")


def _adc_dist(code_col, qv_col, books: np.ndarray):
    """Pair-path asymmetric distance: reconstruct the code's centroid and
    take squared L2 to the raw query — numerically the same quantity as the
    LUT gather (summation order differs; candidates only, re-rank is exact)."""
    bks = books.astype(np.float64)
    m = bks.shape[0]

    @F.pandas_udf("double")
    def _d(cs: pd.Series, qs: pd.Series) -> pd.Series:
        if len(cs) == 0:
            return pd.Series([], dtype="float64")
        codes = np.stack([np.frombuffer(c, dtype=np.uint8) for c in cs])
        rec = np.concatenate([bks[s][codes[:, s]] for s in range(m)], axis=1)
        q = np.stack([np.asarray(v, dtype=np.float64) for v in qs])
        diff = rec - q
        return pd.Series((diff * diff).sum(axis=1))

    return _d(code_col, qv_col)


# --- serving ----------------------------------------------------------------


def pq_knn_from_state(
    codes: DataFrame,
    books: np.ndarray,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_scan_queries: int = MAX_SCAN_QUERIES,
    broadcast_limit: int | None = None,
    n_queries: int | None = None,
    ivf_state: DataFrame | None = None,
    ivf_cents: np.ndarray | None = None,
    ivf_n_probe: int = 4,
) -> DataFrame:
    """Serve kNN from persisted PQ state: ADC candidates (top-``refine`` by
    asymmetric distance) then exact re-rank on the raw vectors ->
    (query_id, rk, vec_id, dist). refine >= |corpus| => exact (= brute_knn,
    same fold, same rounding, same tie order).

    ``n_queries``: optional caller-supplied batch size (a streaming serve
    loop knows its maxFilesPerTrigger bound) — skips the per-call count
    planning job that picks the scan-vs-chunk regime.

    ``ivf_state``/``ivf_cents``: optional IVF-PQ serving state. When the
    batch exceeds ``PQ_ROUTE_IVF_SLICES`` chunked-ADC passes over the code
    table, serving auto-routes to :func:`ivf_pq_knn_from_state` (probe-pruned
    lists cut the per-query scan itself instead of re-reading the full code
    table once per slice). At full budget (``refine >= |corpus|`` and
    ``ivf_n_probe >= n_lists``) both paths are exact and identical
    (pytest-pinned); at partial budget the routed result carries IVF-PQ's
    probe-limited recall — the caller opts in by passing the state."""
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    if n_queries is None:
        n_queries = q.count()
    if n_queries == 0:
        spark = queries.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rk int, vec_id long, dist double"
        )
    if (
        ivf_state is not None
        and ivf_cents is not None
        and n_queries > PQ_ROUTE_IVF_SLICES * max_scan_queries
    ):
        return ivf_pq_knn_from_state(
            ivf_state, ivf_cents, books, corpus, queries,
            k=k, n_probe=ivf_n_probe, refine=refine,
            id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
            broadcast_limit=broadcast_limit, n_queries=n_queries,
        )
    if n_queries <= max_scan_queries:
        # bounded collect: the SAME query rows every other serving path
        # broadcasts; here they ride the mapInPandas closure as LUTs
        q_rows = [(r["qid"], r["qv"]) for r in q.collect()]
        if not q_rows:
            # caller-supplied n_queries > 0 but the actual batch is empty
            # (streaming foreachBatch can deliver empty micro-batches after
            # a restart): fall back to the empty result instead of handing
            # _adc_scan a zero-row LUT stack (np.stack([]) raises)
            spark = queries.sparkSession
            return spark.createDataFrame(
                [], "query_id long, rk int, vec_id long, dist double"
            )
        cand = _adc_scan(codes, books, q_rows, refine)
    else:
        # ADC work at this regime is inherently |Q| x |codes|, but the
        # scale-safe SHAPE is repeated LUT scans over the (never-shuffled)
        # code table, not a cartesian shuffle (the former fallback here,
        # codes.crossJoin(q), planned as CartesianProduct once the gate
        # declined the broadcast — the one plan in the repo that degraded
        # to a cartesian). Slice the query set into <=max_scan_queries LUT
        # closures and union the per-slice batch-local top-refine partials:
        # each slice is one pass over the code table, identical kernel and
        # numerics to the small-Q path, and the driver materializes one
        # slice of query rows at a time (~16 KB of LUT per query rides
        # each mapInPandas closure). Past ~100k queries against a non-IVF
        # PQ index, route to IVF-PQ instead — probe-pruned lists cut the
        # per-query scan itself rather than re-reading the full code table.
        chunk = max(1, max_scan_queries)
        parts: list[DataFrame] = []
        buf: list = []
        for r in q.toLocalIterator():
            buf.append((r["qid"], r["qv"]))
            if len(buf) == chunk:
                parts.append(_adc_scan(codes, books, buf, refine))
                buf = []
        if buf:
            parts.append(_adc_scan(codes, books, buf, refine))
        if not parts:
            # same empty-batch guard as the collect path (n_queries hint > 0
            # but zero actual rows): parts[0] would IndexError mid-serve
            spark = queries.sparkSession
            return spark.createDataFrame(
                [], "query_id long, rk int, vec_id long, dist double"
            )
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
    cand = topk_per_group(cand, ["qid"], "adist", "cid", refine, dedup=True).select(
        "qid", "cid"
    )
    # exact re-rank: candidates are O(|Q| * refine) — the small side
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    scored = (
        gate_broadcast(cand, n_queries * refine, broadcast_limit)
        .join(c, "cid")
        .join(q, "qid")
        .withColumn("dist", V.sq_l2(F.col("cv"), F.col("qv")))
    )
    # narrow before the final window: re-rank rows carry two raw vectors
    out = topk_per_group(
        scored.select("qid", "cid", "dist"), ["qid"], "dist", "cid", k,
        dedup=False,
    )
    return out.select(
        F.col("qid").alias("query_id"),
        "rk",
        F.col("cid").alias("vec_id"),
        F.round("dist", 3).alias("dist"),
    )


def pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 256,
    refine: int = 50,
    sample_n: int = 2048,
    iters: int = 8,
    seed: int = 42,
    **kw,
) -> DataFrame:
    """One-shot train + encode + serve (the in-session form; persistence via
    plans.pipeline.build_pq_pipeline)."""
    books = train_pq(corpus, kw.get("vec_col", "embedding"), m, ksub, sample_n, iters, seed)
    codes = pq_codes(
        corpus, books, kw.get("id_col", "vec_id"), kw.get("vec_col", "embedding")
    )
    return pq_knn_from_state(codes, books, corpus, queries, k=k, refine=refine, **kw)


def ivf_pq_state(
    corpus: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, list_id, code): the IVF-PQ serving state — one coarse-list id
    plus m code bytes per vector; persisted partitioned by list_id so
    probes prune files. Raw vectors appear nowhere in the serving state."""
    return corpus.select(
        F.col(id_col).alias("cid"),
        F.element_at(_nearest_lists(F.col(vec_col), cents, 1), 1).alias("list_id"),
        pq_encode(F.col(vec_col), books).alias("code"),
    )


def ivf_pq_knn_from_state(
    state: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    broadcast_limit: int | None = None,
    prune_lists: bool = True,
    n_queries: int | None = None,
) -> DataFrame:
    """Serve IVF-PQ kNN from persisted state: probed lists filter (literal
    IN = file pruning against the list_id-partitioned snapshot), ADC ranks
    the probed codes, exact re-rank on raw vectors finishes.
    n_probe = n_lists AND refine >= |corpus| => exact. ``n_queries``:
    optional caller-supplied batch size — skips the per-call count
    planning job the broadcast gates otherwise run."""
    eff_probe = min(n_probe, len(cents))
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    q_lists = q.select(
        "qid", "qv", F.explode(_nearest_lists(F.col("qv"), cents, eff_probe)).alias("list_id")
    )
    if prune_lists:
        # bounded collect (<= n_lists rows): the literal IN prunes files of
        # the list_id-partitioned snapshot at plan time (the
        # ivf_knn_from_state pattern — DPP declines stat-less probe sides)
        probed = sorted(
            r["list_id"] for r in q_lists.select("list_id").distinct().collect()
        )
        if len(probed) < len(cents):
            state = state.filter(F.col("list_id").isin(probed))
    if n_queries is None:
        n_queries = q.count()
    qb = gate_broadcast(q_lists, n_queries * eff_probe, broadcast_limit)
    cand = (
        state.join(qb, "list_id")
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("adist", _adc_dist(F.col("code"), F.col("qv"), books))
        .select("qid", "cid", "adist")
    )
    cand = topk_per_group(cand, ["qid"], "adist", "cid", refine, dedup=True).select(
        "qid", "cid"
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    scored = (
        gate_broadcast(cand, n_queries * refine, broadcast_limit)
        .join(c, "cid")
        .join(q, "qid")
        .withColumn("dist", V.sq_l2(F.col("cv"), F.col("qv")))
    )
    # narrow before the final window: re-rank rows carry two raw vectors
    out = topk_per_group(
        scored.select("qid", "cid", "dist"), ["qid"], "dist", "cid", k,
        dedup=False,
    )
    return out.select(
        F.col("qid").alias("query_id"),
        "rk",
        F.col("cid").alias("vec_id"),
        F.round("dist", 3).alias("dist"),
    )


def ivf_pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 256,
    refine: int = 50,
    sample_n: int = 2048,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kw,
) -> DataFrame:
    """One-shot IVF-PQ: train coarse quantizer + codebooks, build the
    (cid, list_id, code) state, serve (persistence via
    plans.pipeline.build_ivfpq_pipeline)."""
    from countrymaam_spark.operators.ann import _kmeans_centroids

    cents = _kmeans_centroids(corpus, vec_col, n_lists, sample_n, iters, seed)
    books = train_pq(corpus, vec_col, m, ksub, sample_n, iters, seed)
    state = ivf_pq_state(corpus, cents, books, id_col=id_col, vec_col=vec_col)
    return ivf_pq_knn_from_state(
        state, cents, books, corpus, queries,
        k=k, n_probe=n_probe, refine=refine, id_col=id_col, vec_col=vec_col, **kw,
    )
