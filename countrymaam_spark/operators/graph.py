"""Distributed kNN-graph index family: NN-Descent build, AKNN loop,
undirected conversion, and graph-walk serving — the Spark restatement of the
reference's graph machinery:

- random k-regular init        (/root/reference/graph/aknn.go:64-91)
- NN-Descent local join        (/root/reference/graph/nndescent.go:287-349)
- NN-Descent prune             (/root/reference/graph/nndescent.go:351-389)
- AKNN builder loop            (/root/reference/graph/aknn.go:50-62,
                                defaults k=15 rho=0.7 maxIter=4096 :20-23)
- ConvertToUndirected          (/root/reference/graph/graph.go:21-43)
- greedy descent + best-first  (/root/reference/index/graph_index.go:24-129)
- composite head/tail          (/root/reference/index/composite_index.go:21-43)

Everything is DataFrame-shaped: the graph is an EDGES table
``(node, nbr, dist)`` keyed by the stable vector id (never a row position —
SURVEY.md §1.3), each NN-Descent round is sample -> pivot self-join ->
vectorized distance -> union -> window-top-k prune, and the driver loop only
counts changed nodes per round (O(1) rows to the driver). Serving is an
iterative frontier expansion: each hop is one equi-join against the edge
table — the distributed form of the reference's heap walk, with ``beam``/
``max_hops``/``entries_num`` as the budget knobs (recall-monotone, reference
countrymaam.go:40-45).

Deviations from the reference, on purpose:
- pair generation uses the canonical NN-Descent form (Dong et al. 2011,
  alg. 2): new' = sampled(fwd_new) ∪ sampled(rev_new), pairs = new'×new' ∪
  new'×old'. The reference restricts u1 to forward-new only — a narrower
  join that converges to the same graph.
- the metric is the TRUE squared L2. The reference's AKNN builder passes
  dist(j, j) == 0 for every pair (/root/reference/index/graph_index.go:164-168
  — a bug SURVEY.md documents; a regression test pins our behavior).
- everything is seeded (the reference is unseeded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from countrymaam_spark.functions import vector as V
from countrymaam_spark.operators.topk import topk_per_group

DEFAULT_K = 15        # reference aknn defaults (graph/aknn.go:20-23)
DEFAULT_RHO = 0.7
DEFAULT_MAX_ITER = 4096
ENTRIES_NUM = 10      # reference defaultEntriesNum (index/graph_index.go:17)


def _ids(vecs: DataFrame, id_col: str) -> DataFrame:
    return vecs.select(F.col(id_col).alias("node"))


def random_k_regular(
    vecs: DataFrame, k: int, seed: int = 42, id_col: str = "vec_id"
) -> DataFrame:
    """k distinct random out-neighbors per node -> (node, nbr) edges.

    The reference draws uniform row positions (graph/aknn.go:64-91); row
    position is not a stable Spark concept, so we draw k from a seeded
    hash-shuffle of the id table: explode 4k hash-ranked candidate slots per
    node, map each slot to the id whose hash rank matches, drop self/dups,
    keep k. One join against the (tiny projection) id table — no driver
    randomness, reproducible per seed.
    """
    ids = _ids(vecs, id_col)
    n = ids.count()
    if n <= k:
        raise ValueError(f"need more than k={k} nodes, got {n}")
    # rank ids once by a seeded hash -> a pseudo-random permutation with
    # positions 0..n-1 we CAN address uniformly
    ranked = ids.select(
        "node",
        (F.row_number().over(Window.orderBy(F.xxhash64("node", F.lit(seed)))) - 1
         ).alias("pos"),
    )
    slots = ids.select(
        "node", F.explode(F.sequence(F.lit(0), F.lit(4 * k - 1))).alias("slot")
    ).withColumn("pos", F.pmod(F.xxhash64("node", "slot", F.lit(seed + 1)), F.lit(n)))
    cand = (
        slots.join(F.broadcast(ranked).withColumnRenamed("node", "nbr"), "pos")
        .filter(F.col("node") != F.col("nbr"))
        .dropDuplicates(["node", "nbr"])
    )
    picked = topk_per_group(cand, ["node"], "slot", "nbr", k, dedup=False)
    return picked.select("node", "nbr")


def _sample(edges: DataFrame, rho: float, seed: int, tag: int) -> DataFrame:
    """Deterministic per-edge rho-sample (seeded hash, no RNG state)."""
    if rho >= 1.0:
        return edges
    return edges.filter(
        F.pmod(F.xxhash64("node", "nbr", F.lit(seed), F.lit(tag)), F.lit(1_000_000))
        < int(rho * 1_000_000)
    )


def nn_descent(
    vecs: DataFrame,
    k: int = DEFAULT_K,
    rho: float = DEFAULT_RHO,
    max_iter: int = 10,
    max_changes: int = 0,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """AKNN graph build -> (node, nbr, dist) with at most k edges per node.

    The reference's builder loop (graph/aknn.go:50-62): random init, then
    iterate localJoin+prune until the number of CHANGED nodes per round is
    <= max_changes (or max_iter). Per round, all heavy work is one pivot
    self-join + one vectorized distance pass + one window prune; the driver
    sees only the changed-node count.
    """
    v = vecs.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")).cache()

    def with_dist(pairs: DataFrame) -> DataFrame:
        # (node, nbr) -> + true sq_l2 dist. Two hash joins against the vector
        # table; the distance itself is one numpy pass per Arrow batch.
        return (
            pairs.join(v.select(F.col("vid").alias("node"), F.col("vec").alias("_va")), "node")
            .join(v.select(F.col("vid").alias("nbr"), F.col("vec").alias("_vb")), "nbr")
            .withColumn("dist", V.sq_l2_batch(F.col("_va"), F.col("_vb")))
            .drop("_va", "_vb")
        )

    init = random_k_regular(vecs, k, seed=seed, id_col=id_col)
    # flag semantics: is_new=1 -> edge has not yet fed a local join
    edges = (
        with_dist(init)
        .withColumn("is_new", F.lit(1))
        .localCheckpoint(eager=True)
    )

    for it in range(max_iter):
        new_e = edges.filter(F.col("is_new") == 1)
        old_e = edges.filter(F.col("is_new") == 0)
        # rho-sampled forward + reverse lists (reference Split/Reverse,
        # graph/nndescent.go:141-155,192-207)
        s_new = _sample(new_e, rho, seed + it, 0).select("node", "nbr")
        joined_new = s_new  # these edges graduate to old after the join
        rev_new = _sample(
            new_e.select(F.col("nbr").alias("node"), F.col("node").alias("nbr")),
            rho, seed + it, 1,
        )
        rev_old = _sample(
            old_e.select(F.col("nbr").alias("node"), F.col("node").alias("nbr")),
            rho, seed + it, 2,
        )
        new_l = s_new.unionByName(rev_new).dropDuplicates(["node", "nbr"])
        old_l = old_e.select("node", "nbr").unionByName(rev_old).dropDuplicates(
            ["node", "nbr"]
        )
        # pivot self-join: u1, u2 meet iff they share a pivot neighbor
        a = new_l.select(F.col("node").alias("p"), F.col("nbr").alias("u1"))
        b = new_l.select(F.col("node").alias("p"), F.col("nbr").alias("u2"))
        c = old_l.select(F.col("node").alias("p"), F.col("nbr").alias("u2"))
        pairs = (
            a.join(b, "p").filter(F.col("u1") < F.col("u2"))
            .select("u1", "u2")
            .unionByName(
                a.join(c, "p").filter(F.col("u1") != F.col("u2")).select("u1", "u2")
            )
            .select(
                F.least("u1", "u2").alias("u1"), F.greatest("u1", "u2").alias("u2")
            )
            .dropDuplicates(["u1", "u2"])
        )
        scored = with_dist(
            pairs.select(F.col("u1").alias("node"), F.col("u2").alias("nbr"))
        )
        sym = scored.unionByName(
            scored.select(
                F.col("nbr").alias("node"), F.col("node").alias("nbr"), "dist"
            )
        ).withColumn("is_new", F.lit(1))
        # joined edges graduate new->old in place (no distance recompute)
        kept = (
            edges.join(
                joined_new.select("node", "nbr").withColumn("_g", F.lit(1)),
                ["node", "nbr"],
                "left",
            )
            .withColumn(
                "is_new", F.when(F.col("_g") == 1, F.lit(0)).otherwise(F.col("is_new"))
            )
            .drop("_g")
        )
        merged = kept.unionByName(sym)
        # prune (graph/nndescent.go:351-389): per node keep the k best unique
        # neighbors; a pair seen both old and new keeps the old flag
        uniq = merged.groupBy("node", "nbr").agg(
            F.min("dist").alias("dist"), F.min("is_new").alias("is_new")
        )
        pruned = topk_per_group(uniq, ["node"], "dist", "nbr", k, dedup=False).drop(
            "rk"
        ).localCheckpoint(eager=True)
        # convergence: nodes whose (node, nbr) set changed this round
        changes = (
            pruned.select("node", "nbr")
            .unionByName(edges.select("node", "nbr"))
            .groupBy("node", "nbr")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") == 1)
            .select("node")
            .distinct()
            .count()
        )
        edges = pruned
        if changes <= max_changes:
            break
    return edges.select("node", "nbr", "dist")


def to_undirected(edges: DataFrame) -> DataFrame:
    """Symmetrize (reference graph/graph.go:21-43): union + swap + dedup."""
    e = edges.select("node", "nbr")
    return e.unionByName(
        e.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
    ).dropDuplicates(["node", "nbr"])


def graph_knn(
    vecs: DataFrame,
    edges: DataFrame,
    queries: DataFrame,
    k: int = 10,
    entries_num: int = ENTRIES_NUM,
    beam: int = 32,
    max_hops: int = 6,
    seed: int = 42,
    entries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Graph-walk kNN -> (query_id, rk, vec_id, dist).

    The reference's greedy hill-climb + best-first expansion
    (index/graph_index.go:24-129) recast as batch frontier expansion: all
    queries advance together, one edge-table equi-join per hop, per-query
    ``beam`` best unvisited nodes survive each hop (the distributed analog of
    the priority queue: the heap order becomes a window rank). The score of
    every VISITED node is kept, so the final window top-k sees everything the
    walk touched. Budget knobs: entries_num (seeded start points or an
    explicit ``entries`` DataFrame from a head index — the composite path),
    beam, max_hops. With entries covering every component, beam >= n and
    enough hops the walk visits the whole graph -> exact (reference
    invariant 3).
    """
    und = to_undirected(edges).cache()
    v = vecs.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")).cache()
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    ).cache()

    if entries is None:
        # seeded pseudo-random entry points per query: hash-ranked ids
        ranked = v.select(
            F.col("vid"),
            (F.row_number().over(Window.orderBy(F.xxhash64("vid", F.lit(seed)))) - 1
             ).alias("pos"),
        ).filter(F.col("pos") < entries_num)
        entries = q.select("qid").crossJoin(F.broadcast(ranked.select("vid")))
    else:
        entries = entries.select(
            F.col(query_id_col).alias("qid"), F.col(id_col).alias("vid")
        )

    def score(cand: DataFrame) -> DataFrame:
        return (
            cand.join(v, "vid")
            .join(F.broadcast(q), "qid")
            .withColumn("dist", V.sq_l2_batch(F.col("vec"), F.col("qv")))
            .select("qid", "vid", "dist")
        )

    visited = score(entries.dropDuplicates(["qid", "vid"])).localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_hops):
        hop = (
            frontier.select("qid", F.col("vid").alias("node"))
            .join(und, "node")
            .select("qid", F.col("nbr").alias("vid"))
            .dropDuplicates(["qid", "vid"])
            .join(visited.select("qid", "vid"), ["qid", "vid"], "anti")
        )
        scored = score(hop).localCheckpoint(eager=True)
        if scored.isEmpty():
            break
        visited = visited.unionByName(scored).localCheckpoint(eager=True)
        # beam: only the best new nodes expand next hop (priority-queue analog)
        frontier = topk_per_group(scored, ["qid"], "dist", "vid", beam, dedup=False).drop("rk")
    # exclude self-matches AT THE END (engine-wide kNN convention, as
    # brute_knn: ids collide when queries come from the corpus) — the walk
    # itself still expands through the self node's neighbors
    out = topk_per_group(
        visited.filter(F.col("vid") != F.col("qid")), ["qid"], "dist", "vid", k
    )
    return out.select(
        F.col("qid").alias("query_id"),
        "rk",
        F.col("vid").alias("vec_id"),
        F.round("dist", 3).alias("dist"),
    )


def composite_knn(
    vecs: DataFrame,
    edges: DataFrame,
    queries: DataFrame,
    k: int = 10,
    entries_num: int = ENTRIES_NUM,
    beam: int = 32,
    max_hops: int = 6,
    n_tables: int = 8,
    bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Two-stage head/tail search (reference CompositeIndex,
    index/composite_index.go:21-43; the CLI's ``rpaknn``): the head — our
    static rp-plane LSH (the degenerate rp forest, operators/ann.py) — streams
    candidates, the first ``entries_num`` per query become entry points for
    the graph tail. Head misses are backstopped by seeded random entries so
    every query always has entries (fewer-than-k stays legal)."""
    from countrymaam_spark.operators.ann import rp_lsh_knn

    head = rp_lsh_knn(
        vecs, queries, k=entries_num, n_tables=n_tables, bits=bits,
        id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col, seed=seed,
    )
    entries = head.select(
        F.col("query_id").alias(query_id_col), F.col("vec_id").alias(id_col)
    )
    return graph_knn(
        vecs, edges, queries, k=k, entries_num=entries_num, beam=beam,
        max_hops=max_hops, seed=seed, entries=entries,
        id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    )
