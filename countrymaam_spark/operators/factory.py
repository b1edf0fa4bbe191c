"""Index factory: the reference's string-keyed index zoo
(/root/reference/cmd/countrymaam/main.go:29-78 — ``flat, kd-tree, rkd-tree,
rp-tree, rrp-tree, aknn, rpaknn``) as one config surface over the engine's
DataFrame indexes. Two corpora shapes:

- embeddings (vec_id, embedding array): ``flat | flat_u8 | rplsh | ivf |
  ivf_u8 | aknn | rpaknn`` (the ``_u8`` flavors run the packed-uint8 dtype,
  the reference's dtype dispatch: cmd/countrymaam/main.go:154-161)
- geo pages  (url, lat, lon):           ``cell | kd | rkd | rp | rrp``

``build`` returns the index STATE as DataFrames (edges / tree blobs —
materialize or checkpoint them as a table); ``search`` takes that state plus
a query DataFrame and returns (query_id, rk, <id>, dist). Parameters mirror
the reference's knobs: leaf_size/leafs, n_trees/trees, search_k, k, rho,
entries (cmd/countrymaam/main.go:29-78, benchmark wrapper param dataclass
countrymaam_wrapper.py:83-91).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from countrymaam_spark.operators import ann, graph, index_build, knn
from countrymaam_spark.operators import pq as pq_ops

EMBED_KINDS = ("flat", "flat_u8", "rplsh", "ivf", "ivf_u8", "pq", "ivfpq", "aknn", "rpaknn")
GEO_KINDS = ("cell", "kd", "rkd", "rp", "rrp")
# the reference CLI's exact names accepted verbatim
# (/root/reference/cmd/countrymaam/main.go:29-78)
ALIASES = {
    "kd-tree": "kd",
    "rkd-tree": "rkd",
    "rp-tree": "rp",
    "rrp-tree": "rrp",
}


@dataclass
class IndexConfig:
    kind: str = "flat"
    k: int = 10
    # tree knobs (geo kinds)
    res: int = 7
    parent_res: int = 4
    leaf_size: int = 32
    n_trees: int = 1
    search_k: int = 64
    ring: int | None = 1
    target_group_rows: int = 200_000
    # graph knobs (aknn / rpaknn)
    graph_k: int = 15
    rho: float = 0.7
    max_iter: int = 10
    entries_num: int = 10
    beam: int = 32
    max_hops: int = 6
    # lsh knobs (rplsh / rpaknn head)
    n_tables: int = 8
    bits: int = 4
    # ivf knobs
    n_lists: int = 16
    n_probe: int = 4
    # pq knobs (pq / ivfpq)
    pq_m: int = 8
    pq_ksub: int = 256
    refine: int = 50
    seed: int = 42
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.kind = ALIASES.get(self.kind, self.kind)


class AnnIndex:
    """Embedding-corpus index handle (reference Index interface analog)."""

    def __init__(self, cfg: IndexConfig, corpus: DataFrame):
        if cfg.kind not in EMBED_KINDS:
            raise ValueError(f"unknown embedding index kind {cfg.kind!r}; pick from {EMBED_KINDS}")
        self.cfg = cfg
        self.corpus = corpus
        self.edges: DataFrame | None = None
        if cfg.kind in ("aknn", "rpaknn"):
            self.edges = graph.nn_descent(
                corpus, k=cfg.graph_k, rho=cfg.rho, max_iter=cfg.max_iter, seed=cfg.seed
            )

    def search(self, queries: DataFrame, k: int | None = None) -> DataFrame:
        cfg, k = self.cfg, k or self.cfg.k
        if cfg.kind == "flat":
            return ann.brute_knn(self.corpus, queries, k=k)
        if cfg.kind == "flat_u8":
            return ann.brute_knn_u8(self.corpus, queries, k=k)
        if cfg.kind == "rplsh":
            return ann.rp_lsh_knn(
                self.corpus, queries, k=k,
                n_tables=cfg.n_tables, bits=cfg.bits, seed=cfg.seed,
            )
        if cfg.kind == "ivf":
            return ann.ivf_knn(
                self.corpus, queries, k=k,
                n_lists=cfg.n_lists, n_probe=cfg.n_probe, seed=cfg.seed,
            )
        if cfg.kind == "pq":
            return pq_ops.pq_knn(
                self.corpus, queries, k=k,
                m=cfg.pq_m, ksub=cfg.pq_ksub, refine=cfg.refine, seed=cfg.seed,
            )
        if cfg.kind == "ivfpq":
            return pq_ops.ivf_pq_knn(
                self.corpus, queries, k=k,
                n_lists=cfg.n_lists, n_probe=cfg.n_probe,
                m=cfg.pq_m, ksub=cfg.pq_ksub, refine=cfg.refine, seed=cfg.seed,
            )
        if cfg.kind == "ivf_u8":
            return ann.ivf_knn_u8(
                self.corpus, queries, k=k,
                n_lists=cfg.n_lists, n_probe=cfg.n_probe, seed=cfg.seed,
            )
        if cfg.kind == "aknn":
            return graph.graph_knn(
                self.corpus, self.edges, queries, k=k, entries_num=cfg.entries_num,
                beam=cfg.beam, max_hops=cfg.max_hops, seed=cfg.seed,
            )
        return graph.composite_knn(  # rpaknn
            self.corpus, self.edges, queries, k=k, entries_num=cfg.entries_num,
            beam=cfg.beam, max_hops=cfg.max_hops,
            n_tables=cfg.n_tables, bits=cfg.bits, seed=cfg.seed,
        )


class GeoIndex:
    """Geo-corpus index handle over (url, lat, lon) pages."""

    def __init__(self, cfg: IndexConfig, pages_geo: DataFrame):
        if cfg.kind not in GEO_KINDS:
            raise ValueError(f"unknown geo index kind {cfg.kind!r}; pick from {GEO_KINDS}")
        self.cfg = cfg
        self.pages_geo = pages_geo
        self.trees: DataFrame | None = None
        if cfg.kind != "cell":
            tree_kind = "kd" if cfg.kind in ("kd", "rkd") else "rp"
            n_trees = cfg.n_trees if cfg.kind in ("rkd", "rrp") else 1
            cells = index_build.salt_hot_cells(
                index_build.encode_pages(pages_geo, cfg.res, cfg.parent_res),
                cfg.target_group_rows,
            )
            self.trees = index_build.build_tree_blobs(
                cells, seed=cfg.seed, leaf_size=cfg.leaf_size,
                kind=tree_kind, n_trees=n_trees,
            )

    def search(self, queries: DataFrame, k: int | None = None) -> DataFrame:
        cfg, k = self.cfg, k or self.cfg.k
        if cfg.kind == "cell":
            return knn.cell_knn(self.pages_geo, queries, k=k, res=cfg.res)
        return index_build.knn_tree(
            self.trees, queries, k=k, search_k=cfg.search_k,
            parent_res=cfg.parent_res, ring=cfg.ring,
        )


def create_index(corpus: DataFrame, cfg: IndexConfig):
    """The reference's createIndex dispatch: pick the handle class by the
    corpus shape (embedding column vs lat/lon columns)."""
    cols = set(corpus.columns)
    if "embedding" in cols:
        return AnnIndex(cfg, corpus)
    if {"lat", "lon"} <= cols:
        return GeoIndex(cfg, corpus)
    raise ValueError(f"cannot infer corpus shape from columns {sorted(cols)}")
