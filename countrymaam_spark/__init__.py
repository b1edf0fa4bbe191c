"""countrymaam_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Recasts the semantics of ar90n/countrymaam (an in-memory ANN library:
candidate generation -> exact re-rank -> dedup -> top-k, recall governed by a
candidate budget; see /root/reference/countrymaam.go:38-69) as a distributed
engine over Parquet/Iceberg-style tables of Common-Crawl-style web pages:

- ``functions.geo``    — haversine, quad-cell (H3-shaped) encode/parent/ring,
                         Web-Mercator tiles. Pure Column math (whole-stage
                         codegen; no Python in the hot path).
- ``functions.text``   — language id, quality score, token counts, shingles,
                         fingerprints, minhash/simhash primitives.
- ``functions.vector`` — L2/cosine distance column expressions for
                         array<float> embeddings.
- ``sources.pages``    — deterministic synthetic pages fixture generator
                         (the BASELINE.json input_hint shape).
- ``operators``        — kNN join (flat + cell index), point-in-polygon join,
                         tile assignment, dedup family, embedding ANN,
                         per-partition index build with salting + lineage.
- ``plans.checkpoint`` — snapshot/manifest based stage checkpointing + resume.

Everything here is built only on public PySpark APIs.
"""

__version__ = "0.1.0"
