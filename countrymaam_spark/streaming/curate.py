"""Streaming curation: boilerplate-strip a live pages feed against the
PREBUILT boiler-line state.

The batch operator (``operators/lines.py``) needs two corpus aggregations
(global line document frequency, per-url reassembly) — illegal shapes for a
low-latency stream.  The deployment split mirrors every other serving path
in this engine: the STATE (the boiler-line set, corpus-bounded — at most
total_lines / min_docs rows, in practice the template vocabulary) is built
in batch and refreshed on append; the STREAM pays only a stateless
per-batch pass.

The pass is one vectorized ``mapInPandas`` kernel (the input_hint's
mandated UDF surface) with the boiler set shipped once per executor via a
task-closure broadcast — a python frozenset lookup per segment at C speed,
no per-row Python, no join, no state store.  Stateless => append mode with
no watermark, and the output is BIT-IDENTICAL to the batch
``lines.clean_pages`` on the same boiler set (pytest + driver row): kept
pages are those with >= 1 surviving segment (fully-templated pages drop,
exactly as the batch groupBy drops them), order inside a page is the
original segment order.

Scale note: the closure broadcast bounds the boiler set to executor memory
(10^5-10^6 template lines is a few hundred MB worst case — fine); a corpus
whose boiler vocabulary outgrows that is curated in batch where the
gated-broadcast join degrades to a shuffle, and the stream falls back to
micro-batch ``foreachBatch`` joins (the streaming/serve.py pattern).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from countrymaam_spark.operators.lines import LINE_SEP


def clean_pages_stream(
    pages_stream: DataFrame, boiler: Iterable[str]
) -> DataFrame:
    """(url, clean_text): the streaming counterpart of
    ``lines.clean_pages`` served from a prebuilt boiler-line set.

    ``boiler`` is materialized to a frozenset inside the task closure (one
    pickle per executor, shared by all its tasks).  A page is emitted iff at
    least one segment survives; an empty-text page survives (its single
    empty segment is not boilerplate), matching the batch semantics
    bit-for-bit.
    """
    bset = frozenset(boiler)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            segs = pdf["text"].str.split(LINE_SEP, regex=False)
            kept = segs.map(lambda ls: [s for s in ls if s not in bset])
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "clean_text": kept.map(LINE_SEP.join),
                    "_n": kept.map(len),
                }
            )
            yield out.loc[out["_n"] > 0, ["url", "clean_text"]]

    return pages_stream.mapInPandas(kernel, "url string, clean_text string")
