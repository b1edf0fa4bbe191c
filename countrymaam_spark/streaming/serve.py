"""Streaming query serving: queries arrive over time, results stream out.

The reference serves a long-lived predict loop — queries read from stdin/
socket in batches against the loaded index
(/root/reference/cmd/countrymaam/main.go:228-311). Rounds 1-3 mapped that to
batch query DataFrames; this module adds the literal "queries arrive over
time" form: a queries STREAM processed per micro-batch with ``foreachBatch``
against STATIC index state loaded once (tree blobs / IVF lists / graph
edges / the flat corpus).

``foreachBatch`` is the right Spark shape here — not a stream-stream join or
streaming aggregation — because serving is candidate-generation + exact
re-rank + per-query top-k, and a ranked window over a streaming group is not
expressible in append-mode streaming SQL. Each micro-batch reuses the full
batch serving operator unchanged (so every correctness/plan property proven
for batch serving holds per batch), and results append to a parquet sink
tagged with the micro-batch id. The checkpoint directory makes the serve
loop resumable: a restart replays only unprocessed query files.

Scale: the per-batch plan is the batch plan — estimate-gated broadcast,
pruned IVF lists, etc. — so throughput properties carry over; the stream
trigger bounds queries per batch (`maxFilesPerTrigger`), which is the knob
that keeps each batch's query-side table inside the broadcast regime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def serve_knn_stream(
    queries_stream: DataFrame,
    serve_fn: Callable[[DataFrame], DataFrame],
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the serving loop: every micro-batch of query rows runs
    ``serve_fn`` (any batch kNN operator closed over loaded index state) and
    appends its result — plus a ``serve_batch_id`` lineage column — to the
    parquet ``sink_dir``. ``available_now=True`` drains the current backlog
    and stops (tests / catch-up); ``False`` serves forever (the reference's
    loop). Returns the StreamingQuery — caller awaits/stops."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = serve_fn(batch_df).withColumn("serve_batch_id", F.lit(batch_id))
        out.write.mode("append").parquet(sink_dir)

    w = (
        queries_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def await_stream(sq: StreamingQuery, timeout_s: int) -> None:
    """awaitTermination with the timeout RESULT checked: a hung stream
    raises instead of letting the caller read a partially-populated sink
    that silently diverges from its oracle (round-3 advisor)."""
    if not sq.awaitTermination(timeout_s):
        sq.stop()
        raise RuntimeError(f"streaming query did not finish within {timeout_s}s")
