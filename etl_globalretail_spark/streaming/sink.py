"""Streaming sinks: idempotent incremental append via ``foreachBatch``.

The reference's sink is a per-row ``INSERT … ON CONFLICT DO NOTHING``
(etl_completo.py:172-177) — which is, precisely, an idempotent keyed sink:
replaying the same input produces no new rows. This module is that sink's
streaming face, and the piece that upgrades Structured Streaming's
at-least-once ``foreachBatch`` contract to effective exactly-once:

- the checkpoint makes the *source* replay a failed micro-batch;
- the keyed anti-join append (``append_new_keys``) makes the *sink* ignore
  rows it already holds;
- replayed batch ∘ idempotent sink = exactly-once end-to-end, without a
  transactional sink.

This is the standard production recipe for parquet-like sinks that have no
atomic multi-file commit (the alternative — a table format with
transactional appends — changes the swap step, not this dataflow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_globalretail_spark.sources.readers import append_new_keys


def stream_append_idempotent(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    available_now: bool = True,
):
    """Drive a stream into a keyed parquet sink, appending each micro-batch
    idempotently. Returns the StreamingQuery (already terminated when
    ``available_now``).

    Scale notes: each micro-batch pays one anti-join against the sink's
    key column (pruned scan). Keep batches chunky (trigger interval) so the
    per-batch fixed cost amortizes; compact the sink periodically
    (``compact_partitions``) since micro-batch appends accrete files.
    """
    def _write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        append_new_keys(batch_df, path, keys)

    writer = (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
    return q
