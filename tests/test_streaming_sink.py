"""Exactly-once streaming append: checkpointed source replay composed with
the keyed idempotent sink."""

from __future__ import annotations

import shutil

from etl_globalretail_spark.sources.readers import load_table
from etl_globalretail_spark.streaming.sink import stream_append_idempotent
from etl_globalretail_spark.streaming.windows import read_event_stream


def test_stream_append_exactly_once(spark, sf_dir, tmp_path):
    """A duplicated source (every event delivered twice) plus a full
    source replay (fresh checkpoint — the worst-case redelivery) still
    yields each key exactly once in the sink."""
    src = f"{sf_dir}/events.parquet"
    stream_dir = tmp_path / "dup_events"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "a.parquet")
    shutil.copy(src, stream_dir / "b.parquet")

    sink = str(tmp_path / "event_sink")
    stream_append_idempotent(
        read_event_stream(spark, str(stream_dir)),
        sink,
        keys=["event_id"],
        checkpoint=str(tmp_path / "ckpt1"),
    )

    batch = load_table(spark, "events", sf_dir)
    n_unique = batch.count()
    out = spark.read.parquet(sink)
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique

    # total redelivery: replay the whole source under a NEW checkpoint —
    # the sink's keyed anti-join absorbs it (no transactional sink needed)
    stream_append_idempotent(
        read_event_stream(spark, str(stream_dir)),
        sink,
        keys=["event_id"],
        checkpoint=str(tmp_path / "ckpt2"),
    )
    assert spark.read.parquet(sink).count() == n_unique

    # resuming from the ORIGINAL checkpoint is a no-op (source-side dedup)
    stream_append_idempotent(
        read_event_stream(spark, str(stream_dir)),
        sink,
        keys=["event_id"],
        checkpoint=str(tmp_path / "ckpt1"),
    )
    assert spark.read.parquet(sink).count() == n_unique
