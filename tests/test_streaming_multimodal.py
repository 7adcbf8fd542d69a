"""Structured Streaming parity + multimodal plumbing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.multimodal import (
    extract_features,
    synthesize_media,
)
from etl_globalretail_spark.sources.readers import load_table
from etl_globalretail_spark.streaming.windows import (
    hourly_counts,
    read_event_stream,
    run_to_memory_sink,
)


def test_stream_batch_parity(spark, sf_dir):
    """The same hourly_counts transformation over readStream vs batch must
    produce identical results once the stream drains (availableNow)."""
    batch = hourly_counts(load_table(spark, "events", sf_dir))
    stream = hourly_counts(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    run_to_memory_sink(stream, "hourly_test", mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("hourly_test").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 0


def test_session_stream_batch_parity(spark, sf_dir):
    """sessionize() over readStream must equal the batch run once the
    availableNow stream drains — session state merges across micro-batches."""
    from etl_globalretail_spark.streaming.windows import sessionize

    batch = sessionize(load_table(spark, "events", sf_dir))
    stream = sessionize(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    run_to_memory_sink(stream, "sessions_test", mode="complete")
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in spark.table("sessions_test").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 0


def test_stream_dedup_with_duplicated_source(spark, sf_dir, tmp_path):
    """dedup_stream over a source that delivers every event twice (two
    copies of the file in the stream directory) must yield exactly the
    batch-distinct set, with bounded per-key state (watermark-scoped)."""
    import shutil

    from etl_globalretail_spark.streaming.windows import (
        dedup_stream,
        read_event_stream,
        run_to_memory_sink,
    )

    src = f"{sf_dir}/events.parquet"
    stream_dir = tmp_path / "dup_events"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "a.parquet")
    shutil.copy(src, stream_dir / "b.parquet")

    deduped = dedup_stream(read_event_stream(spark, str(stream_dir)))
    # countDistinct is illegal on streams; after dedup, count == distinct
    counted = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    run_to_memory_sink(counted, "dedup_stream_test", mode="complete")
    got = {r.event_type: r.n for r in spark.table("dedup_stream_test").collect()}

    batch = load_table(spark, "events", sf_dir)
    want = {
        r.event_type: r.n
        for r in batch.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    assert got == want
    assert len(want) > 0
    # batch face degrades to exact dropDuplicates
    assert dedup_stream(batch.union(batch)).count() == batch.count()


def test_multimodal_features_deterministic(spark, sf_dir):
    # filter, not limit(20): limit picks arbitrary rows per action and the
    # test evaluates the frame twice.
    d = load_table(spark, "documents", sf_dir).filter("doc_id < 20")
    feats = extract_features(synthesize_media(d)).collect()
    assert len(feats) == 20
    by_id = {r.media_id: r for r in feats}
    docs = {r.doc_id: r.text for r in d.collect()}
    for media_id, row in by_id.items():
        payload = docs[media_id].encode()
        assert row.n_bytes == len(payload)
        assert row.digest == hashlib.sha256(payload).hexdigest()
        assert len(row.feature) == 8
        assert all(0.0 <= v <= 1.0 for v in row.feature)


def test_resize_byte_contract(spark, sf_dir):
    """Every resized payload is exactly width·height bytes, row-for-row with
    the input, and short payloads cycle deterministically."""
    from etl_globalretail_spark.operators.multimodal import resize_media

    d = load_table(spark, "documents", sf_dir).filter("doc_id < 20")
    media = synthesize_media(d)
    out = resize_media(media, 16, 16).collect()
    assert len(out) == 20
    docs = {r.doc_id: r.text.encode() for r in d.collect()}
    for r in out:
        assert (r.meta_width, r.meta_height) == (16, 16)
        payload = bytes(r.payload)
        assert len(payload) == 256
        src = docs[r.media_id]
        reps = -(-256 // len(src))
        assert payload == (src * reps)[:256]


def test_frame_sample_fanout(spark, sf_dir):
    """The sampler emits ceil(n_frames / every_nth) rows per media with
    frame indices 0, n, 2n, … and chunk payloads from the right offsets."""
    from etl_globalretail_spark.operators.multimodal import sample_frames

    d = load_table(spark, "documents", sf_dir).filter("doc_id < 10")
    media = synthesize_media(d)
    frames = sample_frames(media, frame_bytes=64, every_nth=3).collect()
    docs = {r.doc_id: r.text.encode() for r in d.collect()}
    seen: dict[int, list] = {}
    for r in frames:
        seen.setdefault(r.media_id, []).append(r)
    assert set(seen) == set(docs)
    for mid, rows in seen.items():
        b = docs[mid]
        n_frames = max(1, -(-len(b) // 64))
        expect_idx = list(range(0, n_frames, 3))
        assert sorted(r.frame_idx for r in rows) == expect_idx
        for r in rows:
            assert r.n_frames_total == n_frames
            assert bytes(r.frame_payload) == b[r.frame_idx * 64 : (r.frame_idx + 1) * 64]


def test_multimodal_schema_stable(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir).limit(1)
    feats = extract_features(synthesize_media(d))
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,mime:string,n_bytes:bigint,"
        "digest:string,feature:array<float>>"
    )


def test_stream_static_enrichment_parity(spark, sf_dir):
    """Stream-static join (dimension enrichment per micro-batch) matches
    the batch join once the stream drains."""
    from etl_globalretail_spark.streaming.windows import enrich_with_dim

    events = load_table(spark, "events", sf_dir)
    dim = (
        events.select("user_id").distinct()
        .withColumn("cohort", (F.col("user_id") % 3).cast("string"))
    )
    batch = enrich_with_dim(events, dim, "user_id")
    want = {(r.event_id): r.cohort for r in batch.collect()}

    stream = enrich_with_dim(
        read_event_stream(spark, f"{sf_dir}/events.parquet"), dim, "user_id"
    )
    run_to_memory_sink(stream, "enrich_test", mode="append")
    got = {r.event_id: r.cohort for r in spark.table("enrich_test").collect()}
    assert got == want and len(got) > 0


def test_stream_stream_join_parity(spark, sf_dir):
    """Watermarked stream-stream time-range join produces the same pairs
    as the identical batch join once both streams drain."""
    from etl_globalretail_spark.streaming.windows import (
        purchases_with_recent_click,
    )

    events = load_table(spark, "events", sf_dir)
    want = {
        (r.purchase_id, r.click_id)
        for r in purchases_with_recent_click(events).collect()
    }

    stream = purchases_with_recent_click(
        read_event_stream(spark, f"{sf_dir}/events.parquet")
    )
    run_to_memory_sink(stream, "ssj_test", mode="append")
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.table("ssj_test").collect()
    }
    assert got == want
    assert len(want) > 0


def test_streaming_quality_gate_parity(spark, sf_dir):
    """The streaming quality gate must admit EXACTLY the docs the batch
    quality features admit — one shared scoring function, two run modes."""
    from etl_globalretail_spark.operators.text import quality_features
    from etl_globalretail_spark.sources.readers import load_table
    from etl_globalretail_spark.streaming.windows import (
        quality_gate,
        read_document_stream,
    )

    stream = read_document_stream(spark, f"{sf_dir}/documents.parquet")
    q = (
        quality_gate(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("quality_gate_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.table("quality_gate_test").collect()}

    batch = quality_features(load_table(spark, "documents", sf_dir))
    want = {
        r.doc_id
        for r in batch.filter(
            "n_tokens >= 5 AND lexical_diversity >= 0.3 AND avg_token_len <= 12.0"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_collapse_bursts_hand_case(spark):
    """Bursts within the gap collapse to their first event; a long burst
    leaves evenly-spaced survivors (predecessor = previous EVENT)."""
    import datetime as dt

    from etl_globalretail_spark.streaming.windows import collapse_bursts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1 'click': burst at +0s, +60s, +120s → only +0 kept? NO:
        # each is 60s after its predecessor (< 5 min) → +0 kept only.
        (1, 1, "click", t0),
        (2, 1, "click", t0 + dt.timedelta(seconds=60)),
        (3, 1, "click", t0 + dt.timedelta(seconds=120)),
        # +10 min later: new burst
        (4, 1, "click", t0 + dt.timedelta(minutes=12)),
        # different type same user: independent
        (5, 1, "view", t0 + dt.timedelta(seconds=30)),
        # different user: independent
        (6, 2, "click", t0 + dt.timedelta(seconds=90)),
    ]
    df = spark.createDataFrame(
        [(i, u, ty, ts) for (i, u, ty, ts) in rows],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    kept = sorted(r["event_id"] for r in collapse_bursts(df).collect())
    assert kept == [1, 4, 5, 6]


def test_session_paths_top1_matches_recount(spark, sf_dir):
    """q171's rank-1 trigram equals a driver-side recount with identical
    session and ordering rules."""
    from collections import Counter

    from etl_globalretail_spark.sources.readers import load_table
    from etl_globalretail_spark.streaming.windows import q171_session_paths

    out = q171_session_paths(spark, sf_dir).orderBy("rank").collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))

    rows = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    c = Counter()
    for evs in by_user.values():
        evs.sort()
        sessions, cur = [], []
        prev = None
        for ts, eid, et in evs:
            if prev is not None and (ts - prev).total_seconds() >= 1800:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev = ts
        sessions.append(cur)
        for s in sessions:
            for i in range(len(s) - 2):
                c[f"{s[i]}>{s[i+1]}>{s[i+2]}"] += 1
    if c:
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (out[0]["path"], out[0]["n"]) == best
