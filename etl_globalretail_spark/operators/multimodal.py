"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (the part that must be right at 100 TB):

- media rides as an opaque ``binary`` column next to typed metadata
  (mime, width/height, sample rate, …) — never parsed by Catalyst, never a
  join key, prunable when a query doesn't touch it;
- decode / feature-extract / resize / frame-sample are Arrow-batched
  ``mapInPandas`` operators: schema declared up front, batch-shaped Python,
  linear per-partition — the engine controls partition sizing, the UDF
  controls nothing;
- partitioning guidance: repartition by a size-balanced key before heavy
  decode so one giant video doesn't serialize a partition.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode kernels are stubbed: ``decode_image`` raises NotImplementedError by
contract, and ``fake_decode_features`` is the deterministic stand-in the
tests and demo queries run — the Spark-side plumbing (schema, batching,
partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_globalretail_spark.plans.queries import make_query_decorator
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture: the
    text bytes stand in for an encoded payload. This is how a binary column
    enters the engine — schema-first, payload opaque."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("application/x-fake").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(64).cast("int").alias("meta_width"),
        F.lit(64).cast("int").alias("meta_height"),
    )


def decode_image(payload: bytes) -> object:
    """Real decode kernel — requires an image codec library, absent in this
    environment by design. See module docstring."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg, not present in this container; "
        "use fake_decode_features for the plumbing path"
    )


def fake_decode_features(dim: int = 8):
    """Deterministic stand-in decode+featurize: sha256 of the payload folded
    into a ``dim``-float vector. Batch-shaped (pandas in/out) exactly like a
    real decoder would be."""

    def mapper(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            digests = pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()
            )
            features = digests.map(
                lambda d: [
                    int(d[i * 8 : i * 8 + 8], 16) / 2**32 for i in range(dim)
                ]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": digests,
                    "feature": features,
                }
            )

    return mapper


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """The mapInPandas decode/featurize operator. Arrow batches in, Arrow
    batches out; schema fixed up front so downstream plans are stable."""
    return media.mapInPandas(fake_decode_features(dim), schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("n_frames_total", T.IntegerType()),
    ]
)


def fake_resize_kernel(width: int, height: int):
    """Deterministic stand-in for decode→resize→re-encode: the output payload
    is the input truncated-or-cycled to exactly ``width·height`` bytes (a
    real kernel would decode with PIL, ``Image.resize``, re-encode — the
    byte-count contract is what downstream plumbing depends on either way).
    Batch-shaped pandas in/out, 1 row out per row in."""

    def mapper(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n_out = width * height

        def resize(b: bytes) -> bytes:
            b = bytes(b)
            if not b:
                return b"\x00" * n_out
            reps = -(-n_out // len(b))  # ceil-div: cycle short payloads
            return (b * reps)[:n_out]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload": pdf["payload"].map(resize),
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return mapper


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize operator: one mapInPandas pass, schema fixed up front, output
    row-for-row with the input (no fan-out). The payload column is the only
    heavy column and it never transits a shuffle — resize is map-only, so at
    100 TB the job is scan → Python batch → write with zero exchanges."""
    return media.mapInPandas(fake_resize_kernel(width, height), schema=RESIZED_SCHEMA)


def fake_frame_sample_kernel(frame_bytes: int = 256, every_nth: int = 4):
    """Deterministic stand-in for video frame-sampling: the payload is cut
    into fixed-size chunks ("frames") and every ``every_nth`` one is emitted
    as its own output row — the 1→N fan-out shape a real ffmpeg sampler has.
    A real kernel swaps the chunker for decoded frames; the row-explosion
    contract (media_id, frame_idx, payload-per-frame) is identical."""

    def mapper(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out_id, out_idx, out_pay, out_tot = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(1, -(-len(b) // frame_bytes))
                for i in range(0, n_frames, every_nth):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_pay.append(b[i * frame_bytes : (i + 1) * frame_bytes])
                    out_tot.append(n_frames)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_payload": out_pay,
                    "n_frames_total": pd.Series(out_tot, dtype="int32"),
                }
            )

    return mapper


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_nth: int = 4
) -> DataFrame:
    """Frame-sampling operator (1 row in → ~n_frames/every_nth rows out).

    Fan-out happens INSIDE the Python batch, so output partitioning follows
    input partitioning; repartition the input by a size-balanced key first
    when single giant videos would skew partitions (module docstring)."""
    return media.mapInPandas(
        fake_frame_sample_kernel(frame_bytes, every_nth), schema=FRAME_SCHEMA
    )


@_register("q41_multimodal_pipeline")  # Python kernels — rows-only check
def q41_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample plumbing end-to-end over synthesized media:
    per-mime totals proving the byte-count contract (every resized payload
    is exactly 32·32 bytes) and the sampler's fan-out arithmetic."""
    d = load_table(spark, "documents", sf_dir)
    media = synthesize_media(d)
    resized = resize_media(media, 32, 32)
    frames = sample_frames(media, frame_bytes=256, every_nth=4)
    r = resized.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).alias("resized_bytes"),
        F.max(F.length("payload")).alias("max_payload"),
        F.min(F.length("payload")).alias("min_payload"),
    )
    f = frames.groupBy().agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.countDistinct("media_id").alias("n_media_with_frames"),
    )
    return r.crossJoin(F.broadcast(f))


@_register(
    "q94_multimodal_digest",
    oracle="""
    WITH f AS (
        SELECT lang, sha256(text) AS digest,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_media,
           COUNT(DISTINCT digest) AS n_unique,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           bit_xor(CAST('0x' || substr(digest, 1, 15) AS BIGINT))
               AS digest_checksum
    FROM f GROUP BY lang
    """,
)
def q94_multimodal_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked face of the mapInPandas featurizer: the Python
    kernel's sha256 digests and byte counts, XOR-folded per language, are
    replayed by DuckDB's sha256 over the same UTF-8 payload bytes —
    upgrading the multimodal plumbing from rows-only (q29) to an exact
    cross-engine content check of what the decode stage actually emitted.
    (XOR-fold of the 60-bit digest prefix is order-independent and
    overflow-free — the q85 checksum pattern.)"""
    d = load_table(spark, "documents", sf_dir)
    feats = extract_features(synthesize_media(d)).join(
        d.select(F.col("doc_id").alias("media_id"), "lang"), "media_id"
    )
    checksum = F.conv(F.substring("digest", 1, 15), 16, 10).cast("bigint")
    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.countDistinct("digest").alias("n_unique"),
        F.sum("n_bytes").alias("total_bytes"),
        F.bit_xor(checksum).alias("digest_checksum"),
    )


@_register(
    "q95_multimodal_frames",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS b
        FROM documents
    ),
    fr AS (
        SELECT media_id,
               GREATEST(1, (b + 255) // 256) AS nf
        FROM m
    ),
    sampled AS (
        SELECT media_id, nf, (nf + 3) // 4 AS k FROM fr
    )
    SELECT 'application/x-fake' AS mime,
           COUNT(*) AS n_media,
           CAST(COUNT(*) * 1024 AS BIGINT) AS resized_bytes,
           CAST(SUM(k) AS BIGINT) AS n_frames_sampled,
           CAST(SUM(2 * k * (k - 1)) AS BIGINT) AS sum_frame_idx,
           CAST(SUM(nf) AS BIGINT) AS sum_frames_total
    FROM sampled
    """,
)
def q95_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked resize/frame-sample contract: the Python kernels'
    fan-out arithmetic (frames = ceil(bytes/256), every 4th sampled, frame
    indices 0,4,8,…; resized payloads exactly 32·32 bytes) is replayed as
    closed-form integer SQL — the driver hash now pins the kernels' exact
    row-explosion behavior, not just that rows came back (q41)."""
    d = load_table(spark, "documents", sf_dir)
    media = synthesize_media(d)
    resized = resize_media(media, 32, 32)
    frames = sample_frames(media, frame_bytes=256, every_nth=4)
    per_media = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("frame_idx").cast("long").alias("sum_idx"),
        F.first("n_frames_total").cast("long").alias("nf"),
    )
    r = resized.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).alias("resized_bytes"),
    )
    f = per_media.agg(
        F.sum("k").alias("n_frames_sampled"),
        F.sum("sum_idx").alias("sum_frame_idx"),
        F.sum("nf").alias("sum_frames_total"),
    )
    return (
        r.crossJoin(F.broadcast(f))
        .select(
            F.lit("application/x-fake").alias("mime"),
            "n_media",
            "resized_bytes",
            "n_frames_sampled",
            "sum_frame_idx",
            "sum_frames_total",
        )
    )


@_register("q29_multimodal_features")  # sha256-in-Python — rows-only check
def q29_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: synthesize binary payloads from the
    documents fixture, run the mapInPandas featurizer, aggregate to a stable
    per-mime profile (count, distinct digests, byte total)."""
    d = load_table(spark, "documents", sf_dir)
    feats = extract_features(synthesize_media(d))
    return feats.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.countDistinct("digest").alias("n_unique"),
        F.sum("n_bytes").alias("total_bytes"),
    )
