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
