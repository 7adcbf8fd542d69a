"""q310's emission boundary, pinned by a synthetic probe: a session
downstream of a stream-stream time-interval join emits iff
session_end < W - horizon STRICT (the join delays its output watermark
on p_ts by the join interval; a session ending exactly AT the boundary
is withheld)."""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_globalretail_spark.streaming.windows import (
    purchases_with_recent_click,
    run_to_memory_sink,
)

_SEQ = [0]


def test_session_after_join_emits_strictly_below_w_minus_horizon(spark):
    U = datetime.timezone.utc
    t_end = datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=U)

    def at(mins):
        return t_end - datetime.timedelta(minutes=mins)

    rows, eid = [], [0]

    def ev(ts, typ, uid):
        eid[0] += 1
        rows.append((eid[0], ts, uid, typ, 10.0, "{}"))

    # watermark setters: W = t_end - 10 min; horizon = 1 h
    ev(t_end, "purchase", 900)
    ev(t_end, "click", 901)
    # planted attribution sessions (click 1 min before each purchase);
    # session_end = p_ts + 30 min, offsets are vs t_end:
    ev(at(181), "click", 1); ev(at(180), "purchase", 1)   # end -150 < -70
    ev(at(56), "click", 2); ev(at(55), "purchase", 2)     # end -25 > -70
    ev(at(81), "click", 3); ev(at(80), "purchase", 3)     # end -50 > -70
    ev(at(106), "click", 4); ev(at(105), "purchase", 4)   # end -75 < -70
    ev(at(41), "click", 5); ev(at(40), "purchase", 5)     # end -10 = W
    ev(at(101), "click", 6); ev(at(100), "purchase", 6)   # end -70 = W-1h
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    e = spark.createDataFrame(rows, schema)
    work = tempfile.mkdtemp(prefix="q310_pin_")
    try:
        sdir = os.path.join(work, "stream")
        os.makedirs(sdir)
        tmp = os.path.join(work, "staged")
        e.withColumn(
            "__wave",
            F.when(F.col("user_id") >= 900, F.lit(1)).otherwise(F.lit(0)),
        ).coalesce(1).write.partitionBy("__wave").parquet(tmp)
        for i in range(2):
            part = glob.glob(
                os.path.join(tmp, f"__wave={i}", "part-*.parquet")
            )[0]
            dst = os.path.join(sdir, f"wave_{i}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_000_000_000 + i * 100,) * 2)
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(sdir)
        )
        pairs = purchases_with_recent_click(stream, how="inner")
        sess = pairs.groupBy(
            F.session_window("p_ts", "30 minutes").alias("w"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n_pairs"))
        _SEQ[0] += 1
        sink = f"q310_pin_sink_{_SEQ[0]}"
        run_to_memory_sink(sess, sink, mode="append")
        emitted = sorted(
            r["user_id"] for r in spark.table(sink).collect()
        )
        # strictly below W - horizon emits (users 1, 4); ending exactly
        # AT W - horizon (user 6), between (2, 3), or at W (5) withholds
        assert emitted == [1, 4], emitted
    finally:
        shutil.rmtree(work, ignore_errors=True)
