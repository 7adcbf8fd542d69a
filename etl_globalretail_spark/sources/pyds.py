"""Custom connector on the Spark 4 Python Data Source API.

The reference's only "connector" is a psycopg2 cursor loop
(etl_completo.py:27-43); Spark's pluggable-source surface is the engine
-side generalization, and since Spark 4.0 a source can be written in pure
Python (pyspark.sql.datasource). This module implements one end-to-end:

- ``SyntheticEventsDataSource`` — a parallel, deterministic generator
  source (``spark.read.format("synthetic_events")``): N rows split across
  P input partitions, each row's payload derived from md5 of its index.
  Generator sources are the standard testing/benchmarking front door
  (cf. TPC data generators, Spark's own `rate` source) and double as the
  template for real Python connectors (REST pagination, message queues):
  ``partitions()`` declares the parallel splits, ``read(partition)``
  yields that split's rows on the executor — the driver never touches the
  data.

The payload arithmetic is the repo's md5→15-hex→int64 recipe, so DuckDB
replays the source's entire output from ``range(N)`` — the connector
itself sits on the cross-engine oracle gate (q151), not just on pytest.
"""

from __future__ import annotations

import logging

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from etl_globalretail_spark.plans.queries import make_query_decorator

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)

_N_BUCKETS = 50
_VAL_MOD = 1_000_000


def _payload(i: int) -> tuple[int, int]:
    """(bucket, val) for row index i: md5('evt:<i>') hex → first 15 hex
    chars as int64 (% buckets), next 15 as int64 (% mod). Identical to the
    SQL form in the q151 oracle."""
    h = hashlib.md5(f"evt:{i}".encode()).hexdigest()
    return int(h[:15], 16) % _N_BUCKETS, int(h[15:30], 16) % _VAL_MOD


class _RangeSplit(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _RangeSplit(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _RangeSplit) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            b, v = _payload(i)
            yield (i, b, v)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("n", N)
    .option("partitions", P).load()`` → (i, bucket, val)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "i BIGINT, bucket BIGINT, val BIGINT"

    def reader(self, schema):
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticSimpleStreamReader(self.options)


class _SyntheticSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same deterministic generator: each
    micro-batch serves the next ``chunk`` of row indices until ``n``
    rows have streamed, then returns empty batches. Offsets are the
    plain row cursor ({"i": next}), so replay between committed
    offsets (``readBetweenOffsets``) regenerates EXACTLY the same
    rows — the determinism Structured Streaming's exactly-once
    contract expects from a source."""

    def __init__(self, options):
        self.n = int(options.get("n", 4_000))
        self.chunk = int(options.get("chunk", 1_000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, start: int, end: int):
        return iter(
            [(i, *_payload(i)) for i in range(start, end)]
        )

    def read(self, start: dict):
        s = start["i"]
        e = min(s + self.chunk, self.n)
        return self._rows(s, e), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["i"], end["i"])


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent registration (re-registering the same name is allowed —
    latest wins — but guard anyway for older minor versions)."""
    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:  # older minors reject re-registration
        logging.getLogger(__name__).debug(
            "datasource re-registration rejected", exc_info=True
        )


def read_synthetic_events(
    spark: SparkSession, n: int, partitions: int = 8
) -> DataFrame:
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n", n)
        .option("partitions", partitions)
        .load()
    )


_Q151_N = 20_000


@_register(
    "q151_python_datasource",
    oracle=f"""
    WITH src AS (
        SELECT i,
               CAST('0x' || substr(md5('evt:' || CAST(i AS VARCHAR)), 1, 15)
                    AS BIGINT) % {_N_BUCKETS} AS bucket,
               CAST('0x' || substr(md5('evt:' || CAST(i AS VARCHAR)), 16, 15)
                    AS BIGINT) % {_VAL_MOD} AS val
        FROM (SELECT unnest(range({_Q151_N})) AS i)
    )
    SELECT bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val,
           CAST(SUM(i) AS BIGINT) AS sum_idx
    FROM src GROUP BY bucket
    """,
)
def q151_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a CUSTOM Python Data Source read: 20k generated
    rows, 8 parallel input partitions, grouped per md5-derived bucket. The
    oracle regenerates the source's full output in SQL — certifying the
    connector's partitioning/yield path produces exactly the declared
    dataset, not merely "some rows". (sf_dir is unused: the source IS the
    data.)
    """
    df = read_synthetic_events(spark, _Q151_N)
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
        F.sum("i").cast("long").alias("sum_idx"),
    )


# ---------------------------------------------------------------------------
# Writer path: a JSON-Lines sink on the same Python Data Source API.
# Each task writes its partition to a uniquely-named part file (executor-
# side, no driver funnel); commit() runs on the driver after every task
# reported success — the two-phase pattern real connectors use to get
# all-or-nothing visibility (here: a _SUCCESS marker; an object-store
# connector would move staged files instead).
# ---------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_py sink requires .option('path', ...)")
        self.fields = [f.name for f in schema.fields]

    def write(self, rows) -> "_JsonlCommit":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.jsonl"
        )
        n = 0
        with open(fname, "w") as fh:
            for row in rows:
                fh.write(json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        import os

        total = sum(m.n_rows for m in messages)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(f"{total}\n")

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_py").option("path", dir).save()`` —
    executor-parallel JSON-Lines files + driver-side two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_py"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options, schema)


def register_jsonl_sink(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:  # older minors reject re-registration
        logging.getLogger(__name__).debug(
            "datasource re-registration rejected", exc_info=True
        )


# ---------------------------------------------------------------------------
# q285 — the Python data source's STREAMING face on the hash gate: the
# same deterministic generator consumed through readStream (offsets =
# a row cursor, chunked micro-batches), drained with availableNow into
# a memory sink, and the full census hash-matched against DuckDB's
# range() replay. Combined with q151 (batch face) the connector API is
# now oracle-verified on both planes; the pytest additionally asserts
# the run really took multiple micro-batches.
# ---------------------------------------------------------------------------

_Q285_N = 4_000
_Q285_CHUNK = 1_000
_Q285_SEQ = [0]


def _register_q285() -> None:
    @_register(
        "q285_pyds_stream",
        oracle=f"""
        WITH src AS (
            SELECT i,
                   CAST('0x' || substr(md5('evt:' || CAST(i AS VARCHAR)),
                                       1, 15)
                        AS BIGINT) % {_N_BUCKETS} AS bucket,
                   CAST('0x' || substr(md5('evt:' || CAST(i AS VARCHAR)),
                                       16, 15)
                        AS BIGINT) % {_VAL_MOD} AS val
            FROM (SELECT unnest(range({_Q285_N})) AS i)
        )
        SELECT bucket,
               COUNT(*) AS n_rows,
               CAST(SUM(val) AS BIGINT) AS sum_val,
               CAST(SUM(i) AS BIGINT) AS sum_idx
        FROM src GROUP BY bucket
        """,
    )
    def q285_pyds_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Stream the synthetic generator source to exhaustion through
        real micro-batches; per-bucket census of everything that arrived
        at the sink. See block comment."""
        register_synthetic_source(spark)
        stream = (
            spark.readStream.format("synthetic_events")
            .option("n", _Q285_N)
            .option("chunk", _Q285_CHUNK)
            .load()
        )
        _Q285_SEQ[0] += 1
        sink = f"q285_sink_{_Q285_SEQ[0]}"
        # availableNow pins its target to the FIRST read's offset (one
        # chunk); an unbounded source drains under a continuous trigger,
        # stopped once the sink holds every generated row.
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .trigger(processingTime="0 seconds")
            .start()
        )
        import time

        deadline = time.time() + 120
        while spark.table(sink).count() < _Q285_N:
            if time.time() > deadline:
                q.stop()
                raise TimeoutError("q285 stream did not drain in 120 s")
            time.sleep(0.1)
        q.stop()
        q.awaitTermination()
        return (
            spark.table(sink)
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("val").cast("long").alias("sum_val"),
                F.sum("i").cast("long").alias("sum_idx"),
            )
        )


_register_q285()
