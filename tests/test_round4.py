"""Round-4 additions: HRW routing, serpentine packing, join-cardinality
audit — property tests beyond the DuckDB hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.skew import (
    _HRW_DEAD,
    _HRW_NODES,
    _Q282_R,
    rendezvous_assign,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q281_hrw_invariant(spark, sf_dir):
    """Node loss moves ONLY the dead node's keys (the rendezvous
    guarantee): every moved-in doc came from node3, and survivors'
    assignments are unchanged."""
    rows = ALL_QUERIES["q281_rendezvous_routing"](spark, sf_dir).collect()
    assert len(rows) == len(_HRW_NODES) - 1
    assert all(r["n_moved_in"] == r["n_from_dead"] for r in rows)
    # the dead node's shard spreads across survivors, not onto one node
    movers = [r["n_moved_in"] for r in rows]
    assert sum(movers) > 0 and max(movers) < sum(movers)


def test_q281_assignment_is_balanced(spark, sf_dir):
    """HRW spreads keys roughly uniformly (hash balance): no node holds
    more than 3x the ideal share on the fixture."""
    d = load_table(spark, "documents", sf_dir).select("doc_id")
    counts = (
        rendezvous_assign(d, "doc_id")
        .groupBy("node").count().collect()
    )
    total = sum(r["count"] for r in counts)
    ideal = total / len(_HRW_NODES)
    assert len(counts) == len(_HRW_NODES)
    assert max(r["count"] for r in counts) < 3 * ideal


def test_q282_plan_is_complete_and_tight(spark, sf_dir):
    """The serpentine plan covers every key exactly once (loads sum to
    the corpus) and its makespan stays within 2x of the ideal reducer
    load on the fixture."""
    rows = ALL_QUERIES["q282_serpentine_pack_plan"](spark, sf_dir).collect()
    li = load_table(spark, "lineitem", sf_dir)
    total = li.count()
    n_keys = li.select("l_suppkey").distinct().count()
    assert sum(r["load"] for r in rows) == total
    assert sum(r["n_keys"] for r in rows) == n_keys
    assert len(rows) <= _Q282_R
    assert max(r["load_permil_of_ideal"] for r in rows) < 2000


def test_q283_estimator_exact_on_contained_fk(spark, sf_dir):
    """On a clean FK join (lineitem->orders: every l_orderkey exists in
    orders, orders' key is unique) the containment estimator is exact,
    so err_permil == 0; the cross-table keyspace (events x customer)
    is where it may degrade — the audit's point."""
    rows = {
        r["join_key"]: r
        for r in ALL_QUERIES["q283_join_cardinality_audit"](
            spark, sf_dir
        ).collect()
    }
    lo = rows["lineitem.l_orderkey=orders.o_orderkey"]
    assert lo["est_rows"] == lo["actual_rows"]
    assert lo["err_permil"] == 0
    assert len(rows) == 4


def test_q285_stream_runs_multiple_batches(spark):
    """The Python streaming source really serves chunked micro-batches
    (not one big batch), and exactly n rows arrive (exactly-once)."""
    import time

    from etl_globalretail_spark.sources.pyds import (
        _Q285_CHUNK,
        _Q285_N,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n", _Q285_N)
        .option("chunk", _Q285_CHUNK)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("pyds_stream_test")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while spark.table("pyds_stream_test").count() < _Q285_N:
        assert time.time() < deadline, "stream did not drain"
        time.sleep(0.1)
    q.stop()
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= _Q285_N // _Q285_CHUNK - 1
    got = spark.table("pyds_stream_test")
    assert got.count() == _Q285_N  # exactly once, no dupes
    assert got.select("i").distinct().count() == _Q285_N


def test_q284_variant_consistent_with_from_json(spark, sf_dir):
    """The variant shred agrees with the declared-schema from_json path
    (q78's device) on the same payloads."""
    from etl_globalretail_spark.sources.readers import load_table

    e = load_table(spark, "events", sf_dir)
    via_variant = (
        ALL_QUERIES["q284_variant_shred"](spark, sf_dir)
        .agg(F.sum("sum_k"), F.sum("n_with_k")).collect()[0]
    )
    via_struct = e.select(
        F.from_json("props", "k bigint").getField("k").alias("k")
    ).agg(F.sum("k"), F.count("k")).collect()[0]
    assert via_variant[0] == via_struct[0]
    assert via_variant[1] == via_struct[1]
