"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method: each query is executed to completion through the noop sink (full
computation, no driver-side collect cost) TWICE, and the per-query time is
the min of the two wall-clock runs — steady-state throughput, insulated
from transient host-load spikes and JVM GC pauses (observed 3× swings on
identical code in this shared-host container). A session warmup query and
a Python-worker-pool warmup run first. The headline set covers every
operator family: star joins, window dedup/top-N, date cleansing, events
windows, the full fact ETL, text dedup tiers, sampling, and embedding
search.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The headline set is the ENTIRE registry: every registered query is
# benched so regressions anywhere (including the reference-parity ETL
# family q02-q46 and the rows-only hash tiers) are tracked round over
# round. Derived at runtime from the registry, so coverage can never
# silently fall out of the bench.
HEADLINE: list[str] | None = None  # None -> all registered queries


def main() -> None:
    from etl_globalretail_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = HEADLINE if HEADLINE is not None else list(qs)

    from etl_globalretail_spark.streaming.stateful import QUERIES as _SQ
    from etl_globalretail_spark.streaming.windows import QUERIES as _WQ

    streaming_names = set(_WQ) | set(_SQ) | {"q285_pyds_stream"}

    # Warmup: JVM + codegen + parquet footer caches.
    qs["q01_revenue_by_region"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # Warmup 2: spawn the Python worker pool (reused afterwards), so the
    # first mapInPandas query in the headline set isn't charged ~1s/worker
    # of process startup that a long-lived cluster pays once.
    spark.range(0, 1000, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        # Streaming replays rebuild staged sources + a real micro-batch
        # engine per run and swing ±25% between identical-tree runs
        # (BENCH_r04 vs r05); min-of-3 pins them so round-over-round
        # deltas measure code, not engine-startup jitter.
        runs = 3 if name in streaming_names else 2
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        # Release cached blocks whose lifetime is tied to the returned
        # plan (skew profiles, PQ scored frames, dHash tables, …): the
        # noop sink was their terminal action, so dropping them here
        # keeps 306 queries' caches from accumulating across the session
        # (ADVICE r6).
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    # n_queries/mean: the headline set GROWS round over round as operator
    # coverage widens — compare totals only at equal coverage; the
    # per-query mean is the stable cross-round throughput signal.
    slowest10 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    # The driver keeps only the LAST ~2000 chars of stdout, so the full
    # per-query map (360+ entries, ~15 kB) CANNOT live on the printed
    # line — BENCH_r08.json came back `parsed: null` because it blew the
    # tail capture (VERDICT r8 item 2). Write the full map to a sibling
    # file and print ONE compact summary line (≈700 chars) LAST.
    full = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": float(sf),
        "mean_sec_per_query": round(total / len(timings), 3),
        "slowest10": slowest10,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_queries.json"), "w"
    ) as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                # name→sec map per the contract, capped at the slowest
                # 10 so the line stays inside the tail capture; the
                # FULL 360+-entry map is in full_queries_file.
                "queries": slowest10,
                "full_queries_file": "bench_queries.json",
                "n_queries": len(timings),
                "sf": float(sf),
                "mean_sec_per_query": round(total / len(timings), 3),
                "slowest10": slowest10,
            }
        )
    )


if __name__ == "__main__":
    main()
