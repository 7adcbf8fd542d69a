"""Standalone per-query timer: same methodology as bench.py (noop sink,
min-of-N wall clock, warmup + Python-worker-pool warmup, clearCache between
queries) for isolating individual queries without a 417-query session.

Usage: python scripts/bench_one.py [--runs N] [--sf DIR] q76_x q80_y ...
Prints one JSON line {"name": sec, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from etl_globalretail_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    qs["q01_revenue_by_region"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 1000, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
