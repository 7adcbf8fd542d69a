"""Per-stage profiler for one query (tooling only, not on the graded path).

Runs a query through the noop sink with the Spark UI enabled, then dumps
per-stage metrics from the UI REST API: wall duration, task count,
executorRunTime, executorCpuTime, shuffle bytes — sorted by duration.
This answers "where does the time go" (guide §1.1/§7.1) without eyeballing
a live UI.

Usage: python scripts/profile_one.py [--runs N] [--sf DIR] q279_image_decode
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from etl_globalretail_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("profile-one", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4045",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    qs["q01_revenue_by_region"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, 1000, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    ui = "http://localhost:4045/api/v1"
    app_id = spark.sparkContext.applicationId

    def stages_after(min_sub_time: float):
        with urllib.request.urlopen(
            f"{ui}/applications/{app_id}/stages?status=complete"
        ) as r:
            data = json.load(r)
        out = []
        for s in data:
            sub = s.get("submissionTime")
            if not sub:
                continue
            t = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
            # GMT timestamps; compare monotonically via stageId instead
            out.append(s)
        return out

    for name in args.names:
        with urllib.request.urlopen(
            f"{ui}/applications/{app_id}/stages"
        ) as r:
            before_ids = {s["stageId"] for s in json.load(r)}
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        with urllib.request.urlopen(
            f"{ui}/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = [s for s in json.load(r) if s["stageId"] not in before_ids]
        rows = []
        for s in stages:
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            done = s.get("completionTime")
            dur = None
            if sub and done:
                def _p(x):
                    return time.mktime(time.strptime(x[:19], "%Y-%m-%dT%H:%M:%S")) + float(
                        "0." + x[20:23] if len(x) > 22 else 0
                    )
                dur = _p(done) - _p(sub)
            rows.append(
                (
                    dur or 0.0,
                    s["stageId"],
                    s["numCompleteTasks"],
                    s["executorRunTime"] / 1000.0,
                    s["executorCpuTime"] / 1e9,
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    (s.get("name") or "")[:60].replace("\n", " "),
                )
            )
        rows.sort(reverse=True)
        print(f"\n=== {name}: wall {best:.3f}s, {len(rows)} stages ===")
        print(f"{'dur_s':>7} {'stage':>6} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} "
              f"{'shR':>10} {'shW':>10}  name")
        tot_dur = sum(r[0] for r in rows)
        for r in rows[: args.top]:
            print(f"{r[0]:7.2f} {r[1]:6d} {r[2]:5d} {r[3]:8.2f} {r[4]:8.2f} "
                  f"{r[5]:10d} {r[6]:10d}  {r[7]}")
        print(f"sum stage wall {tot_dur:.2f}s over {len(rows)} stages; "
              f"query wall {best:.3f}s (gap = driver/planning/scheduling)")


if __name__ == "__main__":
    main()
