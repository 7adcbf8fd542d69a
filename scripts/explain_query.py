"""Capture .explain("formatted") for queries into plans/r10/<name>_<tag>.txt.

Usage: python scripts/explain_query.py --tag before q76_x q80_y ...
Streaming replay queries return a batch frame built FROM the replayed sink
table, so their formatted plan reflects the post-replay aggregation only;
that is still the graded frame's plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    from etl_globalretail_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = args.outdir or os.path.join(repo, "plans", "r10")
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
