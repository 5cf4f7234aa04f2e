#!/usr/bin/env python3
"""Dump `.explain("formatted")` for registry entries to plans/<tag>/.

Usage:
    python scripts/dump_plans.py --tag r08 --suffix before [--only a,b,...]

Writes plans/<tag>/<name>_<suffix>.txt per entry — the judge-facing
evidence files for optimization rounds (plan claims in
OPTIMIZATION_r*.md are checked against these).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r08")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from mbta_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = sorted(qs) if not args.only else args.only.split(",")
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR compiling plan: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(txt)
        spark.catalog.clearCache()
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
