#!/usr/bin/env python
"""Benchmark harness: run the full query registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via the noop sink (full physical plan
runs, nothing is shipped to the driver), timed over wall clock. One warmup
of the flagship query primes the JVM/codegen so numbers reflect steady
state rather than session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mbta_etl_spark.plans import registry  # noqa: E402
from mbta_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("mbta_etl_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # warmup: prime codegen + parquet footer caches, and spin up the Arrow
    # Python worker pool (first mapInPandas otherwise pays worker fork +
    # import cost inside whichever timed query happens to run first)
    try:
        registry.q16_pricing_summary(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        import pandas as pd  # noqa: F401

        spark.range(32).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception as e:
        print(f"# bench warmup failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # a failing query must not sink the bench
            timings[name] = -1.0
            print(f"# bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "registry_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
