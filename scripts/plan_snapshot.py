#!/usr/bin/env python3
"""Generate (or refresh) the plan-shape snapshot the regression gate
pins: one operator-count fingerprint per registry entry, written to
plans_snapshot.json at the repo root.

Run after any DELIBERATE plan change (new entry, join-strategy rework),
review the diff — every changed count is a physical-plan change a
reviewer should be able to explain — and commit the new snapshot.
tests/test_plan_hygiene.py fails on any entry whose live plan no longer
matches, so accidental regressions (broadcast -> sort-merge, a new
shuffle, a Python stage creeping into a JVM pipeline) can't land
silently.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans_snapshot.json",
)


def main() -> None:
    from mbta_etl_spark.plans.planmetrics import plan_text, shape_metrics
    from mbta_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    snap: dict[str, dict[str, int]] = {}
    for name in sorted(qs):
        df = qs[name](spark, sf_dir)
        snap[name] = shape_metrics(plan_text(df))
        spark.catalog.clearCache()
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(snap)} plan fingerprints to {SNAPSHOT_PATH}")


if __name__ == "__main__":
    main()
