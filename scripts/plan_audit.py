"""Measured shuffle economics per registry entry: execute a query and
read the SQL metrics off its final (post-AQE) physical plan — scanned
rows/bytes, shuffle bytes/records actually written, spill, exchange
count. This turns SCALE.md's plan arguments into measurements: a claim
like "shuffled bytes ~ #groups, not #rows" is checked against the real
Exchange counters, not the plan shape alone.

Usage:
    python scripts/plan_audit.py [--sf-dir DIR] [--only a,b,...]

One JSON line per entry:
    {"name": ..., "rows_scanned": ..., "bytes_scanned": ...,
     "shuffle_bytes": ..., "shuffle_records": ..., "spill_bytes": ...,
     "n_exchanges": ..., "rows_out": ..., "sec": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _inner(node):
    n = node.nodeName()
    if n == "AdaptiveSparkPlan":
        return _inner(node.executedPlan())
    if "QueryStage" in n:
        return _inner(node.plan())
    return node


def _walk(node, out):
    node = _inner(node)
    mets = node.metrics()
    it = mets.iterator()
    entries = {}
    while it.hasNext():
        kv = it.next()
        entries[kv._1()] = kv._2().value()
    out.append((node.nodeName(), entries))
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out)
    # ReusedExchange / subqueries are not followed: counted once where
    # they executed


def audit(df) -> dict:
    """Execute ``df`` and aggregate runtime metrics off its final plan."""
    t0 = time.monotonic()
    rows_out = len(df.collect())
    sec = time.monotonic() - t0
    nodes: list[tuple[str, dict]] = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    agg = {
        "rows_scanned": 0,
        "bytes_scanned": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "spill_bytes": 0,
        "n_exchanges": 0,
    }
    for name, m in nodes:
        if name.startswith("Scan"):
            agg["rows_scanned"] += m.get("numOutputRows", 0)
            agg["bytes_scanned"] += m.get("filesSize", 0)
        if name == "Exchange":
            agg["n_exchanges"] += 1
            agg["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
            agg["shuffle_records"] += m.get("shuffleRecordsWritten", 0)
        agg["spill_bytes"] += m.get("spillSize", 0)
    return {**agg, "rows_out": rows_out, "sec": round(sec, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from mbta_etl_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark()
    qs = entry.queries()
    names = args.only.split(",") if args.only else list(qs)
    for name in names:
        try:
            rec = audit(qs[name](spark, args.sf_dir))
            print(json.dumps({"name": name, **rec}), flush=True)
        except Exception as e:  # keep sweeping; surface the failure
            print(
                json.dumps({"name": name, "error": str(e)[:200]}), flush=True
            )


if __name__ == "__main__":
    main()
