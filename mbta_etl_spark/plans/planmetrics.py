"""Physical-plan shape metrics shared by the snapshot generator
(scripts/plan_snapshot.py) and the regression gate
(tests/test_plan_hygiene.py).

The metrics are deliberately coarse — operator COUNTS, not plan text —
so they are stable across Spark's per-run expression ids while still
catching the regressions that matter at 100 TB: a broadcast join
degrading to sort-merge, a new exchange appearing in a one-shuffle
pipeline, a JVM expression chain silently becoming a Python stage, a
pushed filter falling off a scan.

Known blind spot (by construction): entries that materialize() a shared
upstream stage (eager localCheckpoint) fingerprint only their
POST-checkpoint plan — the shingle kernels and scans above the
checkpoint are invisible here (e.g. t12/t25/d13/d33/d41 show
parquet_scans=0). Their upstream hygiene is still covered: the same
kernels compile UN-checkpointed in single-consumer entries (d22/d23
fingerprint the shingle mapInPandas directly) and in the operators'
unit tests.
"""

from __future__ import annotations

import contextlib
import io
import re

PY_STAGES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
    "PythonMapInArrow",
    "FlatMapGroupsInArrow",
)


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shape_metrics(plan: str) -> dict[str, int]:
    """Operator-count fingerprint of one formatted physical plan."""
    # NOTE: r"\bExchange\b" does NOT match inside "ReusedExchange"
    # (no word boundary between d and E), so the two counts are already
    # disjoint — no subtraction.
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
        "broadcast_hash_joins": len(
            re.findall(r"\bBroadcastHashJoin\b", plan)
        ),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shuffled_hash_joins": len(
            re.findall(r"\bShuffledHashJoin\b", plan)
        ),
        "broadcast_nl_joins": len(
            re.findall(r"\bBroadcastNestedLoopJoin\b", plan)
        ),
        "python_stages": sum(plan.count(p) for p in PY_STAGES),
        "parquet_scans": len(re.findall(r"Scan parquet", plan)),
        # non-empty PushedFilters lines — a filter reaching the reader
        "pushed_filter_scans": len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        ),
    }
