"""Physical-plan shape metrics shared by the snapshot generator
(scripts/plan_snapshot.py) and the regression gate
(tests/test_plan_hygiene.py).

The metrics are deliberately coarse — operator COUNTS, not plan text —
so they are stable across Spark's per-run expression ids while still
catching the regressions that matter at 100 TB: a broadcast join
degrading to sort-merge, a new exchange appearing in a one-shuffle
pipeline, a JVM expression chain silently becoming a Python stage, a
pushed filter falling off a scan.
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
    reused = len(re.findall(r"\bReusedExchange\b", plan))
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)) - reused,
        "reused_exchanges": reused,
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
