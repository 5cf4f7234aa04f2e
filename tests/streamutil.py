"""Shared helper for draining streaming queries in tests.

`StreamingQuery.awaitTermination(timeout)` returns False SILENTLY when the
query is still running at the deadline; a test that then reads the sink
asserts against a partially-drained result and fails with a confusing
value mismatch (observed as a load-dependent flake in the full suite).
Drain through this helper instead: it surfaces the timeout as the actual
error, attaches the query's exception if one is pending, and stops the
query so it can't leak into later tests.
"""

from __future__ import annotations


def drain_query(q, timeout=300):
    """Block until `q` terminates; raise if it is still active at `timeout`."""
    if q.awaitTermination(timeout):
        return
    exc = q.exception()
    try:
        q.stop()
    except Exception:
        pass
    raise AssertionError(
        f"streaming query still active after {timeout}s"
        + (f"; pending exception: {exc}" if exc else "")
    )
