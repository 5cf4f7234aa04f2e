#!/usr/bin/env python3
"""Merge per-query minima from one or more bench.py JSON lines into the
BASELINE.md regression table as a new (or updated) rightmost column.

Usage: python scripts/merge_bench_column.py LABEL file1.json [file2.json ...]

Reads each file's single JSON line, takes the per-query MINIMUM across
runs, and rewrites the `| query | ... |` table rows in BASELINE.md:
if the header already ends with LABEL the last column is updated
(min with existing value), otherwise a new column is appended. Queries
present in the runs but missing from the table get new rows in sorted
position. Idempotent across repeated invocations.
"""

from __future__ import annotations

import json
import re
import sys

BASELINE = "BASELINE.md"


def main() -> None:
    label = sys.argv[1]
    mins: dict[str, float] = {}
    for path in sys.argv[2:]:
        with open(path) as f:
            text = f.read().strip().splitlines()[-1]
        data = json.loads(text)
        for q, t in data["queries"].items():
            if t is None or t < 0:
                continue
            mins[q] = min(mins.get(q, float("inf")), float(t))

    with open(BASELINE) as f:
        lines = f.read().splitlines(keepends=False)

    # locate the regression table (header starts with "| query |")
    hdr = next(
        i for i, ln in enumerate(lines) if ln.startswith("| query |")
    )
    cols = [c.strip() for c in lines[hdr].strip("|").split("|")]
    have_label = cols[-1] == label
    if not have_label:
        lines[hdr] = lines[hdr].rstrip() + f" {label} |"
        lines[hdr + 1] = lines[hdr + 1].rstrip() + "---|"

    def fmt(v: float) -> str:
        return f"{v:.2f}"

    i = hdr + 2
    seen: set[str] = set()
    while i < len(lines) and lines[i].startswith("| "):
        cells = [c.strip() for c in lines[i].strip("|").split("|")]
        name = cells[0]
        seen.add(name)
        if name in mins:
            if have_label:
                old = cells[-1]
                try:
                    newv = min(float(old), mins[name])
                except ValueError:
                    newv = mins[name]
                cells[-1] = fmt(newv)
            else:
                cells.append(fmt(mins[name]))
        else:
            if not have_label:
                cells.append("—")
        lines[i] = "| " + " | ".join(cells) + " |"
        i += 1

    n_old_cols = len(cols)
    for name in sorted(set(mins) - seen):
        filler = ["—"] * (n_old_cols - 1 if not have_label else n_old_cols - 2)
        row = [name] + filler + [fmt(mins[name])]
        # insert in sorted position within the table
        j = hdr + 2
        while j < i and lines[j].split("|")[1].strip() < name:
            j += 1
        lines.insert(j, "| " + " | ".join(row) + " |")
        i += 1

    with open(BASELINE, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"merged {len(mins)} query minima into column '{label}'")


if __name__ == "__main__":
    main()
