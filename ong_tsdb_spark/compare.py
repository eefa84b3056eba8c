"""Cross-engine result canonicalization — THE single definition of
"exact" for the Spark-vs-DuckDB oracle comparisons, shared by the
pytest gate (``tests/test_entry.py``) and the repo replay tool
(``tools/replay.py``) so the two can never drift on NaN handling or
row/column ordering.

Rows are compared after sorting columns by name and rows by ``repr``;
NaN canonicalizes to the string ``"NaN"`` so it equals itself across
engines (IEEE NaN != NaN would make every NaN row "different").
"""

from __future__ import annotations

import math

#: the driver's pre-registered testdata tables
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(canon_value(r[i]) for i in order) for r in rows], key=repr)
