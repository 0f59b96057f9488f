"""Golden-pinned regression gate (FIXTURES.md §6): join output rows,
cell assignments, and kernel dissolve/precedence areas at sf0.001,
pinned once from the independent single-threaded oracle
(tests/golden/sf0001.json). The engine must reproduce them exactly —
the north rule's "matching the reference's join output rows and tile
assignments" as an executable assertion, independent of DuckDB being
present at test time."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from dle import queries as q

SF = "/root/testdata/sf0.001"
GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "sf0001.json").read_text())


def _norm(v):
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return str(v)


def _hash(df):
    cols = sorted(df.columns)
    idx = [df.columns.index(c) for c in cols]
    rows = df.collect()
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in idx) for r in rows)
    return (len(rows), cols,
            hashlib.sha256("\n".join(lines).encode()).hexdigest())


def test_golden_pins(spark):
    qs = q.queries()
    for name, want in GOLDEN.items():
        n, cols, sha = _hash(qs[name](spark, SF))
        assert n == want["rows"], f"{name}: rows {n} != {want['rows']}"
        assert cols == want["cols"], name
        assert sha == want["sha256"], f"{name}: value hash drifted"
