"""Quadkey cell index invariants (tile-grid analogue, SURVEY §2 A10/D2)."""

from __future__ import annotations

import numpy as np

from dle import cells
from dle.config import GRID_SIZE, XMIN, YMIN


def test_roundtrip_point_cell_bounds():
    rng = np.random.default_rng(42)
    for depth in (1, 4, 7):
        xs = XMIN + rng.uniform(0, 1_500_000, 200)
        ys = YMIN + rng.uniform(0, 1_300_000, 200)
        for x, y in zip(xs, ys):
            k = cells.point_cell(x, y, depth)
            assert len(k) == depth
            x0, y0, x1, y1 = cells.cell_bounds(k)
            assert x0 <= x < x1 and y0 <= y < y1


def test_prefix_is_parent():
    k = cells.point_cell(XMIN + 123456.0, YMIN + 654321.0, 8)
    for d in range(1, 8):
        assert cells.point_cell(XMIN + 123456.0, YMIN + 654321.0, d) == k[:d]


def test_cover_contains_point_cell():
    rng = np.random.default_rng(7)
    for _ in range(100):
        x0 = XMIN + rng.uniform(0, 1_400_000)
        y0 = YMIN + rng.uniform(0, 1_200_000)
        x1 = x0 + rng.uniform(1, 300_000)
        y1 = y0 + rng.uniform(1, 300_000)
        cov = set(cells.cover(x0, y0, x1, y1, 4))
        # every interior sample's cell is in the cover
        for fx, fy in [(0.01, 0.01), (0.5, 0.5), (0.99, 0.99)]:
            px = x0 + fx * (x1 - x0)
            py = y0 + fy * (y1 - y0)
            assert cells.point_cell(px, py, 4) in cov


def test_cover_halfopen_on_boundary():
    # a rect ending exactly on a cell boundary does not claim the next cell
    res = GRID_SIZE / (1 << 4)
    x0, y0 = XMIN + res, YMIN + res
    cov = cells.cover(x0, y0, x0 + res, y0 + res, 4)
    assert cov == [cells.point_cell(x0 + 1, y0 + 1, 4)]


def test_numpy_matches_scalar():
    rng = np.random.default_rng(3)
    xs = XMIN + rng.uniform(0, 1_500_000, 500)
    ys = YMIN + rng.uniform(0, 1_300_000, 500)
    got = cells.point_cell_np(xs, ys, 6)
    want = np.array([cells.point_cell(x, y, 6) for x, y in zip(xs, ys)])
    assert (got == want).all()


def test_sql_emitters_match_python(spark):
    rng = np.random.default_rng(11)
    rows = [(float(XMIN + rng.uniform(0, 1_500_000)),
             float(YMIN + rng.uniform(0, 1_300_000))) for _ in range(200)]
    df = spark.createDataFrame(rows, "x double, y double")
    expr = cells.sql_point_cell("x", "y", 5, "spark")
    got = [r.c for r in df.selectExpr(f"{expr} as c").collect()]
    want = [cells.point_cell(x, y, 5) for x, y in rows]
    assert got == want
