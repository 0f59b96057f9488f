"""Engine constants.

The processing extent is the reference's hard-coded BC Albers bounds
(/root/reference/designatedlands.py:303): planar meters, EPSG:3005
convention. The quadkey grid domain is a power-of-two square anchored
at the extent's min corner so that cell boundaries are exact in
float64 and hierarchical prefixes prune like the reference's
``map_tile LIKE 'prefix%'`` (/root/reference/sql/create_tiles.sql).
"""

from __future__ import annotations

# (xmin, ymin, xmax, ymax) — reference designatedlands.py:303
EXTENT = (273287.5, 367687.5, 1870687.5, 1735887.5)
XMIN, YMIN, XMAX, YMAX = EXTENT
WIDTH = XMAX - XMIN    # 1_597_400.0 m
HEIGHT = YMAX - YMIN   # 1_368_200.0 m

# Integer spans used by the deterministic geocoder (SQL-expressible).
WIDTH_I = int(WIDTH)    # 1597400
HEIGHT_I = int(HEIGHT)  # 1368200

# Quadkey domain: 2^21 m = 2097.152 km square covering the extent.
GRID_SIZE = float(1 << 21)

# Default cell depth for tests/small scale: 16x16 grid of ~131 km cells
# (~256 cells over the domain, mirroring FIXTURES.md §5). Production
# depth for 100 TB would be 7-9 (16 km .. 4 km cells).
DEFAULT_DEPTH = 4

# Robustness constants carried over from the reference:
SLIVER_AREA = 10.0        # m^2 — sql/insert_difference.sql:75
SNAP_GRID = 0.1           # m — sql/create_designations_overlapping.sql:56
SNAP_FINE = 0.001         # m — sql/intersect.sql:36

# Shared epoch base for synthetic warc_ts (2024-01-01T00:00:00Z).
WARC_EPOCH0 = 1704067200
YEAR_SECONDS = 31536000


def res_at(depth: int) -> float:
    """Cell side length (m) at a quadkey depth."""
    return GRID_SIZE / float(1 << depth)
