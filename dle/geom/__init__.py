"""Pure-numpy geometry kernel (no GEOS in the sandbox).

`wkb`    — WKB codec for Point / Polygon / MultiPolygon.
`kernel` — slab-decomposition boolean ops on grid-snapped polygons:
           union_all, intersection, difference, planarize faces, area,
           point_on_surface, make_valid. One primitive covers the
           reference's ST_Union/ST_Intersection/ST_Difference/
           ST_Polygonize/ST_MakeValid surface (SURVEY §2 H/I).

If shapely (GEOS) is importable it can be used as a fast path by the
operators; the kernel remains the deterministic sandbox implementation
and the test oracle.
"""
