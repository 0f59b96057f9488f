"""Gate-checkable raster queries (SURVEY §2 B1-B3).

The engine runs the REAL raster path — tile -> per-cell scanline burn
-> precedence fold -> distributed pixel histogram — while the oracle
recomputes the same per-pixel winners relationally: pixel centers sit
on a .5-offset lattice and rectangle bounds on the integer lattice, so
"center strictly inside rect" is exact SQL arithmetic with no boundary
ambiguity (see sqlgen determinism rules).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from . import sqlgen
from .config import XMIN, YMIN
from .geom import wkb
from .operators.overlay import tile_geoms
from .operators.raster import rasterize_fold, raster_value_counts

DEPTH = 4
RES = 4096.0  # m/px -> 32x32 blocks per depth-4 cell
NGX = 391     # ceil(extent / RES) + 1 pixel columns/rows to cover BC
NGY = 335

_rect_wkb = F.pandas_udf(
    lambda x0, y0, x1, y1: pd.Series(
        [wkb.polygon_wkb([[[a, b], [c, b], [c, d], [a, d], [a, b]]])
         for a, b, c, d in zip(x0, y0, x1, y1)]),
    BinaryType())


def _raster(spark, sf, planes=()):
    """OPTIMIZATION r7: each gate requests only the restriction planes
    it reads (guide §1.2/§4.1) — the designation plane is always folded;
    unrequested planes skip both the per-feature max-fold in
    rasterize_fold and the restriction columns through the tiler's
    Arrow boundary. Results are per-plane independent (pinned by
    tests/test_raster.py::test_plane_subset_matches_full)."""
    sqlgen.register_tables(spark, sf)
    lay = sqlgen.spark_view(spark, sf, "layers").withColumn(
        "geom", _rect_wkb("x0", "y0", "x1", "y1"))
    cols = (["process_order"]
            + [f"{p}_restriction" for p in planes] + ["geom"])
    tiled = tile_geoms(lay.select(*cols), DEPTH)
    return rasterize_fold(tiled, DEPTH, RES, planes=planes)


def q_raster_precedence_pixels(spark, sf):
    """Designation plane histogram: pixels won per designation."""
    counts = raster_value_counts(_raster(spark, sf), "designation")
    return (counts.where(F.col("value") != 255)
            .select(F.concat(
                F.lit("desig_"),
                F.lpad(F.col("value").cast("string"), 2, "0"))
                .alias("designation"),
                "n_pixels"))


def _pix(dialect: str) -> str:
    gx = sqlgen.series(NGX, "gx", "i", dialect)
    gy = sqlgen.series(NGY, "gy", "i", dialect)
    return (f"pix as (select cast({XMIN!r} as double)"
            f" + (gx.i + 0.5) * {RES!r} as px,"
            f" cast({YMIN!r} as double) + (gy.i + 0.5) * {RES!r} as py"
            f" from {gx}, {gy})")


def o_raster_precedence_pixels():
    return (sqlgen.preamble("duckdb", pages=False) + f"""
 , {_pix('duckdb')},
 won as (
   select p.px, p.py, min(l.process_order) as po
   from pix p join layers l
     on p.px > l.x0 and p.px < l.x1 and p.py > l.y0 and p.py < l.y1
   group by p.px, p.py)
 select concat('desig_', lpad(cast(po as string), 2, '0')) as designation,
        cast(count(*) as bigint) as n_pixels
 from won group by po""")


def q_raster_forest_pixels(spark, sf):
    """Forest-restriction plane histogram over covered pixels (max
    semantics, designatedlands.py:942-953)."""
    counts = raster_value_counts(_raster(spark, sf, planes=("forest",)),
                                 "forest", covered_only=True)
    return counts.select(F.col("value").alias("forest_level"),
                         "n_pixels")


def o_raster_forest_pixels():
    return (sqlgen.preamble("duckdb", pages=False) + f"""
 , {_pix('duckdb')},
 mx as (
   select p.px, p.py, max(l.forest_restriction) as lvl
   from pix p join layers l
     on p.px > l.x0 and p.px < l.x1 and p.py > l.y0 and p.py < l.y1
   group by p.px, p.py)
 select cast(lvl as int) as forest_level,
        cast(count(*) as bigint) as n_pixels
 from mx group by lvl""")


def q_raster_zonal_stats(spark, sf):
    """Zonal statistics over the precedence-won designation zones:
    count + sum of a deterministic per-pixel value ((gx + gy) % 7, the
    arithmetic stand-in for a DEM/landcover raster) per zone. Engine =
    per-cell numpy bincount partials; oracle = the same per-pixel
    winners and values relationally."""
    from .operators.raster import zonal_stats
    out = zonal_stats(_raster(spark, sf),
                      lambda gx, gy: (gx + gy) % 7)
    return out.select(
        F.concat(F.lit("desig_"),
                 F.lpad(F.col("value").cast("string"), 2, "0"))
        .alias("designation"),
        "n_pixels",
        # integer-valued doubles (|sum| << 2^53): exact cast at the
        # comparison boundary
        F.col("sum_value").cast("bigint").alias("sum_value"))


def o_raster_zonal_stats():
    return (sqlgen.preamble("duckdb", pages=False) + f"""
 , pixi as (select gx.i as ix, gy.i as iy,
             cast({XMIN!r} as double) + (gx.i + 0.5) * {RES!r} as px,
             cast({YMIN!r} as double) + (gy.i + 0.5) * {RES!r} as py
        from {sqlgen.series(NGX, 'gx', 'i', 'duckdb')},
             {sqlgen.series(NGY, 'gy', 'i', 'duckdb')}),
 won as (
   select p.ix, p.iy, min(l.process_order) as po
   from pixi p join layers l
     on p.px > l.x0 and p.px < l.x1 and p.py > l.y0 and p.py < l.y1
   group by p.ix, p.iy)
 select concat('desig_', lpad(cast(po as string), 2, '0'))
          as designation,
        cast(count(*) as bigint) as n_pixels,
        cast(sum((ix + iy) % 7) as bigint) as sum_value
 from won group by po""")


RASTER_QUERIES = {
    "raster_zonal_stats": (q_raster_zonal_stats, o_raster_zonal_stats),
    "raster_precedence_pixels": (q_raster_precedence_pixels,
                                 o_raster_precedence_pixels),
    "raster_forest_pixels": (q_raster_forest_pixels,
                             o_raster_forest_pixels),
}
