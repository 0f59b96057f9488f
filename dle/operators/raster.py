"""Raster path (SURVEY §2 B1-B3): per-cell vector->raster burn,
precedence fold, rollups, and write+RAT.

The reference holds whole-province numpy arrays in driver RAM (the
64 GB cliff, /root/reference/designatedlands.py:894-897 + README.md:18).
Here a raster is a DataFrame of (cell, block) — each cell's block is a
small uint8 numpy grid burned and folded inside one Arrow task, so the
mosaic never exists in one address space and the RAM cliff is gone
(SURVEY §3.3). Driver-side mosaic only for test-scale export.

Fold semantics (designatedlands.py:888-953):
  * designation plane: first cover in ascending process_order wins
    (precedence; nodata=255)
  * restriction planes: running max per pixel across ALL layers
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..cells import cell_bounds
from ..config import GRID_SIZE, XMAX, XMIN, YMAX, YMIN, res_at
from ..geom import kernel as K
from ..geom import wkb

NODATA = 255

RASTER_SCHEMA = ("cell string, nx int, ny int, designation binary, "
                 "forest binary, og binary, mine binary")


def block_size(depth: int, res: float) -> int:
    n = res_at(depth) / res
    if abs(n - round(n)) > 1e-9:
        raise ValueError(f"res {res} must divide cell size {res_at(depth)}")
    return int(round(n))


def rasterize_fold(layers_tiled: DataFrame, depth: int,
                   res: float,
                   planes: tuple[str, ...] = ("forest", "og", "mine"),
                   ) -> DataFrame:
    """B1+B2 in one pass: burn every tiled feature into its cell's block
    and fold with precedence. Input must have columns cell, geom,
    process_order, and ``<p>_restriction`` for every requested plane.

    ``planes`` selects which restriction planes to fold IN ADDITION to
    the always-computed designation plane (OPTIMIZATION r7, guide
    §1.2/§4.1: a consumer that reads one plane shouldn't pay the
    per-feature max-fold — or the Arrow transfer — of the other three).
    Default keeps the full four-plane output/schema."""
    n = block_size(depth, res)
    bad = [p for p in planes if p not in ("forest", "og", "mine")]
    if bad:
        raise ValueError(f"unknown planes {bad}")
    schema = ("cell string, nx int, ny int, designation binary"
              + "".join(f", {p} binary" for p in planes))

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = pdf["cell"].iloc[0]
        x0, y0, _, _ = cell_bounds(cell)
        desig = np.full((n, n), NODATA, dtype=np.uint8)
        grids = {p: np.zeros((n, n), dtype=np.uint8) for p in planes}
        # columnized accessors: one .to_numpy() per column per batch,
        # plain array indexing in the per-feature loop (no .iloc)
        pos = pdf["process_order"].to_numpy()
        geoms = pdf["geom"].to_numpy()
        lvls = [(grids[p], pdf[f"{p}_restriction"].to_numpy())
                for p in planes]
        order = np.lexsort((pdf.index.to_numpy(), pos))
        for i in order:
            rings = wkb.parse_rings(bytes(geoms[i]))
            m = K.rasterize_mask(rings, x0, y0, res, n, n)
            if not m.any():
                continue
            desig[m & (desig == NODATA)] = int(pos[i])
            for g, lv in lvls:
                g[m] = np.maximum(g[m], int(lv[i]))
        row = {"cell": cell, "nx": n, "ny": n,
               "designation": desig.tobytes()}
        for p in planes:
            row[p] = grids[p].tobytes()
        return pd.DataFrame([row])

    return layers_tiled.groupBy("cell").applyInPandas(per_cell, schema)


def raster_value_counts(raster: DataFrame, plane: str = "designation",
                        clip_extent: bool = True,
                        covered_only: bool = False) -> DataFrame:
    """B2 rollup: pixel histogram per plane value across all cells —
    distributed bincount (map-side per cell, one tiny shuffle).
    ``covered_only`` restricts to pixels claimed by some designation
    (designation plane != nodata)."""
    cols = ["cell", "nx", "ny", plane]
    if covered_only and "designation" not in cols:
        cols.append("designation")
    # guide §4.1: mapInPandas is opaque to column pruning — an explicit
    # select keeps unread plane blobs out of the Arrow transfer
    raster = raster.select(*cols)

    def counts(it):
        for pdf in it:
            out = {}
            for cell, nx, ny, blob, dblob in zip(
                    pdf["cell"], pdf["nx"], pdf["ny"], pdf[plane],
                    pdf["designation"]):
                arr = np.frombuffer(blob, dtype=np.uint8).reshape(ny, nx)
                keep = np.ones((ny, nx), dtype=bool)
                if covered_only:
                    d = np.frombuffer(dblob, dtype=np.uint8).reshape(
                        ny, nx)
                    keep &= d != NODATA
                if clip_extent:
                    x0, y0, _, _ = cell_bounds(cell)
                    res = res_at(len(cell)) / nx
                    xs = x0 + (np.arange(nx) + 0.5) * res
                    ys = y0 + (np.arange(ny) + 0.5) * res
                    keep &= ((ys > YMIN) & (ys < YMAX))[:, None]
                    keep &= ((xs > XMIN) & (xs < XMAX))[None, :]
                vals, cnts = np.unique(arr[keep], return_counts=True)
                for v, c in zip(vals, cnts):
                    out[int(v)] = out.get(int(v), 0) + int(c)
            yield pd.DataFrame(
                {"value": list(out), "n_pixels": list(out.values())})

    part = raster.mapInPandas(counts, "value int, n_pixels bigint")
    return part.groupBy("value").agg(
        F.sum("n_pixels").alias("n_pixels"))


def zonal_stats(raster: DataFrame, value_of,
                plane: str = "designation",
                exclude: int = NODATA) -> DataFrame:
    """Zonal statistics (B2 extension): per zone (plane value),
    pixel count and sum of a value raster computed from GLOBAL pixel
    indices — ``value_of(gx, gy) -> ndarray`` (e.g. a DEM/landcover
    lookup; here an arithmetic stand-in, no raster I/O in sandbox).
    Map-side per-cell bincount partials, one tiny shuffle — the same
    distributed shape as raster_value_counts."""
    raster = raster.select("cell", "nx", "ny", plane)  # guide §4.1

    def per(it):
        for pdf in it:
            sums = np.zeros(256, dtype=np.float64)
            cnts = np.zeros(256, dtype=np.int64)
            for cell, nx, ny, blob in zip(
                    pdf["cell"], pdf["nx"], pdf["ny"], pdf[plane]):
                zone = np.frombuffer(blob, dtype=np.uint8).reshape(
                    ny, nx)
                x0, y0, _, _ = cell_bounds(cell)
                res = res_at(len(cell)) / nx
                gx0 = int(round((x0 - XMIN) / res))
                gy0 = int(round((y0 - YMIN) / res))
                gx = gx0 + np.arange(nx)
                gy = gy0 + np.arange(ny)
                v = value_of(gx[None, :], gy[:, None]) \
                    * np.ones((ny, nx))
                keep = zone != exclude
                z = zone[keep].astype(np.int64)
                cnts += np.bincount(z, minlength=256)
                sums += np.bincount(z, weights=v[keep], minlength=256)
            nz = np.flatnonzero(cnts)
            yield pd.DataFrame({
                "value": nz.astype(np.int32),
                "n_pixels": cnts[nz],
                "sum_value": sums[nz]})

    part = raster.mapInPandas(
        per, "value int, n_pixels bigint, sum_value double")
    # sum stays DOUBLE: value_of is a DEM/landcover lookup and generally
    # non-integral; comparison-boundary casts belong in the gate query
    # (ADVICE r2 — repo determinism rule: round/cast only at boundaries)
    return part.groupBy("value").agg(
        F.sum("n_pixels").alias("n_pixels"),
        F.sum("sum_value").alias("sum_value"))


def rat(registry: DataFrame) -> DataFrame:
    """B3 raster attribute table: VALUE -> DESCRIPTION legend
    (/root/reference/designatedlands.py:116-142)."""
    return (registry.select(
        F.col("process_order").alias("value"),
        F.col("designation").alias("description"))
        .distinct().orderBy("value"))


def rat_aux_xml(legend: list[tuple[int, str]]) -> str:
    """GDAL PAM sidecar XML carrying the raster attribute table — the
    way GDAL itself persists a RAT for a GTiff (an `.aux.xml` next to
    the .tif), so QGIS/ArcGIS show the VALUE -> DESCRIPTION legend
    when opening the artifact (VERDICT r4 'What's missing' #3; the
    reference attaches the same two columns via rasterio/GDAL,
    designatedlands.py:116-142). Field usages: VALUE = GFU_MinMax (5),
    DESCRIPTION = GFU_Name (2)."""
    from xml.sax.saxutils import escape
    rows = "\n".join(
        f'    <Row index="{i}"><F>{int(v)}</F>'
        f"<F>{escape(str(d))}</F></Row>"
        for i, (v, d) in enumerate(legend))
    return f"""<PAMDataset>
 <PAMRasterBand band="1">
  <GDALRasterAttributeTable tableType="thematic">
   <FieldDefn index="0"><Name>VALUE</Name><Type>0</Type><Usage>5</Usage></FieldDefn>
   <FieldDefn index="1"><Name>DESCRIPTION</Name><Type>2</Type><Usage>2</Usage></FieldDefn>
{rows}
  </GDALRasterAttributeTable>
 </PAMRasterBand>
</PAMDataset>
"""


def write_raster(raster: DataFrame, path: str,
                 registry: DataFrame | None = None,
                 geotiff: bool = False,
                 plane: str = "designation") -> None:
    """B3 write: per-cell blocks as parquet partitioned by cell (the
    COG-tiles analogue) + RAT sidecar. ``geotiff=True`` additionally
    writes the driver-side mosaic as a REAL georeferenced GeoTIFF
    (sources/geotiff.py — the reference's designatedlands.tif,
    designatedlands.py:956-991; final artifact, test scale) and, when
    a registry is supplied, the legend twice: embedded IN-FILE as the
    GDAL_METADATA TIFF tag (geotiff.gdal_metadata_xml) and as the
    GDAL-PAM `.aux.xml` RAT sidecar (rat_aux_xml)."""
    raster.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/blocks")
    legend = None
    if registry is not None:
        r = rat(registry)
        r.write.mode("overwrite").parquet(f"{path}/rat")
        legend = [(row["value"], row["description"])
                  for row in r.collect()]
    if geotiff:
        from ..sources.geotiff import gdal_metadata_xml, write_geotiff
        m = mosaic(raster, plane)
        if m.size:
            res = GRID_SIZE / m.shape[0]
            # mosaic row 0 is the SOUTH row (y grows upward): flip to
            # the TIFF's north-up row order
            tif = f"{path}/{plane}.tif"
            write_geotiff(m[::-1], tif,
                          x0=XMIN, y_top=YMIN + GRID_SIZE, res=res,
                          gdal_metadata=(gdal_metadata_xml(legend)
                                         if legend is not None else None))
            if legend is not None:
                with open(tif + ".aux.xml", "w") as f:
                    f.write(rat_aux_xml(legend))


def mosaic(raster: DataFrame, plane: str = "designation") -> np.ndarray:
    """Driver-side mosaic for TEST-SCALE export/inspection only."""
    rows = raster.select("cell", "nx", "ny", plane).collect()
    if not rows:
        return np.zeros((0, 0), dtype=np.uint8)
    depth = len(rows[0]["cell"])
    n = rows[0]["nx"]
    side = (1 << depth) * n
    out = np.full((side, side), NODATA, dtype=np.uint8)
    for r in rows:
        x0, y0, _, _ = cell_bounds(r["cell"])
        res = res_at(depth) / n
        ci = int(round((x0 - XMIN) / (n * res)))
        cj = int(round((y0 - YMIN) / (n * res)))
        blk = np.frombuffer(r[plane], dtype=np.uint8).reshape(n, n)
        out[cj * n:(cj + 1) * n, ci * n:(ci + 1) * n] = blk
    return out
