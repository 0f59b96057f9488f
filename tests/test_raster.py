"""Raster operators (B1-B3): burn accuracy, fold semantics, mosaic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dle import datagen
from dle.geom import kernel as K
from dle.operators.overlay import tile_geoms
from dle.operators.raster import (
    mosaic, raster_value_counts, rasterize_fold, rat, write_raster,
)

SF = "/root/testdata/sf0.001"


def test_rasterize_mask_rect_exact():
    # rect [10,20)x[10,30) on a 1m grid: centers at .5 offsets
    m = K.rasterize_mask(K.rect_rings(10, 10, 20, 30), 0, 0, 1.0, 40, 40)
    assert m.sum() == 10 * 20
    assert m[10, 10] and m[29, 19] and not m[9, 10] and not m[30, 10]


def test_rasterize_mask_rotated_converges_to_area():
    th = 0.7
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s], [s, c]])
    rot = [(K.rect_rings(-300, -100, 300, 100)[0] @ R.T) + [1000.0, 1000.0]]
    area = K.boolean_area(rot, [], "a", 0.1)
    m = K.rasterize_mask(rot, 0, 0, 4.0, 512, 512)
    assert m.sum() * 16.0 == pytest.approx(area, rel=0.02)


def test_rasterize_mask_hole():
    rings = K.difference(K.rect_rings(0, 0, 100, 100),
                         K.rect_rings(25, 25, 75, 75), 1.0)
    m = K.rasterize_mask(rings, 0, 0, 1.0, 100, 100)
    assert m.sum() == 10000 - 2500
    assert not m[50, 50]


def test_fold_precedence_and_write(spark, tmp_path):
    lay = datagen.layers_poly(spark, SF)
    tiled = tile_geoms(
        lay.select("process_order", "forest_restriction",
                   "og_restriction", "mine_restriction", "geom"), 3)
    raster = rasterize_fold(tiled, 3, 8192.0)
    counts = {r["value"]: r["n_pixels"]
              for r in raster_value_counts(raster, "designation")
              .collect()}
    assert set(counts) - {255} <= set(range(1, 9))
    assert sum(v for k, v in counts.items() if k != 255) > 0
    # restriction plane: covered-only histogram stays within levels 0-5
    f = {r["value"]: r["n_pixels"]
         for r in raster_value_counts(raster, "forest",
                                      covered_only=True).collect()}
    assert set(f) <= set(range(6))
    # write + RAT
    reg = lay.select("process_order", "designation").distinct()
    write_raster(raster, str(tmp_path / "r"), registry=reg)
    back = spark.read.parquet(str(tmp_path / "r/blocks"))
    assert back.count() == raster.count()
    legend = {r["value"]: r["description"]
              for r in spark.read.parquet(str(tmp_path / "r/rat"))
              .collect()}
    assert legend[1] == "desig_01"
    # driver mosaic pixel histogram == distributed histogram
    mz = mosaic(raster)
    vals, cnts = np.unique(mz, return_counts=True)
    mh = dict(zip(vals.tolist(), cnts.tolist()))
    for k, v in counts.items():
        if k != 255:
            assert mh[k] == v


def test_plane_subset_matches_full(spark):
    """r7 plane-subset optimization: folding only the requested planes
    yields byte-identical blocks for those planes (and the designation
    plane) vs the full four-plane fold — planes are independent."""
    lay = datagen.layers_poly(spark, SF)
    tiled_full = tile_geoms(
        lay.select("process_order", "forest_restriction",
                   "og_restriction", "mine_restriction", "geom"), 3)
    full = {r["cell"]: r for r in
            rasterize_fold(tiled_full, 3, 8192.0).collect()}
    # designation-only fold (zonal/precedence gates' shape)
    tiled_d = tile_geoms(lay.select("process_order", "geom"), 3)
    dsub = rasterize_fold(tiled_d, 3, 8192.0, planes=())
    assert dsub.columns == ["cell", "nx", "ny", "designation"]
    dmap = {r["cell"]: r for r in dsub.collect()}
    assert set(dmap) == set(full)
    for cell, r in dmap.items():
        assert bytes(r["designation"]) == bytes(full[cell]["designation"])
    # single restriction plane (forest gate's shape)
    tiled_f = tile_geoms(
        lay.select("process_order", "forest_restriction", "geom"), 3)
    fsub = rasterize_fold(tiled_f, 3, 8192.0, planes=("forest",))
    assert fsub.columns == ["cell", "nx", "ny", "designation", "forest"]
    for r in fsub.collect():
        assert bytes(r["forest"]) == bytes(full[r["cell"]]["forest"])
    with pytest.raises(ValueError):
        rasterize_fold(tiled_f, 3, 8192.0, planes=("bogus",))
