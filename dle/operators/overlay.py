"""WKB overlay operators (SURVEY §2 A1-A10) — Spark DataFrame wrappers
around the slab-decomposition kernel.

Physical shape shared by every operator:
  1. JVM phase: bbox extraction once, `explode(cover_cells(bbox))`
     (spatial_join.explode_rect_cells), shuffle/broadcast keyed by
     `cell` — the reference's per-tile fan-out
     (/root/reference/designatedlands.py:810-817) becomes Spark tasks.
  2. Arrow phase: a grouped pandas UDF runs the numpy kernel on each
     cell group. Geometry never crosses cells after tiling, so groups
     are embarrassingly parallel — same guarantee the reference gets
     from per-tile SQL (sql/create_designations_planarized.sql:8).

All geometry columns are WKB BinaryType. All ops snap at GRID=0.1 m
(the reference's intersection/union grid size,
sql/create_designations_overlapping.sql:56) which also makes results
independent of partitioning and input order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..cells import cell_bounds
from ..config import SLIVER_AREA, SNAP_GRID
from ..geom import kernel as K
from ..geom import wkb
from .. import telemetry
from .spatial_join import explode_rect_cells

GRID = SNAP_GRID


# --------------------------------------------------------- helpers

_bbox_udf = F.pandas_udf(
    lambda g: pd.Series([_bbox(b) for b in g]),
    ArrayType(DoubleType()))


def _bbox(buf: bytes) -> list[float]:
    rings = wkb.parse_rings(bytes(buf))
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    return [float(xs.min()), float(ys.min()),
            float(xs.max()), float(ys.max())]


def with_bbox(df: DataFrame, geom: str = "geom") -> DataFrame:
    df = df.withColumn("_bb", _bbox_udf(geom))
    return (df.withColumn("bx0", F.col("_bb")[0])
              .withColumn("by0", F.col("_bb")[1])
              .withColumn("bx1", F.col("_bb")[2])
              .withColumn("by1", F.col("_bb")[3])
              .drop("_bb"))


_area_udf = F.pandas_udf(
    lambda g: pd.Series([K.area(wkb.parse_rings(bytes(b))) for b in g]),
    DoubleType())


def with_area(df: DataFrame, geom: str = "geom",
              out: str = "area_m2") -> DataFrame:
    """ST_Area analogue (vectorized shoelace)."""
    return df.withColumn(out, _area_udf(geom))


def _schema_of(df: DataFrame, *extra: str) -> str:
    parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in
             df.schema.fields]
    return ", ".join(parts + list(extra))


# ------------------------------------------------------------ tile

def tile_geoms(df: DataFrame, depth: int, geom: str = "geom",
               grid: float = GRID) -> DataFrame:
    """A3 tile: dice every geometry by the cell grid. One output row per
    (input row, covering cell) with geom clipped to the cell bbox
    (coveredby fastpath: single-cell features pass through unclipped —
    sql/tile.sql:43-47).

    Physical shape: clipping each (row, cell) pair is per-row
    independent, so it runs as `mapInPandas` directly over the exploded
    scan output — NO shuffle (VERDICT r1 finding #4: the old
    groupBy(cell) form forced a full exchange of the fact table before
    any clip). Downstream dissolve/cogroup operators shuffle by cell
    only when they actually group."""
    bb = with_bbox(df, geom)
    e = explode_rect_cells(bb, "bx0", "by0", "bx1", "by1", depth)
    e = e.drop("_cx", "_cy")
    out_schema = _schema_of(e)
    gcol = geom
    _acc = telemetry.capture()

    def clip_batches(it):
        for pdf in it:
            outs, keep = [], []
            for i, (buf, cell) in enumerate(zip(pdf[gcol], pdf["cell"])):
                x0, y0, x1, y1 = cell_bounds(cell)
                rings = wkb.parse_rings(bytes(buf))
                if K.covered_by_bbox(rings, x0, y0, x1, y1):
                    outs.append(bytes(buf))
                    keep.append(i)
                    continue
                clipped = K.clip_bbox(rings, x0, y0, x1, y1)
                clipped = K.make_valid(clipped, grid)
                if clipped and K.area(clipped) > 0:
                    outs.append(wkb.rings_wkb(clipped))
                    keep.append(i)
            res = pdf.iloc[keep].copy()
            res[gcol] = outs
            telemetry.drain(_acc)
            yield res

    return e.mapInPandas(clip_batches, out_schema)


def tile_geoms_mixed(df: DataFrame, depth_col: str = "tile_depth",
                     geom: str = "geom", grid: float = GRID) -> DataFrame:
    """A3 tile with PER-ROW cell depth (VERDICT r4 #5) — the
    reference's TWO-SCALE tile system: 1:20k land tiles mixed with
    coarser 1:250k marine tiles in one grid with prefix semantics
    (/root/reference/sql/create_tiles.sql:21-90, esp. :45-63). Sparse
    layer classes tile at a coarse depth (fewer, bigger cells — no
    per-feature cell explosion for layers that barely overlap
    anything), dense classes at a fine depth; the caller stamps
    `depth_col` per row (e.g. by layer class).

    Emitted quadkeys are PREFIX-COMPATIBLE across depths: a depth-d
    key is the first d characters of every deeper key inside it, so
    downstream prefix pruning (`cell LIKE 'prefix%'` — the reference's
    map_tile pruning, sql/insert_difference.sql:27) and
    startswith-joins work across mixed depths unchanged.

    Physical shape matches tile_geoms: per-row independent cover +
    clip in one mapInPandas over the scan — NO shuffle (the cover-cell
    enumeration happens inside the kernel batch rather than as a JVM
    explode, since the depth varies per row)."""
    from ..cells import cell_bounds as _cb, cover as _cover

    bb = with_bbox(df, geom)
    out_schema = _schema_of(bb) + ", `cell` string"
    _acc = telemetry.capture()

    def tile_batches(it):
        # Columnar row assembly (VERDICT r5 #3): collect (source index,
        # clipped geom, cell) lists and take ONE pdf.iloc[src] per
        # batch — the tile_geoms keep-list pattern — instead of a
        # Python dict per emitted (row, cell) pair, which dominated on
        # dense fine-depth layers.
        for pdf in it:
            depths = pdf[depth_col].to_numpy()
            bxs0 = pdf["bx0"].to_numpy(dtype="float64")
            bys0 = pdf["by0"].to_numpy(dtype="float64")
            bxs1 = pdf["bx1"].to_numpy(dtype="float64")
            bys1 = pdf["by1"].to_numpy(dtype="float64")
            src, geoms, cells_out = [], [], []
            for i in range(len(pdf)):
                buf = bytes(pdf[geom].iloc[i])
                rings = wkb.parse_rings(buf)
                for c in _cover(bxs0[i], bys0[i], bxs1[i], bys1[i],
                                int(depths[i])):
                    x0, y0, x1, y1 = _cb(c)
                    if K.covered_by_bbox(rings, x0, y0, x1, y1):
                        out_geom = buf
                    else:
                        clipped = K.clip_bbox(rings, x0, y0, x1, y1)
                        clipped = K.make_valid(clipped, grid)
                        if not clipped or K.area(clipped) <= 0:
                            continue
                        out_geom = wkb.rings_wkb(clipped)
                    src.append(i)
                    geoms.append(out_geom)
                    cells_out.append(c)
            telemetry.drain(_acc)
            res = pdf.iloc[src].reset_index(drop=True)
            res[geom] = pd.Series(geoms, dtype="object")
            res["cell"] = pd.Series(cells_out, dtype="object")
            yield res

    return bb.mapInPandas(tile_batches, out_schema)


def tile_geoms_grid(df: DataFrame, fine_cells: set, coarse_depth: int,
                    fine_depth: int, geom: str = "geom",
                    grid: float = GRID) -> DataFrame:
    """A3 tile against a MIXED SPATIAL PARTITION (VERDICT r5 #4 — the
    reference's actual two-scale grid semantics, /root/reference/sql/
    create_tiles.sql:21-90): the grid itself is a partition of space —
    coarse depth-``coarse_depth`` cells everywhere EXCEPT the cells
    named in ``fine_cells`` (coarse quadkeys), which are refined to
    depth-``fine_depth`` subcells. The reference keeps 1:250k tiles in
    marine areas and 1:20k tiles on land; here ``fine_cells`` is
    derived from the layer-class / boundary data (see
    plans.pipeline.process_vector), so every feature — whatever layer —
    is cut by the SAME grid, and cell keys align across all tables for
    downstream cogroups exactly like the reference's map_tile.

    Emitted keys are prefix-compatible across the two depths (a coarse
    key is the prefix of every fine key inside it) and the partition
    property guarantees a coarse key and a fine key never overlap
    spatially.

    Physical shape matches tile_geoms: per-row cover + clip in one
    mapInPandas over the scan, NO shuffle; ``fine_cells`` rides the
    task closure as a broadcast-sized set (|cells| <= 4^coarse_depth).
    """
    from ..cells import cell_bounds as _cb, cover as _cover

    bb = with_bbox(df, geom)
    out_schema = _schema_of(bb) + ", `cell` string"
    gcol = geom
    fine_set = frozenset(fine_cells)
    _acc = telemetry.capture()

    def tile_batches(it):
        for pdf in it:
            bxs0 = pdf["bx0"].to_numpy(dtype="float64")
            bys0 = pdf["by0"].to_numpy(dtype="float64")
            bxs1 = pdf["bx1"].to_numpy(dtype="float64")
            bys1 = pdf["by1"].to_numpy(dtype="float64")
            src, geoms, cells_out = [], [], []
            for i in range(len(pdf)):
                buf = bytes(pdf[gcol].iloc[i])
                rings = wkb.parse_rings(buf)
                cells = []
                for c in _cover(bxs0[i], bys0[i], bxs1[i], bys1[i],
                                coarse_depth):
                    if c in fine_set:
                        # refine: fine covering cells inside this
                        # coarse cell = cover of the bbox clamped to
                        # the cell (half-open cover keeps the clamp
                        # from leaking into neighbours)
                        cx0, cy0, cx1, cy1 = _cb(c)
                        cells.extend(_cover(
                            max(bxs0[i], cx0), max(bys0[i], cy0),
                            min(bxs1[i], cx1), min(bys1[i], cy1),
                            fine_depth))
                    else:
                        cells.append(c)
                for c in cells:
                    x0, y0, x1, y1 = _cb(c)
                    if K.covered_by_bbox(rings, x0, y0, x1, y1):
                        out_geom = buf
                    else:
                        clipped = K.clip_bbox(rings, x0, y0, x1, y1)
                        clipped = K.make_valid(clipped, grid)
                        if not clipped or K.area(clipped) <= 0:
                            continue
                        out_geom = wkb.rings_wkb(clipped)
                    src.append(i)
                    geoms.append(out_geom)
                    cells_out.append(c)
            telemetry.drain(_acc)
            res = pdf.iloc[src].reset_index(drop=True)
            res[gcol] = pd.Series(geoms, dtype="object")
            res["cell"] = pd.Series(cells_out, dtype="object")
            yield res

    return bb.mapInPandas(tile_batches, out_schema)


# -------------------------------------------------------- dissolve

def dissolve(df: DataFrame, keys: list[str], geom: str = "geom",
             grid: float = GRID, explode_parts: bool = False) -> DataFrame:
    """A2/F1 dissolve: union of all geometries per key group
    (ST_Union … GROUP BY — designatedlands.py:102-113). With
    `explode_parts`, multipart results are dumped to one row per
    polygon part (ST_Dump, sql/tile.sql:36)."""
    cols = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}"
                     for c in keys)
    schema = f"{cols}, `{geom}` binary" + (
        ", part_i int" if explode_parts else "")

    _acc = telemetry.capture()

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = K.union_all(
            [wkb.parse_rings(bytes(b)) for b in pdf[geom]], grid)
        telemetry.drain(_acc)
        head = pdf.iloc[:1][keys]
        if not rings:
            empty = head.iloc[0:0].assign(**{geom: []})
            if explode_parts:
                empty = empty.assign(part_i=pd.array([], dtype="int32"))
            return empty
        if not explode_parts:
            return head.assign(**{geom: [wkb.rings_wkb(rings)]})
        parts = split_parts(rings)
        rep = pd.concat([head] * len(parts), ignore_index=True)
        rep[geom] = [wkb.rings_wkb(p) for p in parts]
        rep["part_i"] = range(len(parts))
        return rep

    return df.groupBy(*keys).applyInPandas(agg, schema)


def split_parts(rings: list) -> list[list]:
    """ST_Dump: split a ring soup into polygons (shell + its holes)."""
    shells, holes = [], []
    for r in rings:
        (shells if wkb.ring_area(r) >= 0 else holes).append(r)
    if not shells:
        return [[r] for r in rings]
    out = [[s] for s in shells]
    for h in holes:
        for p in out:
            if wkb._point_in_ring(h[0][0], h[0][1], p[0]):
                p.append(h)
                break
        else:
            out[0].append(h)
    return out


# ------------------------------------------------------------ buffer

def buffer_geoms(df: DataFrame, radius: float, geom: str = "geom",
                 grid: float = GRID) -> DataFrame:
    """H ST_Buffer analogue (VERDICT r3 #4): signed square-radius
    offset of every geometry — the reference leans on ST_Buffer for
    ±0.001 m topology cleaning, blocker dilation and the 250 m north
    border buffer (/root/reference/sql/insert_difference.sql:45-53,
    :104-106; sql/create_tiles.sql:68; sql/ST_Safe_Difference.sql:
    60-70). radius > 0 dilates (Minkowski with the axis-aligned
    square), radius < 0 erodes (complement duality), 0 repairs;
    dilate-then-erode at the same radius is the reference's
    closing-style sliver/gap cleaning ladder. Per-row mapInPandas —
    embarrassingly parallel, no shuffle; rows whose geometry erodes
    away entirely are dropped (ST_Buffer's empty-result contract)."""
    out_schema = _schema_of(df)
    _acc = telemetry.capture()

    def do_buffer(it):
        for pdf in it:
            outs, keep = [], []
            for i, buf in enumerate(pdf[geom]):
                rings = K.buffer_rings(
                    wkb.parse_rings(bytes(buf)), radius, grid)
                if rings and K.area(rings) > 0:
                    outs.append(wkb.rings_wkb(rings))
                    keep.append(i)
            res = pdf.iloc[keep].copy()
            res[geom] = outs
            telemetry.drain(_acc)
            yield res

    return df.mapInPandas(do_buffer, out_schema)


# ------------------------------------------------------------ clip

def clip(df_a: DataFrame, df_b: DataFrame, depth: int,
         geom: str = "geom", grid: float = GRID,
         b_tiled: bool = False, fine_cells: set | None = None,
         coarse_depth: int | None = None) -> DataFrame:
    """A1 clip: intersect A's geometries with the union of B, keeping
    A's attributes (designatedlands.py:82-99). Cell-cogrouped; cells
    fully covered by B pass A through unchanged (coveredby fastpath).
    `b_tiled=True` accepts a pre-tiled B (cell + geom columns), e.g.
    the composed bc_boundary output of plans.boundary.build_boundary.

    With `fine_cells`/`coarse_depth` set, A tiles against the TWO-SCALE
    grid (tile_geoms_grid — fine depth-``depth`` cells inside
    ``fine_cells``, coarse cells elsewhere, create_tiles.sql:45-63):
    pieces in coarse cells cannot match any fine B cell and cogroup
    against empty B — dropped, exactly the clip semantics — so the
    result is identical to single-depth tiling while sparse/marine
    features never explode into fine cells they'd only be clipped away
    from."""
    if fine_cells is not None:
        a = tile_geoms_grid(df_a, fine_cells, coarse_depth, depth,
                            geom, grid) \
            .drop("bx0", "by0", "bx1", "by1")
    else:
        a = tile_geoms(df_a, depth, geom, grid) \
            .drop("bx0", "by0", "bx1", "by1")
    if b_tiled:
        b = df_b.select("cell", F.col(geom).alias("_bgeom"))
    else:
        b = tile_geoms(df_b.select(geom), depth, geom, grid) \
            .select("cell", F.col(geom).alias("_bgeom"))
    out_schema = _schema_of(a)
    _acc = telemetry.capture()

    def do_clip(key, a_pdf: pd.DataFrame, b_pdf: pd.DataFrame):
        if len(a_pdf) == 0 or len(b_pdf) == 0:
            return a_pdf.iloc[0:0]
        cx0, cy0, cx1, cy1 = cell_bounds(key[0])
        cell_area = (cx1 - cx0) * (cy1 - cy0)
        b_rings = [r for buf in b_pdf["_bgeom"]
                   for r in wkb.parse_rings(bytes(buf))]
        b_area = K.boolean_area(b_rings, [], "a", grid)
        if b_area >= cell_area - grid:  # B covers the cell: fastpath
            return a_pdf
        outs, keep = [], []
        for i, buf in enumerate(a_pdf[geom]):
            rings = wkb.parse_rings(bytes(buf))
            inter = K.intersection(rings, b_rings, grid)
            if inter and K.area(inter) > 0:
                outs.append(wkb.rings_wkb(inter))
                keep.append(i)
        res = a_pdf.iloc[keep].copy()
        res[geom] = outs
        telemetry.drain(_acc)
        return res

    return (a.groupBy("cell")
             .cogroup(b.groupBy("cell"))
             .applyInPandas(do_clip, out_schema))


# ------------------------------------------- precedence (A5/A6)

def _aggregate_multi(src: DataFrame, geom: str, grid: float) -> DataFrame:
    """A6 pre-aggregation: union `src` per (cell, every attribute
    column) into ONE multipart row per group — the reference's
    aggregated_insert_difference src CTE (/root/reference/sql/
    aggregated_insert_difference.sql:16-30) — and stamp `agg_id`, a
    DETERMINISTIC synthetic id (md5 of the group key values) replacing
    the reference's nondeterministic `row_number() over ()` (:22).
    Multipart geometry stays in one row (no ST_Dump)."""
    keys = [c for c in src.columns if c != geom]
    agg = dissolve(src, keys, geom=geom, grid=grid)
    return agg.withColumn(
        "agg_id",
        F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                    for c in keys])))


def insert_difference(existing: DataFrame | None, src: DataFrame,
                      geom: str = "geom", grid: float = GRID,
                      sliver: float = SLIVER_AREA,
                      keep_multi: bool = False) -> DataFrame:
    """A5 insert_difference: the part of `src` NOT already covered by
    `existing`, per cell (/root/reference/sql/insert_difference.sql).
    Both inputs must already be tiled (have `cell`). Returns only the
    NEW rows (src attrs, differenced geom); the caller accumulates.

    Blockers per cell = union of existing geoms (equivalent to the
    reference's per-src-id union of intersecting outputs,
    insert_difference.sql:45-53, because differencing against
    non-intersecting geometry is a no-op). Slivers with area <= 10 m^2
    are discarded (insert_difference.sql:75).

    `keep_multi=True` is the A6 aggregated_insert_difference variant
    (/root/reference/sql/aggregated_insert_difference.sql): `src` is
    first unioned per (cell, attributes) into one MULTIPOLYGON row per
    group with a deterministic `agg_id` (see _aggregate_multi), no
    part dump, and the output keeps multipart rows. The reference's
    `GeometryType(geom) = 'MULTIPOLYGON'` output filter (:114) —
    which strips line/point debris PostGIS difference can emit — is
    structural here: the slab kernel only ever emits polygonal rings,
    and the existing area > sliver filter drops degenerate output."""
    if keep_multi:
        src = _aggregate_multi(src, geom, grid)
    if existing is None:
        return src
    out_schema = _schema_of(src)
    ex = existing.select("cell", F.col(geom).alias("_egeom"))
    _acc = telemetry.capture()

    def do_diff(key, s_pdf: pd.DataFrame, e_pdf: pd.DataFrame):
        if len(s_pdf) == 0:
            return s_pdf
        if len(e_pdf) == 0:
            return s_pdf
        blockers = [r for buf in e_pdf["_egeom"]
                    for r in wkb.parse_rings(bytes(buf))]
        outs, keep = [], []
        for i, buf in enumerate(s_pdf[geom]):
            rings = wkb.parse_rings(bytes(buf))
            d = K.difference(rings, blockers, grid)
            if d and K.area(d) > sliver:
                outs.append(wkb.rings_wkb(d))
                keep.append(i)
        res = s_pdf.iloc[keep].copy()
        res[geom] = outs
        telemetry.drain(_acc)
        return res

    return (src.groupBy("cell")
               .cogroup(ex.groupBy("cell"))
               .applyInPandas(do_diff, out_schema))


def insert_difference_fused(src: DataFrame, order_col: str = "process_order",
                            geom: str = "geom", grid: float = GRID,
                            sliver: float = SLIVER_AREA,
                            keep_multi: bool = False) -> DataFrame:
    """A5/A6 with the layer loop FUSED into one shuffle: because
    insert_difference is per-cell independent (tiled inputs never
    interact across cells), the ascending-process_order accumulate-and-
    difference loop can run inside one applyInPandas per cell instead
    of L sequential Spark jobs. Semantics match the driver-loop form
    exactly: the first order batch passes through unfiltered
    (insert_difference returns src when existing is None), later
    batches diff against the accumulated post-sliver-drop OUTPUT
    geometry (the loop unions each round's NEW rows into `existing`),
    and sliver drops (<= sliver m^2, insert_difference.sql:75) remove
    the row from both the output and the accumulator. Wall clock is
    one wide stage instead of L barriers.

    `keep_multi=True` = the A6 aggregated variant (see
    insert_difference): pre-union per (cell, attributes) with a
    deterministic `agg_id`, multipart rows kept whole, polygonal-only
    output guaranteed structurally by the kernel."""
    if keep_multi:
        src = _aggregate_multi(src, geom, grid)
    out_schema = _schema_of(src)
    cols = list(src.columns)
    _acc = telemetry.capture()

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: list = []   # rings of OUTPUT rows so far (loop's `existing`)
        outs, keep = [], []
        first = True
        # layers of equal order diff only against EARLIER layers (the
        # loop form's semantics), so accumulate per order batch
        for po_val in sorted(pdf[order_col].unique()):
            batch = np.flatnonzero(
                (pdf[order_col] == po_val).to_numpy())
            batch_out: list = []
            for i in batch:
                rings = wkb.parse_rings(bytes(pdf[geom].iloc[i]))
                if first:
                    # loop form: insert_difference(None, src) == src
                    outs.append(bytes(pdf[geom].iloc[i]))
                    keep.append(i)
                    batch_out.extend(rings)
                    continue
                d = K.difference(rings, acc, grid)
                if d and K.area(d) > sliver:
                    outs.append(wkb.rings_wkb(d))
                    keep.append(i)
                    batch_out.extend(d)
            acc.extend(batch_out)
            first = False
        res = pdf.iloc[keep].copy()
        res[geom] = outs
        telemetry.drain(_acc)
        return res[cols]

    return src.groupBy("cell").applyInPandas(fold, out_schema)


# -------------------------------------------------- planarize (A7)

PLANARIZE_SCHEMA = (
    "cell string, geom binary, designation array<string>, "
    "src_id array<string>, process_order array<int>, "
    "forest_restriction_max int, og_restriction_max int, "
    "mine_restriction_max int, area_m2 double, rep_x double, rep_y double")


def planarize(designations: DataFrame, boundary: DataFrame,
              grid: float = GRID) -> DataFrame:
    """A7 planarize: faces of the arrangement of designation polygons +
    land boundary per cell, with ordered attribute arrays and max
    restrictions (/root/reference/sql/create_designations_planarized.sql).

    Both inputs must be tiled (`cell` column). Output faces cover
    exactly the land area; faces with no designation get empty arrays
    and 0 restrictions (LEFT JOIN + COALESCE semantics, :54-61).
    Attribute arrays are ordered by (process_order, src_id) — the
    reference's array_agg order with our documented deterministic
    tiebreak (SURVEY §2 F3)."""
    d = designations.select(
        "cell", "designation", "src_id", "process_order",
        "forest_restriction", "og_restriction", "mine_restriction", "geom")
    b = boundary.select("cell", F.col("geom").alias("_bgeom"))
    _acc = telemetry.capture()

    def do_planarize(key, d_pdf: pd.DataFrame, b_pdf: pd.DataFrame):
        cols = PLANARIZE_SCHEMA.split(", ")
        empty = pd.DataFrame({c.split(" ")[0]: [] for c in cols})
        if len(b_pdf) == 0:
            return empty
        nd = len(d_pdf)
        tagged = [(i, wkb.parse_rings(bytes(buf)))
                  for i, buf in enumerate(d_pdf["geom"])]
        tagged += [(nd + j, wkb.parse_rings(bytes(buf)))
                   for j, buf in enumerate(b_pdf["_bgeom"])]
        faces = K.planarize(tagged, grid)
        # COLUMNIZED face assembly (OPTIMIZATION r7 — the r5
        # tile_geoms_mixed pattern, VERDICT r5 #3, applied here): an
        # arrangement of n overlapping features yields O(n^2) faces
        # per cell, and the old path paid pandas .iloc + a Python
        # dict + a per-face lambda sort for each. Extract the
        # attribute columns ONCE per cell as numpy arrays, precompute
        # the (process_order, src_id) sort rank once, and build
        # column lists — semantics identical (same keys, same
        # int/str coercions, same skip rule).
        po = d_pdf["process_order"].to_numpy()
        src = [str(s) for s in d_pdf["src_id"]]
        des = [str(s) for s in d_pdf["designation"]]
        fr = d_pdf["forest_restriction"].to_numpy()
        og = d_pdf["og_restriction"].to_numpy()
        mi = d_pdf["mine_restriction"].to_numpy()
        by_key = sorted(range(nd), key=lambda i: (int(po[i]), src[i]))
        rank = np.empty(nd, dtype=np.int64)
        rank[by_key] = np.arange(nd)
        c_geom, c_des, c_src, c_po = [], [], [], []
        c_f, c_o, c_m, c_a, c_rx, c_ry = [], [], [], [], [], []
        for f in faces:
            if not any(t >= nd for t in f.labels):
                continue  # face outside land boundary
            d_ids = np.asarray([t for t in f.labels if t < nd],
                               dtype=np.int64)
            order = d_ids[np.argsort(rank[d_ids])]
            c_geom.append(wkb.rings_wkb(f.rings))
            c_des.append([des[i] for i in order])
            c_src.append([src[i] for i in order])
            c_po.append([int(po[i]) for i in order])
            if len(d_ids):
                c_f.append(int(fr[d_ids].max()))
                c_o.append(int(og[d_ids].max()))
                c_m.append(int(mi[d_ids].max()))
            else:
                c_f.append(0)
                c_o.append(0)
                c_m.append(0)
            c_a.append(f.area_m2)
            c_rx.append(f.rep_x)
            c_ry.append(f.rep_y)
        telemetry.drain(_acc)
        if not c_geom:
            return empty
        return pd.DataFrame({
            "cell": [key[0]] * len(c_geom),
            "geom": c_geom, "designation": c_des, "src_id": c_src,
            "process_order": c_po, "forest_restriction_max": c_f,
            "og_restriction_max": c_o, "mine_restriction_max": c_m,
            "area_m2": c_a, "rep_x": c_rx, "rep_y": c_ry,
        })

    return (d.groupBy("cell")
             .cogroup(b.groupBy("cell"))
             .applyInPandas(do_planarize, PLANARIZE_SCHEMA))
