"""End-to-end vector pipeline at sf0.001: the reference's qa.sql golden
invariants as assertions (SURVEY §5 item 2), plus operator-level checks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dle import datagen
from dle.geom import kernel as K
from dle.geom import wkb
from dle.operators.overlay import dissolve, tile_geoms, with_area
from dle.plans.pipeline import process_vector, qa_rollups

SF = "/root/testdata/sf0.001"
DEPTH = 3  # 8x8 cells — keeps the tiny-sf pipeline fast


@pytest.fixture(scope="module")
def outputs(spark):
    return process_vector(spark, SF, depth=DEPTH)


@pytest.fixture(scope="module")
def qa(outputs):
    return qa_rollups(outputs)


def test_planarized_total_equals_land(qa):
    """qa.sql:42-43 — planarized faces tile the land exactly."""
    assert qa["total_planarized_ha"] == pytest.approx(
        qa["total_land_ha"], rel=1e-6)


def test_restriction_class_sums_equal_land(qa):
    """qa.sql:190-213 — each class's level areas sum to total land."""
    for cls, levels in qa["per_class_ha"].items():
        assert sum(levels.values()) == pytest.approx(
            qa["total_land_ha"], rel=1e-6), cls


def test_qa_compare_overlapping_vs_planarized(qa):
    """qa.sql:8-38 — per designation, dissolved overlapping area equals
    the total area of planarized faces containing the designation."""
    assert qa["qa_compare"]
    for d, row in qa["qa_compare"].items():
        assert row["pct_diff"] < 1e-4, (d, row)


def test_precedence_areas_le_overlapping(qa):
    """precedence output is the non-overlapping partition of each
    designation's claim: per designation it can never exceed the
    dissolved overlapping area."""
    for d, (over_ha, prec_ha) in qa["per_designation_ha"].items():
        assert prec_ha <= over_ha * (1 + 1e-9), d
        assert prec_ha > 0, d


def test_precedence_total_equals_union(outputs, spark):
    """The precedence layer partitions the union of all designations:
    sum(precedence areas) == area(union of overlapping), and pieces
    never overlap (checked via pairwise area additivity per cell)."""
    prec_total = with_area(outputs.designatedlands).agg(
        F.sum("area_m2")).collect()[0][0]
    union_per_cell = dissolve(
        outputs.overlapping.select("cell", "geom"), ["cell"])
    union_total = with_area(union_per_cell).agg(
        F.sum("area_m2")).collect()[0][0]
    assert prec_total == pytest.approx(union_total, rel=1e-6)


def test_planarize_first_designation_wins_matches_precedence(outputs):
    """Cross-operator consistency: summing face areas by the FIRST
    designation in the (process_order-sorted) array must reproduce the
    A5 precedence per-designation areas — two totally different
    implementations of the same semantics."""
    faces = outputs.planarized.where(F.size("designation") > 0)
    by_first = {
        r["d"]: r["ha"]
        for r in faces.groupBy(F.col("designation")[0].alias("d"))
        .agg((F.sum("area_m2")).alias("ha")).collect()}
    prec = {
        r["designation"]: r["ha"]
        for r in with_area(outputs.designatedlands)
        .groupBy("designation").agg(F.sum("area_m2").alias("ha"))
        .collect()}
    assert set(by_first) == set(prec)
    for d in prec:
        assert by_first[d] == pytest.approx(prec[d], rel=1e-6), d


def test_fused_precedence_equals_loop(spark, outputs):
    """insert_difference_fused (one shuffle) must reproduce the
    layer-loop's rows and geometry exactly on real 2-D WKB layers."""
    from dle.operators.overlay import dissolve as _dis
    from dle.operators.overlay import insert_difference_fused
    agg = _dis(outputs.overlapping,
               ["cell", "designation", "process_order"])
    fused = insert_difference_fused(agg)
    a = {(r["cell"], r["designation"]): r["area_m2"]
         for r in with_area(fused).collect()}
    b = {(r["cell"], r["designation"]): r["area_m2"]
         for r in with_area(outputs.designatedlands).collect()}
    assert set(a) == set(b)
    # equal regions up to snap tolerance: the loop form re-snaps its
    # accumulated output each iteration, the fused form diffs against
    # pristine originals (slightly MORE accurate)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-6), k


def test_tile_geoms_conserves_area(spark):
    lay = datagen.layers_poly(spark, SF).limit(30)
    tiled = tile_geoms(lay, DEPTH)
    # oracle: per-feature VALID area (bowties have signed shoelace ~0
    # until repaired, so repair first — same rule tiling applies)
    a0 = sum(
        K.boolean_area(wkb.parse_rings(bytes(r["geom"])), [], "a", 0.1)
        for r in lay.select("geom").collect())
    a1 = with_area(tiled).agg(F.sum("area_m2")).collect()[0][0]
    # snapping at tile edges moves area by O(grid * perimeter) at most
    assert a1 == pytest.approx(a0, rel=1e-4)


def test_bowtie_features_are_repaired(outputs):
    """FIXTURES §3(d): invalid bowties must come out valid — every
    overlapping geom reassembles with nonneg shell areas."""
    rows = outputs.overlapping.select("geom").limit(200).collect()
    assert rows
    for r in rows:
        rings = wkb.parse_rings(bytes(r["geom"]))
        total = K.area(rings)
        assert total > 0


def test_pipeline_partition_invariance(spark, outputs):
    """local[2]-vs-local[8] analogue within one session: the planarized
    rollup is identical under different shuffle partitioning."""
    def face_rows(df):
        return sorted(
            (r["cell"], tuple(r["designation"]), round(r["area_m2"], 4))
            for r in df.select("cell", "designation", "area_m2")
            .collect())

    a = face_rows(outputs.planarized)
    b = face_rows(outputs.planarized.repartition(17))
    assert a == b
    # and cell-level sums agree to float-fold tolerance
    s = {r["cell"]: r["ha"] for r in outputs.planarized.groupBy("cell")
         .agg(F.sum("area_m2").alias("ha")).collect()}
    t = {r["cell"]: r["ha"]
         for r in outputs.planarized.repartition(17).groupBy("cell")
         .agg(F.sum("area_m2").alias("ha")).collect()}
    for c in s:
        assert s[c] == pytest.approx(t[c], rel=1e-12)


def test_two_scale_default_equals_single_depth(spark, outputs):
    """VERDICT r5 #4: the DEFAULT two-scale grid path (coarse cells at
    sea, fine cells where the boundary has land — create_tiles.sql:
    45-63) must produce bit-identical outputs to single-depth tiling:
    coarse pieces are exactly the ones the land clip discards. Checked
    end-to-end on the overlapping layer AND on the final precedence
    output (rows, cells, and areas)."""
    single = process_vector(spark, SF, depth=DEPTH, two_scale=False)
    # coarse_depth=2: at this fixture 9 of 16 depth-2 cells contain
    # land, so the grid is GENUINELY mixed (7 coarse marine cells) —
    # the default coarse depth at DEPTH=3 is 1, where all 4 quadrants
    # touch land and the check would be vacuous
    mixed = process_vector(spark, SF, depth=DEPTH, two_scale=True,
                           coarse_depth=2)

    def rows(df):
        return sorted(
            (r["cell"], r["designation"], round(r["area_m2"], 6))
            for r in with_area(df)
            .select("cell", "designation", "area_m2").collect())

    assert rows(outputs.overlapping) == rows(single.overlapping)
    assert rows(outputs.designatedlands) == rows(single.designatedlands)
    assert rows(mixed.overlapping) == rows(single.overlapping)
    assert rows(mixed.designatedlands) == rows(single.designatedlands)
    # and the depth-2 grid really is in play: some coarse cell has no
    # land (otherwise the coarse path was never exercised)
    from dle.plans.pipeline import F as _F  # noqa: N811
    land_prefixes = {r["p"] for r in mixed.boundary_tiled.select(
        _F.col("cell").substr(1, 2).alias("p")).distinct().collect()}
    assert len(land_prefixes) < 16


def test_tile_geoms_grid_partitions_space(spark):
    """tile_geoms_grid emits each feature cut by the mixed partition:
    per-feature area is conserved and every emitted piece lies inside
    its named cell (coarse or fine)."""
    from dle.cells import cell_bounds
    from dle.operators.overlay import tile_geoms_grid
    lay = datagen.layers_poly(spark, SF).limit(20) \
        .select("feat_id", "geom")
    fine = {"00", "03", "12"}   # refine three depth-2 cells to depth 4
    t = tile_geoms_grid(lay, fine, 2, 4)
    a0 = sum(
        K.boolean_area(wkb.parse_rings(bytes(r["geom"])), [], "a", 0.1)
        for r in lay.select("geom").collect())
    a1 = with_area(t).agg(F.sum("area_m2")).collect()[0][0]
    assert a1 == pytest.approx(a0, rel=1e-4)
    for r in t.select("cell", "geom").collect():
        assert len(r["cell"]) in (2, 4)
        if len(r["cell"]) == 4:
            assert r["cell"][:2] in fine
        else:
            assert r["cell"] not in fine
        x0, y0, x1, y1 = cell_bounds(r["cell"])
        for ring in wkb.parse_rings(bytes(r["geom"])):
            assert (ring[:, 0] >= x0 - 0.1).all()
            assert (ring[:, 0] <= x1 + 0.1).all()
            assert (ring[:, 1] >= y0 - 0.1).all()
            assert (ring[:, 1] <= y1 + 0.1).all()


def test_keep_multi_fused_equals_loop(spark):
    """VERDICT r4 #3: aggregated_insert_difference (keep_multi=True)
    through the fused one-shuffle fold must equal the driver-loop form
    (insert_difference per ascending order, keep_multi on the first
    aggregation) — identical per-designation areas and group counts."""
    from dle.operators.overlay import (insert_difference,
                                       insert_difference_fused)
    b = datagen.bands_1d(spark, SF).withColumn(
        "cell", F.col("band").cast("string"))
    src = b.select("cell", "designation", "process_order", "geom")

    fused = with_area(insert_difference_fused(src, keep_multi=True))
    f_rows = {(r["designation"],): (round(r["a"]), r["n"]) for r in
              fused.groupBy("designation")
              .agg(F.sum("area_m2").alias("a"),
                   F.count(F.lit(1)).alias("n")).collect()}

    orders = sorted(r["process_order"] for r in
                    src.select("process_order").distinct().collect())
    acc = None
    for po in orders:
        new = insert_difference(
            acc, src.where(F.col("process_order") == po),
            keep_multi=True)
        acc = new if acc is None else acc.unionByName(new)
    loop = with_area(acc)
    l_rows = {(r["designation"],): (round(r["a"]), r["n"]) for r in
              loop.groupBy("designation")
              .agg(F.sum("area_m2").alias("a"),
                   F.count(F.lit(1)).alias("n")).collect()}
    assert f_rows == l_rows
    assert len(f_rows) > 1


def test_keep_multi_output_is_multipart_no_dump(spark):
    """keep_multi must keep multipart geometry in ONE row per (cell,
    attrs) group (no ST_Dump) with a unique deterministic agg_id."""
    from dle.operators.overlay import insert_difference_fused
    b = datagen.bands_1d(spark, SF).withColumn(
        "cell", F.col("band").cast("string"))
    src = b.select("cell", "designation", "process_order", "geom")
    out = insert_difference_fused(src, keep_multi=True).collect()
    keys = [(r["cell"], r["designation"], r["process_order"])
            for r in out]
    assert len(keys) == len(set(keys))          # one row per group
    ids = [r["agg_id"] for r in out]
    assert len(ids) == len(set(ids))            # agg_id unique
    # at least one surviving group is genuinely multipart (the diff of
    # an overlapping interval union produces disjoint remainders)
    n_parts = []
    for r in out:
        rings = wkb.parse_rings(bytes(r["geom"]))
        n_parts.append(sum(1 for g in rings if wkb.ring_area(g) >= 0))
    assert max(n_parts) >= 2
