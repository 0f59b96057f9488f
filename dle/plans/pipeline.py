"""End-to-end vector pipeline — the `process-vector` analogue
(SURVEY §3.1): designation layers -> land clip + attribute stamping
(A4) -> precedence overlay (A5 loop) -> planarize (A7) -> qa rollups.

The precedence loop is inherently layer-serial (each layer may only
claim space not already claimed — /root/reference/designatedlands.py:
693-707); each iteration is one wide Spark job over all cells, and the
accumulating output is localCheckpoint()ed per layer to keep lineage
flat (SURVEY §7 "Sequential precedence loop").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import datagen
from ..config import DEFAULT_DEPTH
from ..operators.overlay import (
    clip, dissolve, insert_difference, planarize, tile_geoms, with_area,
)

REG_KEYS = ["designation", "src_id", "src_name", "process_order",
            "forest_restriction", "og_restriction", "mine_restriction"]


@dataclass
class VectorOutputs:
    layers: DataFrame
    boundary_tiled: DataFrame
    overlapping: DataFrame     # A4: land-clipped, attribute-stamped
    designatedlands: DataFrame  # A5: non-overlapping precedence layer
    planarized: DataFrame      # A7: faces w/ attribute arrays


def process_vector(spark: SparkSession, sf_dir: str,
                   depth: int = DEFAULT_DEPTH,
                   fused: bool = False,
                   ckpt_root: str | None = None,
                   n_orders: int = 8,
                   two_scale: bool = True,
                   coarse_depth: int | None = None) -> VectorOutputs:
    """`two_scale=True` (the DEFAULT — VERDICT r5 #4) makes the
    reference's two-scale grid the standard path: the composed
    boundary's LAND cells define where the grid is fine
    (create_tiles.sql:45-63 keeps 1:20k tiles on land, 1:250k at sea);
    layer features tile coarse outside those cells, so marine-heavy
    features never explode into fine cells the land clip would only
    discard. Output is IDENTICAL to single-depth (pytest-pinned) —
    coarse pieces are exactly the ones with no land overlap."""
    layers = datagen.layers_poly(spark, sf_dir, n_orders=n_orders)
    # A9: compose bc_boundary from raw pieces (marine union + subdivide
    # + tile + precedence insert — designatedlands.py:624-721) instead
    # of fabricating the finished polygon.
    from .boundary import build_boundary
    composed = build_boundary(spark, datagen.boundary_pieces(spark),
                              depth)
    boundary_t = composed.where(F.col("cls") == "land") \
        .select("cell", "geom")

    # Two-scale grid spec: the coarse cells that contain ANY land are
    # refined to fine depth; everything else stays coarse. Driver-side
    # distinct over coarse prefixes of the (already fine-tiled) land
    # boundary — bounded by 4^coarse_depth rows.
    if two_scale and depth > 1:
        cd = coarse_depth if coarse_depth is not None \
            else max(1, depth - 2)
        fine_cells = {r["p"] for r in boundary_t.select(
            F.col("cell").substr(1, cd).alias("p")).distinct().collect()}
    else:
        cd, fine_cells = None, None

    # A4 create_designations_overlapping: clip each layer to land, then
    # dissolve per (registry attrs, cell) — constants stamped from the
    # registry ride along as group keys
    # (/root/reference/sql/create_designations_overlapping.sql:22-67).
    clipped = clip(layers.select(*REG_KEYS, "geom"), boundary_t, depth,
                   b_tiled=True, fine_cells=fine_cells,
                   coarse_depth=cd)
    overlapping = dissolve(clipped, ["cell"] + REG_KEYS)

    # A5/A6 precedence loop in ascending process_order. Layers are
    # pre-dissolved per (cell, designation) first — the reference's
    # aggregated_insert_difference semantics (sql/
    # aggregated_insert_difference.sql:25-29): without this, two
    # same-layer features with different src_id could overlap each
    # other in the output.
    agg_src = dissolve(overlapping,
                       ["cell", "designation", "process_order"])
    if fused:
        # one-shuffle per-cell fold (insert_difference_fused); output
        # proven identical to the loop form (tests + shared oracle)
        from ..operators.overlay import insert_difference_fused
        designatedlands = insert_difference_fused(agg_src)
    else:
        orders = sorted(r[0] for r in
                        agg_src.select("process_order").distinct()
                        .collect())
        acc: DataFrame | None = None
        if ckpt_root is None:
            # local/interactive: flatten lineage per layer. On a real
            # cluster pass ckpt_root — localCheckpoint pins lineage to
            # executor storage and dies with an executor.
            for po in orders:
                src = agg_src.filter(F.col("process_order") == po)
                new = insert_difference(acc, src)
                acc = new if acc is None else acc.unionByName(new)
                acc = acc.localCheckpoint(eager=False)
        else:
            # Cluster-safe + resumable: each layer's accumulated output
            # is committed to reliable storage through the Manifest
            # (idempotent dynamic-partition-overwrite commits). A run
            # killed mid-loop resumes at the first layer without
            # manifest rows; completed layers reload from parquet.
            from .checkpoint import Manifest, run_stage
            man = Manifest(f"{ckpt_root}/manifest")
            # every input that shapes layer contents must fingerprint,
            # or a resume against different data reloads stale stages
            fingerprint = (f"{sf_dir}|depth={depth}"
                           f"|orders={n_orders}|v2")
            for po in orders:
                stage = f"precedence_{int(po):03d}"
                stage_rows = man.rows(stage)
                if not man.stale(stage, fingerprint) and stage_rows:
                    if sum(r.get("rows", 0) for r in stage_rows) == 0:
                        # layer completed with zero output (fully
                        # eclipsed by earlier layers — plausible at
                        # 42-layer registry scale): nothing to reload,
                        # nothing to union (ADVICE r2)
                        new_df = None
                    else:
                        new_df = spark.read.parquet(
                            f"{ckpt_root}/{stage}").withColumn(
                            "cell", F.col("cell").cast("string"))
                else:
                    src = agg_src.filter(F.col("process_order") == po)
                    new = insert_difference(acc, src)
                    new_df = run_stage(spark, man, stage, fingerprint,
                                       lambda skip, df=new: df,
                                       ckpt_root)
                # each stage commits ONLY its own layer's rows (O(L)
                # total I/O, not O(L^2) cumulative rewrites); the
                # accumulator is a union of flat parquet scans
                if new_df is not None:
                    acc = new_df if acc is None else \
                        acc.unionByName(new_df)
        designatedlands = acc

    # A7 planarize.
    planarized = planarize(overlapping, boundary_t)

    return VectorOutputs(layers, boundary_t, overlapping,
                         designatedlands, planarized)


def qa_rollups(out: VectorOutputs) -> dict:
    """The reference's golden QA invariants as numbers
    (/root/reference/sql/qa.sql):

      total_land        — dissolved land-boundary area (ha)
      total_planarized  — sum of face areas (must ~= total_land, :42-43)
      per_designation   — overlapping vs precedence area per designation
      per_class_sums    — per restriction class, sum over levels of face
                          area (each must ~= total_land, :190-213)
    """
    land = with_area(out.boundary_tiled)
    total_land = land.agg(F.sum("area_m2")).collect()[0][0] / 1e4

    total_plan = out.planarized.agg(
        F.sum("area_m2")).collect()[0][0] / 1e4

    over = with_area(out.overlapping).groupBy("designation").agg(
        (F.sum("area_m2") / 1e4).alias("overlapping_ha"))
    prec = with_area(out.designatedlands).groupBy("designation").agg(
        (F.sum("area_m2") / 1e4).alias("precedence_ha"))
    per_desig = {
        r["designation"]: (r["overlapping_ha"], r["precedence_ha"])
        for r in over.join(prec, "designation", "outer").collect()}

    per_class = {}
    for c in ("forest_restriction_max", "og_restriction_max",
              "mine_restriction_max"):
        rows = out.planarized.groupBy(c).agg(
            (F.sum("area_m2") / 1e4).alias("ha")).collect()
        per_class[c] = {r[c]: r["ha"] for r in rows}

    # qa_compare_outputs (/root/reference/sql/qa.sql:8-38): dissolved
    # per-designation area in the OVERLAPPING output vs total area of
    # planarized faces whose attribute array contains the designation
    # (the reference's `o.designation && p.designation` intarray-overlap
    # join) — must agree to snap tolerance.
    over_dis = with_area(dissolve(
        out.overlapping.select("cell", "designation", "geom"),
        ["cell", "designation"]))
    over_d = {r["designation"]: r["ha"] for r in
              over_dis.groupBy("designation")
              .agg((F.sum("area_m2") / 1e4).alias("ha")).collect()}
    plan_d = {
        r["d"]: r["ha"]
        for r in out.planarized
        .select(F.explode(F.array_distinct("designation")).alias("d"),
                "area_m2")
        .groupBy("d").agg((F.sum("area_m2") / 1e4).alias("ha"))
        .collect()}
    qa_compare = {
        d: {"overlapping_ha": over_d.get(d, 0.0),
            "planarized_ha": plan_d.get(d, 0.0),
            "pct_diff": (100.0 * abs(over_d.get(d, 0.0)
                                     - plan_d.get(d, 0.0))
                         / max(over_d.get(d, 0.0), 1e-9))}
        for d in sorted(set(over_d) | set(plan_d))}

    from .. import telemetry
    return {
        "total_land_ha": total_land,
        "total_planarized_ha": total_plan,
        "per_designation_ha": per_desig,
        "per_class_ha": per_class,
        "qa_compare": qa_compare,
        # lossy-fallback metric (reference logs NOTICEs per lossy
        # repair, sql/ST_Safe_Difference.sql:70-80): count of ring
        # fragments defensively dropped across all executors, if the
        # caller enabled telemetry before building the pipeline.
        "lossy_fragments": (telemetry.LOSSY_ACC.value
                            if telemetry.LOSSY_ACC is not None else None),
    }
