"""Checkpoint manifest: idempotent commits, zero-row cell recording,
and mid-loop kill/resume for the Manifest-backed precedence loop
(north rule: "resumable from checkpoint with per-partition lineage +
metrics"; VERDICT r1 next-steps #9 + ADVICE medium finding)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dle.plans import pipeline
from dle.plans.checkpoint import Manifest, run_stage

SF = "/root/testdata/sf0.001"


def _input(spark):
    return spark.createDataFrame(
        [("000", 1), ("000", 2), ("001", 3), ("002", 4)],
        "cell string, v int")


def test_run_stage_recommit_is_idempotent(spark, tmp_path):
    """Crash between parquet commit and manifest append must NOT
    duplicate rows on resume: the recomputed cell REPLACES its
    partition (dynamic partition overwrite)."""
    man = Manifest(str(tmp_path / "m"))
    df = _input(spark)
    out = run_stage(spark, man, "s", "fp", lambda skip: df,
                    str(tmp_path / "o"))
    assert out.count() == 4
    # simulate the crash: parquet committed, manifest lost
    man.clear("s")
    out2 = run_stage(spark, man, "s", "fp", lambda skip: df,
                     str(tmp_path / "o"))
    assert out2.count() == 4  # not 8
    assert {r["cell"] for r in man.rows("s")} == {"000", "001", "002"}


def test_run_stage_skips_done_cells(spark, tmp_path):
    man = Manifest(str(tmp_path / "m"))
    df = _input(spark)
    run_stage(spark, man, "s", "fp", lambda skip: df,
              str(tmp_path / "o"))
    seen = []

    def build(skip):
        seen.append(set(skip))
        return df

    out = run_stage(spark, man, "s", "fp", build, str(tmp_path / "o"))
    assert seen[0] == {"000", "001", "002"}
    assert out.count() == 4  # done cells retained from parquet


def test_run_stage_zero_row_cell_among_nonempty(spark, tmp_path):
    man = Manifest(str(tmp_path / "m"))
    df = _input(spark).where("cell <> '002'")
    run_stage(spark, man, "s", "fp", lambda skip: df,
              str(tmp_path / "o"),
              planned_cells=["000", "001", "002"])
    recs = {r["cell"]: r["rows"] for r in man.rows("s")}
    assert recs == {"000": 2, "001": 1, "002": 0}
    # resume: the zero-row cell is NOT recomputed
    done = man.done_cells("s", "fp")
    assert "002" in done


def test_run_stage_zero_row_stage_no_crash(spark, tmp_path):
    """ADVICE r2 (medium): a stage with ZERO output rows writes no
    parquet part files; run_stage must not crash on the read-back,
    must return an empty frame with the build schema, and must record
    the stage as done so resumes skip it."""
    man = Manifest(str(tmp_path / "m"))
    empty = _input(spark).where("v > 99")
    out = run_stage(spark, man, "s", "fp", lambda skip: empty,
                    str(tmp_path / "o"))
    assert out.count() == 0
    assert set(out.columns) == {"cell", "v"}
    rows = man.rows("s")
    assert rows and sum(r["rows"] for r in rows) == 0
    # re-entry is also crash-free and does not duplicate the marker
    out2 = run_stage(spark, man, "s", "fp", lambda skip: empty,
                     str(tmp_path / "o"))
    assert out2.count() == 0
    assert len(man.rows("s")) == len(rows)


def test_precedence_loop_skips_zero_output_layer(spark, tmp_path,
                                                 monkeypatch):
    """A layer fully eclipsed by earlier layers (plausible at 42-layer
    registry scale) must not abort the ckpt loop, and a resume must
    skip it without recomputation (ADVICE r2 medium + low)."""
    ckpt = str(tmp_path / "ck")
    real = pipeline.insert_difference
    calls = {"n": 0}

    def eclipse(existing, src, **kw):
        calls["n"] += 1
        po = src.select("process_order").first()["process_order"]
        out = real(existing, src, **kw)
        return out.where(F.lit(False)) if int(po) == 3 else out

    monkeypatch.setattr(pipeline, "insert_difference", eclipse)
    first = pipeline.process_vector(spark, SF, depth=2, ckpt_root=ckpt)
    desigs1 = {r["designation"] for r in
               first.designatedlands.select("designation")
               .distinct().collect()}
    assert "desig_03" not in desigs1
    man = Manifest(f"{ckpt}/manifest")
    assert man.rows("precedence_003")
    assert sum(r["rows"] for r in man.rows("precedence_003")) == 0

    # resume: every layer (incl. the empty one) loads from manifest —
    # insert_difference is never called again
    n_before = calls["n"]
    resumed = pipeline.process_vector(spark, SF, depth=2,
                                      ckpt_root=ckpt)
    desigs2 = {r["designation"] for r in
               resumed.designatedlands.select("designation")
               .distinct().collect()}
    assert calls["n"] == n_before
    assert desigs2 == desigs1


def test_precedence_loop_resumes_after_kill(spark, tmp_path,
                                            monkeypatch):
    """Kill the Manifest-backed precedence loop mid-way; a rerun
    completes from the checkpoint and matches the uncheckpointed run."""
    ckpt = str(tmp_path / "ck")
    calls = {"n": 0}
    real = pipeline.insert_difference

    def dying(existing, src, **kw):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("simulated executor loss")
        return real(existing, src, **kw)

    monkeypatch.setattr(pipeline, "insert_difference", dying)
    with pytest.raises(RuntimeError):
        pipeline.process_vector(spark, SF, depth=2, ckpt_root=ckpt)
    monkeypatch.setattr(pipeline, "insert_difference", real)

    resumed = pipeline.process_vector(spark, SF, depth=2,
                                      ckpt_root=ckpt)
    baseline = pipeline.process_vector(spark, SF, depth=2)

    def rollup(df):
        from dle.operators.overlay import with_area
        return {
            (r["cell"], r["designation"]): round(r["a"], 3)
            for r in with_area(df).groupBy("cell", "designation")
            .agg(F.sum("area_m2").alias("a")).collect()}

    assert rollup(resumed.designatedlands) == \
        rollup(baseline.designatedlands)
    # at least the first layers came from the checkpoint
    man = Manifest(f"{ckpt}/manifest")
    assert man.rows("precedence_001")


def test_dissolve_explode_parts_empty_group(spark):
    """ADVICE r1: a group whose union is empty (all-degenerate geoms)
    must return an empty frame WITH part_i when explode_parts is set."""
    import numpy as np

    from dle.geom import wkb
    from dle.operators.overlay import dissolve

    # 1 cm wide sliver: snaps to zero width at GRID=0.1 m
    tiny = wkb.polygon_wkb([np.array(
        [[0.0, 0.0], [0.01, 0.0], [0.01, 5.0], [0.0, 5.0], [0.0, 0.0]])])
    ok = wkb.polygon_wkb([np.array(
        [[10.0, 0.0], [20.0, 0.0], [20.0, 10.0], [10.0, 10.0],
         [10.0, 0.0]])])
    df = spark.createDataFrame(
        [("a", bytearray(tiny)), ("b", bytearray(ok))],
        "k string, geom binary")
    out = dissolve(df, ["k"], explode_parts=True).collect()
    ks = {r["k"] for r in out}
    assert ks == {"b"}
    assert all(r["part_i"] == 0 for r in out)


def test_asof_join_deterministic_on_ts_ties(spark):
    """ADVICE r1: equal (key, right_ts) rows with different payloads
    must resolve identically regardless of input row order."""
    from dle.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k int, lts bigint")
    rows = [(1, 50, "x"), (1, 50, "y"), (1, 50, "z")]
    r1 = spark.createDataFrame(rows, "k int, rts bigint, p string")
    r2 = spark.createDataFrame(rows[::-1], "k int, rts bigint, p string")
    a = asof_join(left, r1, on="k", left_ts="lts",
                  right_ts="rts").collect()
    b = asof_join(left, r2.repartition(3), on="k", left_ts="lts",
                  right_ts="rts").collect()
    assert a[0]["p"] == b[0]["p"] == "z"


def test_asof_join_forward_and_nearest(spark):
    """VERDICT r2 #9: forward = earliest right >= left (FIRST among
    equal ts), nearest = smaller |delta| with exact ties backward."""
    from dle.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 201), (1, 400)], "k int, lts bigint")
    right = spark.createDataFrame(
        [(1, 90, "b1"), (1, 150, "f1a"), (1, 150, "f1b"), (1, 300, "x")],
        "k int, rts bigint, p string")

    fwd = {r["lts"]: (r["rts"], r["p"]) for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        direction="forward").collect()}
    assert fwd[100] == (150, "f1a")   # FIRST among equal rts
    assert fwd[201] == (300, "x")
    assert fwd[400] == (None, None)   # nothing after -> nulls

    near = {r["lts"]: (r["rts"], r["p"]) for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        direction="nearest").collect()}
    assert near[100] == (90, "b1")    # |10| beats |50|
    assert near[201] == (150, "f1b")  # |51| beats |99|; LAST among ==
    assert near[400] == (300, "x")
