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
