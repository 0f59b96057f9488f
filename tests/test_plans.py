"""Physical-plan regression tests (the '.explain and iterate' gate):
the engine's headline paths must keep the plan shapes a 100 TB run
depends on — broadcast dimension sides, no Python eval in JVM-only
paths, predicate pushdown reaching the parquet scan."""

from __future__ import annotations

from dle import queries as q
from dle import sqlgen

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pip_join_broadcasts_and_stays_jvm(spark):
    plan = _plan(q.q_spatial_pip_join(spark, SF))
    # the exploded layer-cell side and the documents lookup broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    # the petabyte point side must NOT shuffle for the join itself
    assert "Exchange hashpartitioning" not in plan
    # no Python in the refine path: rect refine is pure JVM
    assert "EvalPython" not in plan


def test_precedence_agg_is_partial(spark):
    plan = _plan(q.q_spatial_rollup_counts(spark, SF))
    # map-side partial aggregation before the exchange
    assert "partial_min" in plan or "partial_count" in plan


def test_filter_pushdown_reaches_scan(spark):
    sqlgen.register_tables(spark, SF)
    plan = _plan(spark.sql(
        "select o_orderkey from orders where o_orderkey < 100"))
    assert "LessThan(o_orderkey,100)" in plan
    assert "struct<o_orderkey:bigint>" in plan  # column pruning


def test_dissolve_shuffles_once_by_keys(spark):
    from dle import datagen
    from dle.operators.overlay import dissolve
    b = datagen.bands_1d(spark, SF).select("designation", "band", "geom")
    plan = _plan(dissolve(b, ["designation", "band"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan or "ArrowEvalPython" in plan
