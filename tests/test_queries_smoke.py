"""Smoke + determinism tests for the query surface at sf0.001.

The partition-invariance check (same result at different parallelism)
is the determinism gate FIXTURES.md §6 requires before the N vs 4N
scaling bench.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from dle import queries as q

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"designation", "n_points", "n_pages"}


def test_every_query_runs(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        assert df.count() > 0, name


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    for k in entrymod.oracle_sql():
        assert k in qs


def test_pip_join_partition_invariance(spark):
    df = q.q_spatial_pip_join(spark, SF)
    a = sorted(map(tuple, df.coalesce(1).collect()))
    b = sorted(map(tuple, df.repartition(16).collect()))
    assert a == b


def test_precedence_never_exceeds_pairs(spark):
    pairs = q.q_spatial_pip_join(spark, SF)
    won = q.q_spatial_pip_precedence(spark, SF)
    n_points = pairs.select("page_id", "cand_i").distinct().count()
    assert won.count() == n_points
