"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: geocode pages -> cell-indexed PIP join vs
                 designation layers -> precedence resolve -> rollup.
queries()      — operator surface from SURVEY.md §2 (engine path).
oracle_sql()   — DuckDB twins (plain SQL over the same parquet views).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dle import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.q_spatial_rollup_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracles()
