"""Lossy-fallback telemetry (SURVEY §2 I2/I3).

The reference's safe-op ladders LOG every lossy last-resort repair
(/root/reference/sql/ST_Safe_Difference.sql:70-80 RAISE NOTICE). The
slab kernel cannot throw, but its ring assembly can defensively drop a
broken chain fragment (geom/kernel.py `break # defensive`). Operators
drain the worker-local drop counter into this Spark accumulator after
every kernel batch, so a cluster run surfaces ONE number: how many
fragments were lossily dropped (expected 0 — the fuzz suite in
tests/test_kernel_fuzz.py audits the claim).

Usage:
    acc = telemetry.enable(spark)   # BEFORE building the DataFrames
    ... run pipeline ...
    print(acc.value)
"""

from __future__ import annotations

LOSSY_ACC = None


def enable(spark):
    """Create (or replace) the session-wide lossy-fragment accumulator.
    Must run before operator DataFrames are constructed — closures
    capture the accumulator at plan-build time."""
    global LOSSY_ACC
    LOSSY_ACC = spark.sparkContext.accumulator(0)
    return LOSSY_ACC


def capture():
    """Driver-side: the accumulator to embed in a UDF closure."""
    return LOSSY_ACC


def drain(acc) -> None:
    """Worker-side: flush the kernel's drop counter into `acc`."""
    from .geom import kernel as K
    n = K.pop_dropped_fragments()
    if n and acc is not None:
        acc.add(n)
