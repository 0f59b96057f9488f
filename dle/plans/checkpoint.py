"""Per-partition lineage + metrics checkpoint manifest (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

The Spark-idiomatic analogue of the reference's stage-level
"already loaded" skips (/root/reference/designatedlands.py:503,
:549-561) and sha-named download dirs (:167), but finer grained: one
manifest row per (stage, cell) with the input fingerprint, row count
and wall time. On resume, completed cells are pruned from the input
BEFORE the expensive kernel UDFs run (the filter lands under the
explode in the plan), so a killed job redoes only unfinished cells.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, functions as F


# manifest cell name marking "stage finished with zero output cells";
# never collides with real cells (quadkeys / cell ids)
STAGE_DONE = "__stage_done__"


class Manifest:
    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, stage: str) -> Path:
        return self.root / f"{stage}.manifest.jsonl"

    def rows(self, stage: str) -> list[dict]:
        p = self._path(stage)
        if not p.exists():
            return []
        out = []
        for ln in p.read_text().splitlines():
            if not ln:
                continue
            try:
                out.append(json.loads(ln))
            except json.JSONDecodeError:
                # torn final line from a kill mid-append: ignore it —
                # the affected cells simply recompute, and the
                # dynamic-partition-overwrite commit makes that safe
                continue
        return out

    def done_cells(self, stage: str, fingerprint: str) -> set[str]:
        return {r["cell"] for r in self.rows(stage)
                if r["fingerprint"] == fingerprint and r["status"] == "ok"}

    def stale(self, stage: str, fingerprint: str) -> bool:
        return any(r["fingerprint"] != fingerprint
                   for r in self.rows(stage))

    def append(self, stage: str, recs: list[dict]) -> None:
        with self._path(stage).open("a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")

    def clear(self, stage: str) -> None:
        self._path(stage).unlink(missing_ok=True)


def run_stage(spark, manifest: Manifest, stage: str, fingerprint: str,
              build_df, out_root: str, partition_col: str = "cell",
              planned_cells: list[str] | None = None) -> DataFrame:
    """Compute-or-resume one pipeline stage.

    ``build_df(skip_cells: set[str]) -> DataFrame`` must prune the given
    completed cells as early as possible in its plan. Output parquet is
    partitioned by cell; a changed fingerprint invalidates everything.

    Crash-safe by construction: the parquet commit uses DYNAMIC
    partition overwrite, so a cell interrupted between its parquet
    commit and its manifest append is simply recomputed on resume and
    REPLACES its partition — never appends a duplicate. When the caller
    supplies ``planned_cells`` (the cell universe for the stage),
    zero-row cells are recorded as done too, so they are not recomputed
    on every resume."""
    out_dir = Path(out_root) / stage
    if manifest.stale(stage, fingerprint):
        manifest.clear(stage)
        shutil.rmtree(out_dir, ignore_errors=True)
    done = manifest.done_cells(stage, fingerprint)
    df = build_df(done)
    t0 = time.perf_counter()
    if done:
        df = df.filter(~F.col(partition_col).isin(list(done)))
    conf = spark.conf
    prev_mode = conf.get("spark.sql.sources.partitionOverwriteMode",
                         "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.mode("overwrite").partitionBy(partition_col)
           .parquet(str(out_dir)))
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    wall_ms = int(1000 * (time.perf_counter() - t0))
    try:
        result = spark.read.parquet(str(out_dir))
    except Exception:
        # A ZERO-ROW stage writes no parquet part files at all (a
        # partitionBy write of an empty frame emits nothing), so the
        # read-back cannot infer a schema (ADVICE r2, medium). That is
        # the ONLY failure treated as success: if part files DO exist,
        # the read failed for a real reason (corrupt footer, permission,
        # truncated write) and swallowing it would record a broken stage
        # as an empty completed one, silently skipped on every resume
        # (ADVICE r3, low) — re-raise instead.
        if any(out_dir.rglob("*.parquet")):
            raise
        # The build plan's schema IS the stage schema — return an empty
        # frame with it and still record completion below, so resumes
        # skip the layer instead of crashing on the same read.
        result = spark.createDataFrame([], df.schema)
    # guard against partition-column type inference (quadkeys like
    # "000" must stay strings) under sessions we didn't configure
    result = result.withColumn(
        partition_col, F.col(partition_col).cast("string"))
    counts = {r[partition_col]: r["count"] for r in
              result.groupBy(partition_col).count().collect()}
    new_cells = (
        [c for c in planned_cells if c not in done]
        if planned_cells is not None else
        [c for c in counts if c not in done])
    recs = [{"stage": stage, "cell": c,
             "fingerprint": fingerprint, "rows": counts.get(c, 0),
             "wall_ms": wall_ms, "status": "ok",
             "ts": int(time.time())} for c in new_cells]
    if not recs and not done:
        # stage completed with zero output cells: write a stage-level
        # done marker so resumes see the stage as finished (rows=0)
        # rather than recomputing it forever (ADVICE r2 low)
        recs = [{"stage": stage, "cell": STAGE_DONE,
                 "fingerprint": fingerprint, "rows": 0,
                 "wall_ms": wall_ms, "status": "ok",
                 "ts": int(time.time())}]
    if recs:
        manifest.append(stage, recs)
    return result
