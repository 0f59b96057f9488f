"""Structured Streaming ingestion wrapper (SURVEY §2 J — optional).

The reference is pure batch; the streaming surface exists so a
continuously-growing pages table (Common-Crawl drops) can be ingested
incrementally: `readStream` over a parquet/Iceberg directory with
`trigger(availableNow=True)` drains everything present, runs the SAME
batch operators per micro-batch via foreachBatch, checkpoints, and
stops — an idempotent incremental analogue of the reference's
"already loaded" skips (designatedlands.py:503).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_available_now(spark: SparkSession, src_dir: str, schema: str,
                      batch_fn, checkpoint_dir: str,
                      fmt: str = "parquet") -> None:
    """Drain all currently-available input through batch_fn(df, epoch)
    and stop. Restart-safe: the stream checkpoint remembers consumed
    files, so re-running processes only new arrivals."""
    stream = (spark.readStream.format(fmt).schema(schema)
              .load(src_dir))
    q = (stream.writeStream
         .foreachBatch(batch_fn)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_pip_rollup(spark: SparkSession, src_dir: str,
                      layers, out_accumulator: list,
                      checkpoint_dir: str, depth: int = 4) -> None:
    """Incremental overlay: stream of geocoded page points joined
    against the STATIC designation-layer table (stream-static join —
    the layers side broadcasts exactly like the batch PIP path), then
    precedence-resolved and rolled up per designation per micro-batch.
    The batch operators run unchanged inside foreachBatch; re-running
    after new files arrive processes only the new pages."""
    from ..operators.spatial_join import pip_join_rects, precedence_resolve

    lay = layers.select("feat_id", "process_order",
                        "x0", "y0", "x1", "y1")

    def batch_fn(df: DataFrame, epoch_id: int) -> None:
        pairs = pip_join_rects(df, lay, depth)
        won = precedence_resolve(pairs, ["page_id", "cand_i"])
        rows = won.groupBy("process_order").count().collect()
        out_accumulator.append(
            {r["process_order"]: r["count"] for r in rows})

    run_available_now(
        spark, src_dir,
        "page_id bigint, cand_i int, px double, py double",
        batch_fn, checkpoint_dir)


def stream_cell_counts(spark: SparkSession, src_dir: str,
                       out_accumulator: list, checkpoint_dir: str,
                       depth: int = 4) -> None:
    """Example streaming pipeline: incremental cell assignment + counts
    of geocoded points, appended per micro-batch."""
    from ..operators.spatial_join import with_point_cell

    def batch_fn(df: DataFrame, epoch_id: int) -> None:
        counts = (with_point_cell(df, "px", "py", depth)
                  .groupBy("cell").count().collect())
        out_accumulator.append(
            {r["cell"]: r["count"] for r in counts})

    run_available_now(
        spark, src_dir,
        "page_id bigint, cand_i int, px double, py double",
        batch_fn, checkpoint_dir)
