"""Sequence packing — the training-data step that concatenates the
token streams of many documents (in a deterministic corpus order) and
slices the stream into fixed-capacity training sequences, letting
documents span sequence boundaries (standard LM packing).

Per doc the operator needs the EXCLUSIVE prefix sum of token counts in
corpus order — a global cumulative sum. The naive Spark form
(``Window.orderBy(doc_id)`` with no partition key) funnels the whole
corpus through ONE task; at 10^12 documents that is the job. Instead
this is the classic two-pass distributed scan:

  pass 1: range-repartition by the order key; per partition, a tiny
          aggregate of the partition's total weight (P rows collected,
          P = partition count — bounded, not data-sized);
  pass 2: the SAME range layout, sorted within partitions, streamed
          through an Arrow cumsum that carries a running total across
          batches inside each partition (mapInPandas iterates a
          partition's batches sequentially in one worker) and starts
          from the broadcast per-partition offset.

One corpus-sized exchange total (the range repartition) + a local
sort; no corpus-wide single-task stage, no second shuffle (a window
partitioned by pid would re-exchange — Catalyst cannot see that pid
already IS the physical partition).

The two passes must agree on row -> partition assignment.
RangePartitioner's reservoir sampling is deterministically seeded
(byteswap32(partition index)) but samples the input's WITHIN-PARTITION
row order, which only repeats across evaluations for deterministic
scan-rooted plans — a multi-join upstream (jobs/text_pipeline_job.py)
can legally reorder rows between evaluations and silently skew the
boundaries (ADVICE r3, medium). The range-partitioned frame is
therefore persist()ed and materialized by pass 1, so pass 2 reads the
SAME physical partitions instead of re-evaluating the plan. The
persisted frame is registered for release via release_cache() (same
single-outstanding-result contract as operators.knn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PERSISTED: list = []


def release_cache() -> None:
    """Unpersist the ranged frame cached by a previous pack_sequences
    call. Call once the previous result has been fully consumed; a
    released frame recomputes lazily (and may then repartition
    differently) if its DataFrame is consumed afterwards."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist(False)


def pack_sequences(docs: DataFrame, capacity: int,
                   order_col: str = "doc_id",
                   weight_col: str = "n_tok") -> DataFrame:
    """Assign every document its position in the packed token stream.

    Returns ``order_col, n_tok, cum_prev, seq_id, offset_in_seq`` where
    ``cum_prev`` is the exclusive prefix sum of ``weight_col`` in
    ``order_col`` order, ``seq_id = floor(cum_prev / capacity)`` (the
    training sequence this doc STARTS in) and ``offset_in_seq`` its
    token offset inside that sequence. Docs with more tokens than
    remain in the sequence simply span into the next one — exactly how
    LM pipelines pack (no padding, boundaries cross documents)."""
    import pandas as pd

    release_cache()
    parted = (docs.select(order_col, weight_col)
              .repartitionByRange(order_col).persist())
    _PERSISTED.append(parted)
    # pass 1: per-partition totals -> driver (P rows) -> offset table.
    # The collect below MATERIALIZES the persisted partitions, pinning
    # the row->partition assignment pass 2 depends on (see module doc).
    psums = {r["p"]: r["s"] for r in
             parted.withColumn("p", F.spark_partition_id())
             .groupBy("p").agg(F.sum(weight_col).alias("s"))
             .collect()}
    offs, acc = {}, 0
    for pid in sorted(psums):
        offs[pid] = acc
        acc += psums[pid]

    cap = int(capacity)

    def scan(it):
        from pyspark import TaskContext
        carry = offs.get(TaskContext.get().partitionId(), 0)
        for pdf in it:
            # batches arrive partition-ordered; sortWithinPartitions
            # already ordered rows, so the cumsum is a straight scan
            w = pdf[weight_col].astype("int64")
            cum_prev = carry + w.cumsum() - w
            carry += int(w.sum())
            yield pd.DataFrame({
                order_col: pdf[order_col],
                weight_col: w,
                "cum_prev": cum_prev,
                "seq_id": cum_prev // cap,
                "offset_in_seq": cum_prev % cap,
            })

    schema = (f"{order_col} bigint, {weight_col} bigint, "
              "cum_prev bigint, seq_id bigint, offset_in_seq bigint")
    return parted.sortWithinPartitions(order_col) \
        .mapInPandas(scan, schema)
