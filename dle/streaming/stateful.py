"""Structured Streaming: watermarked windowed aggregation + custom
stateful sessionization (round brief: "watermarks + windowed aggs for
late data; applyInPandasWithState for custom stateful operators").

Both wrappers run with trigger(availableNow=True) so tests drain a
bounded directory deterministically; on a live stream the same code
runs continuously. Results are proven against the engine's BATCH
twins (events_window_stats / events_sessions) in tests — the streaming
and batch paths must agree on bounded input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import (
    GroupState, GroupStateTimeout,
)

EVENTS_SCHEMA = ("event_id bigint, user_id bigint, event_type string, "
                 "value double, ts timestamp")


def _list_sink(rows: list):
    """foreachBatch list sink with EPOCH-ID DEDUP (ADVICE r5): Spark's
    foreachBatch contract re-delivers a micro-batch with the SAME
    epoch_id on retry, so a bare rows.extend() would double-append;
    skipping already-seen epochs makes the append idempotent within a
    run.  The seen-set lives in the closure, so a restart-from-
    checkpoint that re-delivers an epoch whose sink ran but whose
    commit did not is NOT covered — that (rare, crash-window) case
    needs an idempotent TABLE sink in production: `parquet_epoch_sink`
    below (dynamic-partition-overwrite per epoch, pytest-proven
    idempotent under both retry shapes). The list form is the
    gate/test harness.
    """
    seen: set = set()

    def sink(df, epoch_id):
        if epoch_id in seen:
            return
        seen.add(epoch_id)
        rows.extend(df.collect())

    return sink


def parquet_epoch_sink(path: str):
    """PRODUCTION foreachBatch sink: epoch-partitioned parquet with
    DYNAMIC partition overwrite — idempotent under BOTH retry shapes:

      * same-run retry (same epoch_id re-delivered to this sink):
        the overwrite replaces only the `epoch=<id>` partition, so a
        double delivery rewrites identical data instead of appending;
      * restart-from-checkpoint re-delivery of an epoch whose sink ran
        but whose offset commit did not (the crash window a driver-side
        seen-set cannot cover): the new run overwrites the same
        partition again — exactly-once table contents either way.

    This is the plans/checkpoint.py commit discipline applied to a
    streaming sink; at 100 TB/day each epoch partition is a normal
    parquet commit and downstream readers see append-only epochs.
    Read the results back with spark.read.parquet(path).
    """
    def sink(df, epoch_id):
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        try:
            (df.withColumn("epoch", F.lit(int(epoch_id)))
               .write.mode("overwrite").partitionBy("epoch")
               .parquet(path))
        finally:
            # restore EXACTLY the previous state (ADVICE r6): leaving
            # 'dynamic' set session-wide would silently flip other
            # overwrite writes in the same session from full-truncate
            # to partition-only semantics
            if prev is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev)
            else:
                spark.conf.unset(
                    "spark.sql.sources.partitionOverwriteMode")

    return sink


def stream_windowed_stats(spark: SparkSession, src_dir: str,
                          checkpoint_dir: str,
                          watermark: str = "1 hour"):
    """Tumbling 1-hour window count/sum per event type with a late-data
    watermark; complete rows land in an in-memory table per drain.
    Returns the collected rows (window_start, event_type, n,
    sum_value_c)."""
    ev = (spark.readStream.format("parquet").schema(EVENTS_SCHEMA)
          .load(src_dir)
          .withWatermark("ts", watermark))
    agg = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
                .alias("sum_value_c"))
           .select(F.col("w.start").alias("window_start"),
                   "event_type", "n", "sum_value_c"))
    name = "dle_win_" + checkpoint_dir.replace("/", "_")[-32:] \
        .replace("-", "_").replace(".", "_")
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).collect()


def stream_windowed_append(spark: SparkSession, src_dir: str,
                           checkpoint_dir: str, rows: list,
                           watermark: str = "1 hour") -> None:
    """APPEND-mode tumbling windows with a real late-data watermark:
    a window emits exactly once, when the watermark passes its end,
    and events arriving after that are DROPPED (state already purged).
    foreachBatch sink so watermark + state resume across drains."""
    ev = (spark.readStream.format("parquet").schema(EVENTS_SCHEMA)
          .load(src_dir)
          .withWatermark("ts", watermark))
    agg = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.col("w.start").alias("window_start"),
                   "event_type", "n"))

    sink = _list_sink(rows)

    q = (agg.writeStream.outputMode("append")
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def stream_sessions(spark: SparkSession, src_dir: str,
                    checkpoint_dir: str, gap_s: int = 1800):
    """Gap-based sessionization as a CUSTOM STATEFUL operator:
    applyInPandasWithState keyed by user. State = the user's merged
    session INTERVALS (start/end arrays), so events arriving out of
    order ACROSS micro-batches still sessionize exactly — a late
    point that bridges two intervals merges them, identical to a
    global sort (a last-timestamp-only state would miscount; found in
    round-2 review). Emits the running session count per user per
    micro-batch; on bounded input the final counts equal the batch
    events_sessions query."""

    def fn(key, pdfs, state: GroupState):
        secs = []
        for pdf in pdfs:
            secs.extend((pdf["ts"].astype("int64") // 10**9).tolist())
        if state.exists:
            starts, ends = state.get
            ivals = [[int(a), int(b)]
                     for a, b in zip(list(starts), list(ends))]
        else:
            ivals = []
        ivals.extend([s, s] for s in secs)
        ivals.sort()
        merged: list = []
        for st_, en in ivals:
            if merged and st_ - merged[-1][1] <= gap_s:
                merged[-1][1] = max(merged[-1][1], en)
            else:
                merged.append([st_, en])
        state.update(([m[0] for m in merged],
                      [m[1] for m in merged]))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_sessions": [len(merged)]})

    ev = (spark.readStream.format("parquet").schema(EVENTS_SCHEMA)
          .load(src_dir).select("user_id", "ts"))
    out = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id bigint, n_sessions bigint",
        stateStructType="starts array<bigint>, ends array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
    # foreachBatch sink: unlike the memory sink it supports RESUMING
    # from an existing checkpoint, which is the whole point of the
    # stateful operator (state + source offsets survive restarts)
    rows: list = []

    sink = _list_sink(rows)

    q = (out.writeStream.outputMode("update")
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # last emitted row per user wins (update mode)
    final = {}
    for r in rows:
        final[r["user_id"]] = r["n_sessions"]
    return final


DOCS_STREAM_SCHEMA = "doc_id bigint, text string, ts timestamp"


def stream_dedup_exact(spark: SparkSession, src_dir: str,
                       checkpoint_dir: str, rows: list,
                       watermark: str = "1 hour") -> None:
    """STREAMING exact dedup (training-data ingest shape — the
    streaming twin of q_dedup_exact): md5(text) keys deduplicated
    across micro-batches AND across drains (state + source offsets
    live in the checkpoint), with BOUNDED state —
    dropDuplicatesWithinWatermark purges a key once the watermark
    passes it, so at 100 TB/day the dedup state holds one watermark
    window of keys, not the corpus. First occurrence wins and is
    appended to `rows` (doc_id, text_md5) via foreachBatch."""
    src = (spark.readStream.format("parquet")
           .schema(DOCS_STREAM_SCHEMA).load(src_dir)
           .withWatermark("ts", watermark)
           .withColumn("text_md5", F.md5("text"))
           .dropDuplicatesWithinWatermark(["text_md5"])
           .select("doc_id", "text_md5"))

    sink = _list_sink(rows)

    q = (src.writeStream.outputMode("append")
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def stream_dedup_minhash(spark: SparkSession, src_dir: str,
                         checkpoint_dir: str, rows: list) -> None:
    """STREAMING near-dup detection — the streaming twin of the gated
    q_dedup_minhash_buckets: every arriving doc's MinHash band rows
    (the SAME in-scan expression tree, queries_text.minhash_bands_for)
    update per-(band, bucket) state via applyInPandasWithState; each
    micro-batch emits the bucket's running (keeper_doc_id, n_docs).
    The LAST update per key after a full drain equals the batch query
    on the same input (proven cross-drain in tests).

    State per bucket is two ints (keeper = min doc_id, n_docs) — at
    100 TB the state size is the number of LIVE collision buckets, not
    the corpus, and a TTL/watermark policy can bound it further.
    Assumes upstream exact dedup (stream_dedup_exact) so a doc_id
    arrives at a bucket at most once."""
    from ..queries_text import minhash_bands_for

    src = (spark.readStream.format("parquet")
           .schema(DOCS_STREAM_SCHEMA).load(src_dir))
    bands = minhash_bands_for(src.select("doc_id", "text"))

    def fn(key, pdfs, state: GroupState):
        docs = []
        for pdf in pdfs:
            docs.extend(pdf["doc_id"].tolist())
        if state.exists:
            keeper, n = state.get
        else:
            keeper, n = None, 0
        keeper = min([int(d) for d in docs]
                     + ([int(keeper)] if keeper is not None else []))
        n += len(docs)
        state.update((keeper, n))
        yield pd.DataFrame({"band": [key[0]], "bucket": [key[1]],
                            "keeper_doc_id": [keeper], "n_docs": [n]})

    out = bands.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        outputStructType=("band int, bucket string, "
                          "keeper_doc_id bigint, n_docs bigint"),
        stateStructType="keeper bigint, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)

    sink = _list_sink(rows)

    q = (out.writeStream.outputMode("update")
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()


DOCS_PLAIN_SCHEMA = "doc_id bigint, text string"


def stream_decontaminate(spark: SparkSession, src_dir: str,
                         checkpoint_dir: str, bench, rows: list,
                         glob: str | None = None,
                         max_files: int | None = None,
                         min_shared: int = 3,
                         where: str | None = None) -> None:
    """STREAMING train/eval decontamination — the stream-static twin
    of operators/curation.py::decontaminate: training docs arrive as a
    file stream, the (small, static) benchmark suite's shingle index
    is broadcast, and each micro-batch emits the contaminated docs it
    contains via foreachBatch running the SAME gated batch operator.

    Correct across any micro-batch split because a document's row is
    atomic within one batch and the per-doc result depends only on
    that doc's text vs the STATIC bench side — no cross-batch state is
    needed at all, which is exactly why the stream-static shape scales:
    at 100 TB/day the streaming job holds zero state beyond source
    offsets (pytest proves two-batch == one-batch == batch equality
    via maxFilesPerTrigger=1).

    ``bench`` is a batch DataFrame (doc_id, text). ``where`` filters
    the streaming corpus side (e.g. to exclude the eval split itself).
    Contaminated-doc rows (doc_id, n_bench, max_shared, sum_shared)
    are appended to ``rows``.
    """
    from ..operators.curation import decontaminate

    reader = (spark.readStream.format("parquet")
              .schema(DOCS_PLAIN_SCHEMA))
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    src = reader.load(src_dir)
    if where is not None:
        src = src.where(where)

    seen: set = set()

    def sink(df, epoch_id):
        # epoch-id dedup (ADVICE r5) — see _list_sink; custom body
        # because the batch operator runs inside the sink
        if epoch_id in seen:
            return
        seen.add(epoch_id)
        rows.extend(
            decontaminate(df, bench, min_shared=min_shared).collect())

    q = (src.writeStream.outputMode("append")
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
