"""Streaming twins must agree with the batch engine on bounded input:
watermarked tumbling-window aggregation vs events_window_stats, and
applyInPandasWithState sessionization vs events_sessions."""

from __future__ import annotations

from pyspark.sql import functions as F

from dle import queries as q
from dle.sqlgen import register_tables
from dle.streaming.stateful import stream_sessions, stream_windowed_stats

SF = "/root/testdata/sf0.001"


def _events_dir(spark, tmp_path):
    register_tables(spark, SF)
    src = str(tmp_path / "events_src")
    spark.table("events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).write.parquet(src)
    return src


def test_stream_windowed_stats_matches_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    rows = stream_windowed_stats(spark, src, str(tmp_path / "ck1"))
    got = {(int(r["window_start"].timestamp()) // 3600, r["event_type"]):
           (r["n"], r["sum_value_c"]) for r in rows}
    batch = q.queries()["events_window_stats"](spark, SF).collect()
    want = {(r["window_id"], r["event_type"]):
            (r["n"], int(round(r["sum_value"] * 100)))
            for r in batch}
    assert got == want


def test_stream_sessions_matches_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    got = stream_sessions(spark, src, str(tmp_path / "ck2"))
    batch = q.queries()["events_sessions"](spark, SF).collect()
    want = {r["user_id"]: r["n_sessions"] for r in batch}
    assert got == want


def test_stream_sessions_out_of_order_across_drains(spark, tmp_path):
    """Late events in a later drain must sessionize as if globally
    sorted: a bridging point merges intervals, an isolated earlier
    point opens its own session."""
    import datetime as dt

    src = str(tmp_path / "ooo")
    ck = str(tmp_path / "ck_ooo")

    def write(rows):
        df = spark.createDataFrame(
            [(i, 1, "click", 1.0,
              dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
             for i, s in enumerate(rows)],
            "event_id bigint, user_id bigint, event_type string,"
            " value double, ts timestamp")
        df.write.mode("append").parquet(src)

    write([10000, 20000])            # two sessions (gap 1800)
    first = stream_sessions(spark, src, ck)
    assert first[1] == 2
    write([11000])                   # within gap of 10000: merges
    second = stream_sessions(spark, src, ck)
    assert second[1] == 2
    write([100])                     # isolated early point: new session
    third = stream_sessions(spark, src, ck)
    assert third[1] == 3


def test_stream_append_watermark_drops_late_events(spark, tmp_path):
    """Append mode + 1h watermark: a window emits once when the
    watermark passes it; an event later than the watermark is dropped
    (never re-emits or modifies the already-final window)."""
    import datetime as dt

    from dle.streaming.stateful import stream_windowed_append

    src = str(tmp_path / "wsrc")
    ck = str(tmp_path / "wck")
    b = dt.datetime(2024, 1, 1)

    def write(secs):
        spark.createDataFrame(
            [(i, 1, "click", 1.0, b + dt.timedelta(seconds=s))
             for i, s in enumerate(secs)],
            "event_id bigint, user_id bigint, event_type string,"
            " value double, ts timestamp"
        ).write.mode("append").parquet(src)

    rows: list = []
    write([0, 100, 5 * 3600])           # W0 x2 + an event at 5h
    stream_windowed_append(spark, src, ck, rows)
    write([10 * 3600])                  # advances watermark past W0
    stream_windowed_append(spark, src, ck, rows)
    w0 = [r for r in rows if r["window_start"] == b]
    assert len(w0) == 1 and w0[0]["n"] == 2   # W0 final, exactly once
    write([1800, 20 * 3600])            # 1800s is BEYOND-LATE for W0
    stream_windowed_append(spark, src, ck, rows)
    w0 = [r for r in rows if r["window_start"] == b]
    assert len(w0) == 1 and w0[0]["n"] == 2   # late event dropped
    w5 = [r for r in rows
          if r["window_start"] == b + dt.timedelta(hours=5)]
    assert len(w5) == 1 and w5[0]["n"] == 1   # 5h window finalized


def test_stream_pip_rollup_matches_batch(spark, tmp_path):
    """Stream-static PIP precedence: draining the full points table
    through the streaming path totals exactly the batch rollup; a
    second drain with no new files adds nothing."""
    from dle import sqlgen
    from dle.config import DEFAULT_DEPTH
    from dle.streaming.availablenow import stream_pip_rollup

    src = str(tmp_path / "pts")
    pts = sqlgen.spark_view(spark, SF, "points").select(
        "page_id", "cand_i", "px", "py")
    pts.write.parquet(src)
    layers = sqlgen.spark_view(spark, SF, "layers")
    acc: list = []
    stream_pip_rollup(spark, src, layers, acc,
                      str(tmp_path / "ckp"), DEFAULT_DEPTH)
    got: dict = {}
    for d in acc:
        for k, v in d.items():
            got[k] = got.get(k, 0) + v
    want = {
        r["process_order"]: r["n_points"]
        for r in q.queries()["spatial_rollup_counts"](spark, SF)
        .withColumn("process_order",
                    F.expr("cast(substring(designation, 7, 2) as int)"))
        .select("process_order", "n_points").collect()}
    assert got == want
    acc2: list = []
    stream_pip_rollup(spark, src, layers, acc2,
                      str(tmp_path / "ckp"), DEFAULT_DEPTH)
    assert sum(sum(d.values()) for d in acc2) == 0


def test_stream_sessions_resume_incremental(spark, tmp_path):
    """State survives across drains: feeding the same directory again
    adds no sessions; feeding NEW later events extends counts."""
    src = _events_dir(spark, tmp_path)
    ck = str(tmp_path / "ck3")
    first = stream_sessions(spark, src, ck)
    # new events far in the future for 3 users -> +1 session each
    register_tables(spark, SF)
    some = [r["user_id"] for r in
            spark.table("events").select("user_id").distinct()
            .orderBy("user_id").limit(3).collect()]
    new = spark.createDataFrame(
        [(10**6 + i, u, "click", 1.0) for i, u in enumerate(some)],
        "event_id bigint, user_id bigint, event_type string,"
        " value double").withColumn(
        "ts", F.lit("2031-01-01 00:00:00").cast("timestamp"))
    new.select("event_id", "user_id", "event_type", "value",
               "ts").write.mode("append").parquet(src)
    second = stream_sessions(spark, src, ck)
    for u in some:
        assert second[u] == first[u] + 1, u


def test_stream_dedup_exact_cross_drain(spark, tmp_path):
    """Streaming exact dedup: first occurrence wins within a drain AND
    across drains (key state survives in the checkpoint); keys only
    expire past the watermark (bounded state)."""
    import datetime as dt

    from dle.streaming.stateful import stream_dedup_exact

    src = str(tmp_path / "docs_src")
    ck = str(tmp_path / "ck_dedup")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write(rows):
        spark.createDataFrame(
            rows, "doc_id bigint, text string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

    # drain 1: A, B, and an in-batch duplicate of A
    write([(1, "alpha", t0), (2, "beta", t0),
           (3, "alpha", t0 + dt.timedelta(minutes=1))])
    rows: list = []
    stream_dedup_exact(spark, src, ck, rows)
    got1 = {(r["doc_id"], r["text_md5"]) for r in rows}
    assert {d for d, _ in got1} == {1, 2}

    # drain 2: duplicate of B (same watermark window -> dropped by
    # cross-drain state) plus a new doc C
    write([(4, "beta", t0 + dt.timedelta(minutes=2)),
           (5, "gamma", t0 + dt.timedelta(minutes=3))])
    rows2: list = []
    stream_dedup_exact(spark, src, ck, rows2)
    assert {r["doc_id"] for r in rows2} == {5}

    # batch twin agreement on the union: distinct md5 count matches
    batch = (spark.read.parquet(src)
             .select(F.md5("text").alias("m")).distinct().count())
    assert batch == len(got1) + len(rows2)


def test_stream_dedup_minhash_cross_drain(spark, tmp_path):
    """Streaming near-dup bucket state equals the batch
    q_dedup_minhash_buckets result on the union input after two
    drains (state + offsets resume from the checkpoint), using the
    driver sf0.001 documents split into two halves."""
    import datetime as dt

    from dle.queries_text import minhash_bands_for
    from dle.sqlgen import register_tables
    from dle.streaming.stateful import stream_dedup_minhash

    register_tables(spark, SF)
    docs = (spark.table("documents").select("doc_id", "text")
            .withColumn("ts", F.lit(
                dt.datetime(2024, 1, 1)).cast("timestamp")))
    src = str(tmp_path / "docs_src")
    ck = str(tmp_path / "ck_mh")
    docs.where("doc_id % 2 = 0").coalesce(1) \
        .write.mode("append").parquet(src)
    rows: list = []
    stream_dedup_minhash(spark, src, ck, rows)
    docs.where("doc_id % 2 = 1").coalesce(1) \
        .write.mode("append").parquet(src)
    stream_dedup_minhash(spark, src, ck, rows)

    # last update per (band, bucket) wins
    final = {}
    for r in rows:
        final[(r["band"], r["bucket"])] = (r["keeper_doc_id"],
                                           r["n_docs"])
    multi = {k: v for k, v in final.items() if v[1] > 1}

    batch = (minhash_bands_for(spark.table("documents")
                               .select("doc_id", "text"))
             .groupBy("band", "bucket")
             .agg(F.min("doc_id").alias("keeper"),
                  F.countDistinct("doc_id").alias("n"))
             .where("n > 1").collect())
    expect = {(r["band"], r["bucket"]): (r["keeper"], r["n"])
              for r in batch}
    assert multi == expect


def test_parquet_epoch_sink_idempotent(spark, tmp_path):
    """parquet_epoch_sink (ADVICE r5): re-delivering the SAME epoch —
    both within a run and simulating a restart-window re-delivery —
    must leave exactly one copy of that epoch's rows (dynamic
    partition overwrite replaces, never appends), while distinct
    epochs accumulate. Also drained end-to-end through a real
    availableNow stream."""
    from dle.streaming.stateful import parquet_epoch_sink

    out = str(tmp_path / "sink_out")
    sink = parquet_epoch_sink(out)
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink(df0, 0)
    sink(df0, 0)                       # same-run duplicate delivery
    sink = parquet_epoch_sink(out)     # "restarted" sink, fresh closure
    sink(df0, 0)                       # crash-window re-delivery
    sink(spark.createDataFrame([(3, "c")], "k long, v string"), 1)
    back = spark.read.parquet(out)
    # session disables partition-column type inference (quadkey rule),
    # so epoch reads back as string — cast for the comparison
    assert sorted((r["k"], r["v"], int(r["epoch"]))
                  for r in back.collect()) \
        == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]

    # end-to-end: drain a real file stream through the sink; table
    # contents must equal the source regardless of batch splits
    src = str(tmp_path / "stream_src")
    docs = [(i, f"text {i}") for i in range(10)]
    spark.createDataFrame(docs[:5], "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(docs[5:], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    out2 = str(tmp_path / "sink_out2")
    q2 = (spark.readStream.format("parquet")
          .schema("doc_id long, text string")
          .option("maxFilesPerTrigger", "1").load(src)
          .writeStream.outputMode("append")
          .foreachBatch(parquet_epoch_sink(out2))
          .option("checkpointLocation", str(tmp_path / "ck_sink"))
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())
    assert got == list(range(10))
    # two files -> two epochs under maxFilesPerTrigger=1
    n_epochs = spark.read.parquet(out2).select("epoch").distinct().count()
    assert n_epochs == 2
