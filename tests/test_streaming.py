"""LIVE Structured Streaming tests for the semantics the batch-
restated gate keys claim: windowed aggregation parity, watermark
late-row dropping, and stateful dedup within a watermark. Each test
runs a REAL readStream over landed files, forced into multiple
micro-batches with maxFilesPerTrigger=1 so cross-batch state and
watermark advancement genuinely engage."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F, types as T

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])

T0 = dt.datetime(2024, 6, 1, 10, 0, 0)


def _land(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(path)


def _run_stream(spark, src, tmp_path, build, mode):
    """readStream over src (1 file per micro-batch) -> build(df) ->
    foreachBatch capture; returns list of (batch_id, rows)."""
    captured = []

    def sink(bdf, bid):
        captured.append((bid, bdf.collect()))

    q = (
        build(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        .writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout=120)
    return captured


def test_stream_tumbling_agg_matches_batch(spark, tmp_path):
    rows = [(i, T0 + dt.timedelta(minutes=7 * i), float(i)) for i in range(20)]
    src = str(tmp_path / "src")
    _land(spark, os.path.join(src, "a"), rows[:10])
    _land(spark, os.path.join(src, "b"), rows[10:])

    def build(stream):
        return (stream.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n")))

    captured = _run_stream(spark, src, tmp_path, build, "complete")
    final = {r["w"]["start"]: r["n"] for r in captured[-1][1]}
    want = {
        r["w"]["start"]: r["n"]
        for r in spark.createDataFrame(rows, SCHEMA)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == want


def test_stream_watermark_finalizes_windows_exactly_once(spark, tmp_path):
    """Append-mode watermark semantics (what the stream_watermark_late
    key restates): a window emits exactly when the watermark passes
    its end, EXACTLY ONCE — a late row targeting an already-emitted
    window is dropped (it can never re-open the window or change the
    emitted count), and open windows are withheld."""
    import time

    src = str(tmp_path / "src")
    # batch 0: rows 10:00..12:00
    _land(spark, os.path.join(src, "a"),
          [(i, T0 + dt.timedelta(minutes=30 * i), 1.0) for i in range(5)])
    time.sleep(1.1)  # file mtime order = batch order
    # batch 1: fresh 13:00 row -> watermark 12:50 passes windows
    # 10:00-11:00 and 11:00-12:00 -> they EMIT here
    _land(spark, os.path.join(src, "b"),
          [(101, T0 + dt.timedelta(hours=3), 1.0)])
    time.sleep(1.1)
    # batch 2: a late 10:30 row aimed at the ALREADY-EMITTED 10:00
    # window (must be dropped) + a fresh 14:00 row
    _land(spark, os.path.join(src, "c"),
          [(102, T0 + dt.timedelta(minutes=30), 1.0),
           (103, T0 + dt.timedelta(hours=4), 1.0)])

    def build(stream):
        return (stream.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n")))

    captured = _run_stream(spark, src, tmp_path, build, "append")
    all_emits = [(r["w"]["start"], r["n"]) for _, rows in captured for r in rows]
    # each window emitted at most once (append's exactly-once contract)
    starts = [s for s, _ in all_emits]
    assert len(starts) == len(set(starts)), all_emits
    emitted = dict(all_emits)
    # the 10:00 window closed with its pre-watermark count — the late
    # 10:30 row neither re-emitted it nor changed the count
    assert emitted.get(T0) == 2, all_emits
    assert emitted.get(T0 + dt.timedelta(hours=1)) == 2
    # still-open windows (13:00, 14:00) withheld by this bounded run
    assert T0 + dt.timedelta(hours=4) not in emitted


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the same event_id replayed in a
    later micro-batch (within the watermark) is emitted exactly once
    — the stateful dedup the ledger-backed reference approximates."""
    src = str(tmp_path / "src")
    _land(spark, os.path.join(src, "a"),
          [(1, T0, 1.0), (2, T0 + dt.timedelta(minutes=1), 2.0)])
    # batch 2 replays id=2 and adds id=3
    _land(spark, os.path.join(src, "b"),
          [(2, T0 + dt.timedelta(minutes=1), 2.0),
           (3, T0 + dt.timedelta(minutes=2), 3.0)])

    def build(stream):
        return (stream.withWatermark("ts", "1 hour")
                .dropDuplicatesWithinWatermark(["event_id"]))

    captured = _run_stream(spark, src, tmp_path, build, "append")
    emitted = [r["event_id"] for _, rows in captured for r in rows]
    assert sorted(emitted) == [1, 2, 3], emitted


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """LIVE two-stream watermarked interval join — the semantics the
    stream_stream_join gate key restates in batch. Views and purchases
    arrive on separate streams (1 file per micro-batch each, so the
    join state must bridge micro-batches); watermarks on both sides
    bound the buffered state exactly as the batch key's time-range
    predicate bounds the join."""
    # `value` doubles as the user key: stream-stream joins REQUIRE an
    # equality predicate (Spark refuses a pure time-range condition),
    # exactly like the gate key's join on user_id.
    views = [(i, T0 + dt.timedelta(minutes=10 * i), float(i % 2))
             for i in range(8)]
    purchases = [
        # within the hour after view i=0..3, matching user parity: joins
        (100 + i, T0 + dt.timedelta(minutes=10 * i + 30), float(i % 2))
        for i in range(4)
    ] + [
        # 2 h after the last view: joins nothing
        (200, T0 + dt.timedelta(hours=4), 0.0)
    ]
    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "purch")
    _land(spark, os.path.join(vsrc, "a"), views[:4])
    _land(spark, os.path.join(vsrc, "b"), views[4:])
    _land(spark, os.path.join(psrc, "a"), purchases[:2])
    _land(spark, os.path.join(psrc, "b"), purchases[2:])

    def read(src):
        return (spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true").parquet(src))

    v = (read(vsrc).withWatermark("ts", "10 minutes")
         .select(F.col("event_id").alias("view_id"),
                 F.col("ts").alias("view_ts"),
                 F.col("value").alias("user")))
    p = (read(psrc).withWatermark("ts", "10 minutes")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts"),
                 F.col("value").alias("p_user")))
    joined = v.join(
        p, (F.col("user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")))

    captured = []

    def sink(bdf, bid):
        captured.append(bdf.collect())

    q = (joined.writeStream.outputMode("append").foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(timeout=120)

    got = sorted((r["view_id"], r["purchase_id"])
                 for rows in captured for r in rows)
    vb = spark.createDataFrame(views, SCHEMA).select(
        F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts"),
        F.col("value").alias("user"))
    pb = spark.createDataFrame(purchases, SCHEMA).select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"), F.col("value").alias("p_user"))
    want = sorted(
        (r["view_id"], r["purchase_id"])
        for r in vb.join(
            pb, (F.col("user") == F.col("p_user"))
            & (F.col("purchase_ts") > F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR"))
        ).collect())
    assert got == want and len(want) > 0


def test_stream_lands_one_acid_commit_per_microbatch(spark, tmp_path):
    """The tf_stream_ingest pattern: readStream -> foreachBatch ->
    CowTable commit. With 1 file per micro-batch, three landed files
    must produce exactly three manifest versions (create + 2 appends),
    each a complete snapshot — the transactional boundary the
    reference's sys.heatwave_load refresh provides and raw parquet
    appends lack."""
    from lakehouse_automation_spark.tableformat import CowTable

    src = str(tmp_path / "src")
    rows = [(i, T0 + dt.timedelta(minutes=i), float(i)) for i in range(9)]
    _land(spark, os.path.join(src, "a"), rows[:3])
    _land(spark, os.path.join(src, "b"), rows[3:6])
    _land(spark, os.path.join(src, "c"), rows[6:])

    state = {"tbl": None}

    def land(bdf, _bid):
        if state["tbl"] is None:
            state["tbl"] = CowTable.create(spark, bdf, str(tmp_path / "t"))
        else:
            state["tbl"].append(bdf)

    q = (spark.readStream.schema(SCHEMA)
         .option("maxFilesPerTrigger", "1")
         .option("recursiveFileLookup", "true").parquet(src)
         .writeStream.foreachBatch(land)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(timeout=120)

    tbl = state["tbl"]
    assert tbl.version() == 2  # create + 2 appends: one commit per batch
    assert [m["op"] for m in tbl.history()] == ["create", "append", "append"]
    assert tbl.read().count() == 9
    # each snapshot is a complete batch boundary: row counts step by 3
    assert [tbl.read(version=v).count() for v in (0, 1, 2)] == [3, 6, 9]


def test_stream_static_join_matches_batch(spark, tmp_path):
    """Live stream-static enrichment: each micro-batch broadcast-joins
    the same static dim; the union of batch outputs equals the batch
    join. Three files -> three micro-batches, so the dim provably
    serves multiple batches."""
    src = str(tmp_path / "src")
    rows = [(i, T0 + dt.timedelta(minutes=i), float(i % 4)) for i in range(12)]
    _land(spark, os.path.join(src, "a"), rows[:4])
    _land(spark, os.path.join(src, "b"), rows[4:8])
    _land(spark, os.path.join(src, "c"), rows[8:])

    dim = spark.createDataFrame(
        [(float(k), f"seg{k}") for k in range(4)], "k double, seg string")

    def build(stream):
        return (stream.join(F.broadcast(dim),
                            stream.value == dim.k)
                .select("event_id", "seg"))

    captured = _run_stream(spark, src, tmp_path, build, "append")
    assert len([1 for _, rows_ in captured if rows_]) >= 3
    got = sorted((r["event_id"], r["seg"])
                 for _, rows_ in captured for r in rows_)
    want = sorted((i, f"seg{i % 4}") for i in range(12))
    assert got == want
