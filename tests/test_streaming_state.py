"""Live applyInPandasWithState test: the stateful per-user totals over
a REAL stream must carry state ACROSS micro-batches and converge to the
batch fold (streaming/stateful.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_automation_spark.streaming.stateful import (
    user_totals_batch,
    user_totals_stream,
)


def test_stateful_stream_matches_batch(spark, tmp_path):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "value")
    )
    # land as TWO files so availableNow=..., maxFilesPerTrigger=1 forces
    # >=2 micro-batches — state must survive between them
    src = str(tmp_path / "src")
    half = events.filter(F.col("user_id") % 2 == 0)
    rest = events.filter(F.col("user_id") % 2 == 1)
    half.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "a"))
    rest.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        user_totals_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda bdf, bid: bdf.write.mode("overwrite")
                      .parquet(os.path.join(out_dir, f"b{bid}")))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout=120), "stateful stream did not drain"

    # last update per user wins (update mode re-emits running totals)
    got_df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("basePath", out_dir).parquet(out_dir)
        .withColumn("_f", F.input_file_name())
    )
    rows = got_df.collect()
    latest: dict[int, tuple[int, int]] = {}
    for r in sorted(rows, key=lambda r: r._f):
        latest[r.user_id] = (r.n_events, r.cents_sum)
    want = {
        r.user_id: (r.n_events, r.cents_sum)
        for r in user_totals_batch(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ).collect()
    }
    assert latest == want


def test_stateful_stream_carries_null_state_across_batches(spark, tmp_path):
    """A user whose values are ALL NULL must hold a NULL cents_sum in
    the state store ACROSS micro-batches (SQL SUM semantics: no value
    ever seen -> NULL, not 0) — the live-stream path of the round-8
    null-sweep fix, which the batch restatement alone can't exercise:
    state.update((n, None)) and the object-dtype [None] output column
    both have to survive the Arrow/state-store round trip."""
    rows = [
        # batch a: user 1 all-null, user 2 mixed
        ("a", [(1, None), (1, None), (2, 3.25), (2, None)]),
        # batch b: user 1 STILL all-null (None state must reload),
        # user 2 gains a value on top of non-null state
        ("b", [(1, None), (2, 1.75)]),
    ]
    src = str(tmp_path / "src")
    for name, data in rows:
        (spark.createDataFrame(data, "user_id long, value double")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(src, name)))

    schema = "user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        user_totals_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda bdf, bid: bdf.write.mode("overwrite")
                      .parquet(os.path.join(out_dir, f"b{bid}")))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout=120), "stateful stream did not drain"

    got_df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("basePath", out_dir).parquet(out_dir)
        .withColumn("_f", F.input_file_name())
    )
    latest: dict[int, tuple] = {}
    for r in sorted(got_df.collect(), key=lambda r: r._f):
        latest[r.user_id] = (r.n_events, r.cents_sum)
    # user 1: 3 NULL-valued events -> count 3, sum NULL (never 0)
    # user 2: 3 events, 325 + 175 non-null cents
    assert latest == {1: (3, None), 2: (3, 500)}


def test_stateful_batch_restatement_is_exact(spark):
    """The gate key's applyInPandas fold equals plain SQL aggregation."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r.user_id: (r.n_events, r.cents_sum)
           for r in user_totals_batch(events).collect()}
    want = {
        r.user_id: (r.n, r.c)
        for r in events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        ).collect()
    }
    assert got == want


def _has_protobuf() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's driver worker imports google.protobuf "
           "(absent in this container; pip install protobuf is provably "
           "impossible — pypi.org unreachable, DNS 'Name or service "
           "not known', probed r8; re-assessed r9: unlike the PNG codec "
           "vendored for the image tier, protobuf cannot be honestly "
           "vendored — the import happens inside pyspark's own "
           "StatefulProcessor worker, needs the generated C++/upb or "
           "full pure-python runtime, and a stub would fake the very "
           "serialization under test) — auto-unskips when installed; "
           "the batch restatement stays oracle-gated regardless",
)
def test_tws_stream_matches_batch(spark, tmp_path):
    """transformWithStateInPandas over a REAL multi-micro-batch stream
    (RocksDB state store) must carry BOTH ValueStates across batches
    and converge to the batch fold."""
    from lakehouse_automation_spark.streaming.stateful import (
        user_totals_tws_batch,
        user_totals_tws_stream,
    )

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "value")
    )
    src = str(tmp_path / "src")
    half = events.filter(F.col("user_id") % 2 == 0)
    rest = events.filter(F.col("user_id") % 2 == 1)
    half.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "a"))
    rest.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b"))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        out_dir = str(tmp_path / "out")
        q = (
            user_totals_tws_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda bdf, bid: bdf.write.mode("overwrite")
                          .parquet(os.path.join(out_dir, f"b{bid}")))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(timeout=120), "tws stream did not drain"
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)

    got_df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("basePath", out_dir).parquet(out_dir)
        .withColumn("_f", F.input_file_name())
    )
    latest: dict[int, tuple] = {}
    for r in sorted(got_df.collect(), key=lambda r: r._f):
        latest[r.user_id] = (r.n_events, r.cents_sum, r.cents_max)
    want = {
        r.user_id: (r.n_events, r.cents_sum, r.cents_max)
        for r in user_totals_tws_batch(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ).collect()
    }
    assert latest == want


def test_fold_batch_is_exact_to_the_bigint_boundary_then_loud():
    """The cents fold sums in unbounded Python ints (a numpy int64
    accumulate wraps silently past 2^63) and the BIGINT output
    contract is enforced with a NAMED error: 92 rows at the 1e15
    domain max (9.2e18 cents) are exact and representable; 200 rows
    (2e19) exceed the declared bigint columns — DuckDB's
    HUGEINT->BIGINT cast would abort there too, so the fold raises
    the contract error instead of an opaque Arrow overflow."""
    import pandas as pd
    import pytest

    from lakehouse_automation_spark.streaming.stateful import _fold_batch

    n, cents = _fold_batch(pd.DataFrame({"value": [1e15] * 92}))
    assert (n, cents) == (92, 92 * 10**17)  # exact, just under 2^63

    with pytest.raises(OverflowError, match="BIGINT output contract"):
        _fold_batch(pd.DataFrame({"value": [1e15] * 200}))
