"""Property/edge tests for the as-of join composition (SURVEY §5.4:
ties, empty partitions, all-late data are the real edge cases)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F, types as T

from lakehouse_automation_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


LEFT_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("lts", T.TimestampType()),
    T.StructField("lid", T.LongType()),
])
RIGHT_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("rts", T.TimestampType()),
])


def run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    right = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_value_as="matched")
    return {r["lid"]: r["matched"] for r in out.collect()}


def test_basic_latest_before(spark):
    got = run(
        spark,
        [("a", _ts("2024-01-01T10:00"), 1), ("a", _ts("2024-01-01T12:00"), 2)],
        [("a", _ts("2024-01-01T09:00")), ("a", _ts("2024-01-01T11:00"))],
    )
    assert got[1] == _ts("2024-01-01T09:00")
    assert got[2] == _ts("2024-01-01T11:00")


def test_tie_is_inclusive(spark):
    """A right row exactly at the left ts matches (DuckDB ASOF >= parity)."""
    got = run(
        spark,
        [("a", _ts("2024-01-01T10:00"), 1)],
        [("a", _ts("2024-01-01T10:00"))],
    )
    assert got[1] == _ts("2024-01-01T10:00")


def test_no_match_is_null(spark):
    got = run(
        spark,
        [("a", _ts("2024-01-01T08:00"), 1)],
        [("a", _ts("2024-01-01T09:00"))],
    )
    assert got[1] is None


def test_key_isolation(spark):
    """Right rows never leak across keys."""
    got = run(
        spark,
        [("a", _ts("2024-01-01T10:00"), 1), ("b", _ts("2024-01-01T10:00"), 2)],
        [("b", _ts("2024-01-01T09:00"))],
    )
    assert got[1] is None
    assert got[2] == _ts("2024-01-01T09:00")


def test_empty_right(spark):
    got = run(spark, [("a", _ts("2024-01-01T10:00"), 1)], [])
    assert got == {1: None}


def test_matches_duckdb_asof_on_events(spark):
    """Cross-engine property: our composition == DuckDB ASOF JOIN at sf0.001."""
    import duckdb

    from lakehouse_automation_spark.engine import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    ours = {
        r["event_id"]: r["m"]
        for r in asof_join(errors, signups, on="user_id", left_ts="ts",
                           right_ts="ts", right_value_as="m").collect()
    }
    con = duckdb.connect()
    theirs = {
        row[0]: row[1]
        for row in con.execute("""
            WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts
                       FROM '/root/testdata/sf0.001/events.parquet' WHERE event_type='error'),
                 s AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts
                       FROM '/root/testdata/sf0.001/events.parquet' WHERE event_type='signup')
            SELECT e.event_id, s.ts FROM e ASOF LEFT JOIN s
              ON e.user_id = s.user_id AND e.ts >= s.ts
        """).fetchall()
    }
    assert ours == theirs


def test_asof_forward_and_tolerance_semantics(spark):
    from lakehouse_automation_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 50), (2, 5)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 12, "a"), (1, 40, "b"), (2, 100, "c")],
        "k long, ts long, v string")

    fwd = {(r["k"], r["ts"]): r["m"] for r in
           asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     right_value="v", right_value_as="m",
                     direction="forward").collect()}
    # earliest right at-or-after
    assert fwd == {(1, 10): "a", (1, 50): None, (2, 5): "c"}

    tol = {(r["k"], r["ts"]): r["m"] for r in
           asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     right_value="v", right_value_as="m",
                     direction="forward", tolerance_s=10).collect()}
    # (1,10)->12 gap 2 ok; (2,5)->100 gap 95 nulled
    assert tol == {(1, 10): "a", (1, 50): None, (2, 5): None}

    back = {(r["k"], r["ts"]): r["m"] for r in
            asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                      right_value="v", right_value_as="m",
                      tolerance_s=5).collect()}
    # backward: (1,50)->40 gap 10 > 5 nulled; (1,10) no earlier right
    assert back == {(1, 10): None, (1, 50): None, (2, 5): None}


def test_asof_direction_validation(spark):
    import pytest

    from lakehouse_automation_spark.operators.asof import asof_join

    df = spark.range(1).withColumn("ts", F.col("id"))
    with pytest.raises(ValueError):
        asof_join(df, df, on="id", left_ts="ts", right_ts="ts",
                  direction="nearest")
