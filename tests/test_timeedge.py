"""Extreme-timestamp regression pins (tools/timeedge_check.py): edge
datetimes injected into events.ts — epoch-zero sentinels, negative
epochs (the floor-vs-truncate division landmine: Spark's `div`
truncates toward zero, DuckDB's `//` floors, so 1969-12-31 23:59 is
day 0 in one spelling and day -1 in the other), century leap days, the
32-bit rollover, and both pandas-ns range ends. The full probe is
green on every events.ts-reading key at sf0.001 AND sf0.01
(bench/TIMEEDGE_PROBE_r10.json, bench/TIMEEDGE_sf001_r10.json, 48/48
each) — evidence the repo's explicit-floor oracle discipline holds on
adversarial dates; this file keeps one representative per time-shape
green in the suite."""

from __future__ import annotations

import duckdb
import pytest

KEYS = [
    "sessionize_events",        # gap sessionization across epoch signs
    "ts_resample_ffill",        # hour-grid division on negative epochs
    "event_active_users",       # day cover arithmetic (// vs div)
    "stream_tumbling_agg",      # window() bucketing at the range ends
    "join_asof",                # as-of ordering across the full span
    "retention_cohort",         # week-grain cohort on edge dates
]


@pytest.fixture(scope="module")
def timeedge_sf_dir(tmp_path_factory):
    from tools.timeedge_check import build_timeedge_replica

    from tests.conftest import SF_SMOKE

    d = tmp_path_factory.mktemp("timeedge")
    n = build_timeedge_replica(SF_SMOKE, str(d))
    assert n > 0, "no edge timestamps injected"
    return str(d)


@pytest.fixture(scope="module")
def oracle_con(timeedge_sf_dir):
    from tools.oracle_check import TABLES

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS "
                    f"SELECT * FROM '{timeedge_sf_dir}/{tbl}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", KEYS)
def test_key_matches_oracle_on_edge_timestamps(spark, timeedge_sf_dir,
                                               oracle_con, key):
    from tools.oracle_check import compare

    from lakehouse_automation_spark import queries as Q
    from lakehouse_automation_spark.operators.cache import release_persisted

    reg = Q.REGISTRY[key]
    try:
        verdict = compare(key, reg.fn(spark, timeedge_sf_dir),
                          reg.oracle, oracle_con)
        assert verdict.startswith("OK"), verdict
    finally:
        release_persisted()


def test_replica_carries_negative_epochs(timeedge_sf_dir):
    import datetime as dt

    import pyarrow.parquet as pq

    ts = pq.read_table(f"{timeedge_sf_dir}/events.parquet") \
        .column("ts").to_pylist()
    assert any(t is not None and t < dt.datetime(1970, 1, 1) for t in ts)
    assert any(t is not None and t > dt.datetime(2200, 1, 1) for t in ts)
