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
green in the suite.

Round 11 (VERDICT r10 asks #1/#6) extends the gate to the RELATIONAL
date surface (lineitem.l_shipdate / orders.o_orderdate) and to the
full representable range: the comparator now projects temporal result
columns to canonical strings before pandas, so year-9999/0001
sentinels transit the harness, and the edge set carries them. The two
real divergences that gate found — raw-min/max z-order scaling dying
under outlier dates, and Spark's ISO-expanded '+10000' spelling of
date-arithmetic overflow — are pinned below via tf_zorder and
fn_datetime."""

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
    # year-0001 partition bound: py4j date literals go through an
    # unpadded strftime('%Y-%m-%d') that java.sql.Date.valueOf
    # rejects — the r11 full-range sentinel found sink_partitioned
    # crashing on exactly this; the key now builds its window bounds
    # from isoformat() strings cast engine-side
    "sink_partitioned",
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


# ---------------------------------------------------- relational surface

#: Representative relational-date keys (full scope = every key whose
#: source/oracle reads l_shipdate or o_orderdate — discovered by
#: tools.timeedge_check.relational_probe_keys; full-gate record:
#: bench/TIMEEDGE_relational_r11.json):
#: - flagship_pricing_summary: the shipdate filter boundary
#: - project_rename_cast: o_orderdate passes through the result, so
#:   year-9999/0001 sentinel rows must round-trip the comparator
#:   VALUE-EXACTLY (the ask-#6 pin — the old pandas-ns harness bound)
#: - fn_datetime: date arithmetic OVERFLOWING year 9999 (+30 days on
#:   the far-future placeholder) — engines agree on the value, the
#:   '+10000' ISO-expanded spelling is normalized
#: - tf_zorder: outlier-robust (quantile-clamped) z-order scaling —
#:   raw min/max scaling let a 2% outlier-date tail kill date pruning
#: - ts_monthly_growth: month-grain calendar math across the range
REL_KEYS = [
    "flagship_pricing_summary",
    "project_rename_cast",
    "fn_datetime",
    "tf_zorder",
    "ts_monthly_growth",
]


@pytest.fixture(scope="module")
def timeedge_rel_sf_dir(tmp_path_factory):
    from tools.timeedge_check import SURFACES, build_timeedge_replica

    from tests.conftest import SF_SMOKE

    d = tmp_path_factory.mktemp("timeedge_rel")
    n = build_timeedge_replica(SF_SMOKE, str(d), SURFACES["relational"])
    assert n > 0, "no edge dates injected"
    return str(d)


@pytest.fixture(scope="module")
def rel_oracle_con(timeedge_rel_sf_dir):
    from tools.oracle_check import TABLES

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS "
                    f"SELECT * FROM '{timeedge_rel_sf_dir}/{tbl}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", REL_KEYS)
def test_key_matches_oracle_on_edge_dates_relational(
        spark, timeedge_rel_sf_dir, rel_oracle_con, key):
    from tools.oracle_check import compare

    from lakehouse_automation_spark import queries as Q
    from lakehouse_automation_spark.operators.cache import release_persisted

    reg = Q.REGISTRY[key]
    try:
        verdict = compare(key, reg.fn(spark, timeedge_rel_sf_dir),
                          reg.oracle, rel_oracle_con)
        assert verdict.startswith("OK"), verdict
    finally:
        release_persisted()


def test_replica_carries_full_range_sentinels(timeedge_rel_sf_dir):
    """The r11 edge set includes the year-9999 and year-0001 sentinels
    the old pandas-bound comparator could not transit (VERDICT r10
    ask #6) — prove the replica actually carries them into
    o_orderdate so the REL_KEYS pins above exercise them."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    od = pq.read_table(
        f"{timeedge_rel_sf_dir}/orders.parquet").column("o_orderdate")
    years = pc.year(od)
    assert pc.min(years).as_py() == 1
    assert pc.max(years).as_py() == 9999
