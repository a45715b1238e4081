"""Driver-contract smoke tests: entry() runs, every registered query
executes at sf0.001, registry/oracle wiring is consistent."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_registry_wiring():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # the genuinely non-SQL-expressible keys are the only ones allowed
    # to skip the oracle
    no_oracle = set(qs) - set(oracles)
    assert all(q is not None for q in qs.values())
    assert len(no_oracle) < len(qs) / 4


@pytest.mark.parametrize("key", sorted(__import__("__spark_entry__").queries()))
def test_query_runs_smoke(spark, key):
    import __spark_entry__ as e

    df = e.queries()[key](spark, SF_SMOKE)
    assert df.count() >= 0  # executes without error; values gated by oracle_check


def test_sweep_order_fronts_unswept_keys():
    """The driver's correctness gate reads the first 50 registry keys.
    Pin the fold invariant, derived from the official CORRECTNESS
    files rather than a hand-kept list (round 3's hand count was off
    by 4): every never-officially-swept key must sit inside the top
    50, live-streaming keys sit at the block's tail (wedge isolation),
    and the order list names only real keys (the reorder itself raises
    otherwise)."""
    import glob
    import json
    import os

    from lakehouse_automation_spark.queries import (
        REGISTRY, _NEXT_SWEEP_QUEUE, _SWEEP_ORDER)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    keys = list(REGISTRY)
    assert keys[: len(_SWEEP_ORDER)] == _SWEEP_ORDER
    covered = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        covered |= set(json.load(open(f)))
    never_swept = set(keys) - covered
    # a never-swept key must be in the current fold OR explicitly
    # declared as the next round's queue front — never invisible
    declared = set(keys[:50]) | set(_NEXT_SWEEP_QUEUE)
    assert never_swept <= declared, (
        "never-swept keys neither in the fold nor in "
        "_NEXT_SWEEP_QUEUE: "
        f"{sorted(never_swept - declared)}"
    )
    assert set(_NEXT_SWEEP_QUEUE) <= set(keys)
    # rotation hygiene: the queue fronts the NEXT fold, so it must be
    # disjoint from the current fold (a key can't be swept twice in
    # one round)
    assert set(_NEXT_SWEEP_QUEUE) & set(keys[:50]) == set(), (
        "current-fold keys still in _NEXT_SWEEP_QUEUE: "
        f"{sorted(set(_NEXT_SWEEP_QUEUE) & set(keys[:50]))}"
    )
    # With the never-swept backlog drained into the r8 fold, the
    # queue's job is freshness: every officially-green key in it must
    # belong to the STALEST cohort (latest official green == the
    # global minimum over covered keys outside the current fold), and
    # that cohort must be queued completely — recomputed from the
    # CORRECTNESS files so the rotation cannot silently drop a stale
    # key (VERDICT r7 ask #5).
    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        import re
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    outside = [k for k in keys[50:] if k in latest]
    if outside:
        stalest_round = min(latest[k] for k in outside)
        stalest = {k for k in outside if latest[k] == stalest_round}
        queued_green = {k for k in _NEXT_SWEEP_QUEUE if k in latest}
        assert queued_green <= stalest, (
            "queued officially-green keys fresher than the stalest "
            f"cohort (r{stalest_round}): {sorted(queued_green - stalest)}"
        )
        assert stalest <= set(_NEXT_SWEEP_QUEUE), (
            f"r{stalest_round}-stale keys missing from "
            f"_NEXT_SWEEP_QUEUE: {sorted(stalest - set(_NEXT_SWEEP_QUEUE))}"
        )
    # wedge isolation: any live-stream key INSIDE the fold must close
    # the block (a hung stream must not starve batch results). A fold
    # with no live keys — e.g. round 5's all-batch re-confirm rotation —
    # satisfies this vacuously.
    live = {"tf_stream_ingest", "lifecycle_daemon", "stream_custom_state",
            "stream_stream_join"}
    live_in_fold = [k for k in keys[:50] if k in live]
    assert live_in_fold == [k for k in keys[50 - len(live_in_fold):50]
                            if k in live], \
        "live-stream keys inside the fold must close the block"


def test_events_ts_dtype_pinned(spark, sf_dir):
    """events.ts must land as us-precision timestamp_ntz whatever the
    runtime does with parquet TIMESTAMP(NANOS). pyspark 4.1.2 ignores
    the legacy nanosAsLong conf and reads it natively; older Sparks
    surface a ns-long that catalog.table() converts. If a Spark bump
    changes the surfaced dtype again, this fails loudly instead of
    letting timestamp semantics drift."""
    from lakehouse_automation_spark.engine.catalog import table

    ev = table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz", ev.dtypes
    # and the values are sane epoch-era timestamps, not 1970 + ns
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert row.lo.year >= 2000 and row.hi.year < 2100, row


def test_every_key_has_a_recorded_baseline():
    """Evidence-chain guard: every registry key must carry a quiet-host
    sf0.1 baseline in bench/BASELINE_results.json — a key landing
    without one would make the next round's bench comparison silently
    partial. (30x probes are per-wave policy, not asserted here:
    SF3_probe.json intentionally covers the headline + new-key set,
    not procedural/streaming keys whose cost is setup-bound.)"""
    import json
    import os

    from lakehouse_automation_spark.queries import REGISTRY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench", "BASELINE_results.json")) as f:
        base = json.load(f)
    missing = [k for k in REGISTRY if k not in base]
    assert not missing, f"keys without a recorded baseline: {missing}"
    stale = [k for k, v in base.items()
             if k in REGISTRY and not (isinstance(v.get("sec"), float)
                                       and v["sec"] > 0)]
    assert not stale, f"baseline entries without a timing: {stale}"
