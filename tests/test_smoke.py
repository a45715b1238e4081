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
    Pin the fold: every key officially covered in rounds 1-2 stays out
    of the top 50 this round, live-streaming keys sit at the block's
    tail (wedge isolation), and the order list names only real keys
    (the reorder itself raises otherwise)."""
    import json
    import os

    from lakehouse_automation_spark.queries import REGISTRY, _SWEEP_ORDER

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    keys = list(REGISTRY)
    assert keys[:50] == _SWEEP_ORDER[:50]
    covered = set()
    for f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        try:
            covered |= set(json.load(open(os.path.join(repo, f))))
        except FileNotFoundError:
            pass
    assert not (set(keys[:50]) & covered), "top-50 slot wasted on a covered key"
    live = {"incremental_load", "stream_file_ingest"}
    assert live <= set(keys[42:50]), "live-stream keys must close the block"
