"""Scratch-layout isolation (r16, VERDICT r15 ask #4).

Every FIXED-NAME scratch path (sink round-trips, bulk-load dest, the
managed-table warehouse) roots at ``engine.session.scratch_base()``:
PID-keyed by default, ``$SPARK_GRAFT_SCRATCH``-overridable. Two
concurrent gate batteries therefore get disjoint overwrite targets —
the failure class the r15 battery hit twice (process A's
``mode("overwrite")`` deleting process B's ``_temporary`` mid-write)
cannot recur. The live two-process A/B is recorded in SCALE.md; these
pins keep the layout invariants from regressing.
"""

from __future__ import annotations

import os

from lakehouse_automation_spark.engine.session import scratch_base


def test_scratch_base_is_pid_keyed():
    prev = os.environ.pop("SPARK_GRAFT_SCRATCH", None)
    try:
        base = scratch_base()
        assert str(os.getpid()) in os.path.basename(base), base
        # stable within a process: keyed persists / re-reads must see
        # the same path on every call
        assert scratch_base() == base
    finally:
        if prev is not None:
            os.environ["SPARK_GRAFT_SCRATCH"] = prev


def test_scratch_env_override_wins_and_is_lazy():
    """$SPARK_GRAFT_SCRATCH set AFTER import must still take effect:
    _scratch resolves lazily, never through a module-load constant."""
    from lakehouse_automation_spark.queries.sinks import _scratch

    prev = os.environ.get("SPARK_GRAFT_SCRATCH")
    os.environ["SPARK_GRAFT_SCRATCH"] = "/tmp/las_test_override"
    try:
        assert scratch_base() == "/tmp/las_test_override"
        p = _scratch("/root/testdata/sf0.001", "nation_csv")
        assert p.startswith("/tmp/las_test_override/sinks/sf0.001"), p
    finally:
        if prev is None:
            del os.environ["SPARK_GRAFT_SCRATCH"]
        else:
            os.environ["SPARK_GRAFT_SCRATCH"] = prev


def test_warehouse_dir_under_scratch(spark):
    """Managed tables (bucketed join copies, ANALYZE stats copies) must
    land under the process-keyed scratch, not a shared cwd
    spark-warehouse two processes would fight over."""
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert wh.startswith(scratch_base()), (wh, scratch_base())
