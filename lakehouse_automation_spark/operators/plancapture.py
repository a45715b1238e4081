"""Opt-in pre-checkpoint plan capture.

Several keys must ``localCheckpoint(eager=True)`` their result because
the scratch tables they read (an IVF index dir, a CowTable clone, a
dedup index) are deleted in the enclosing ``finally`` — so the plan a
reviewer sees via ``df.explain()`` afterwards is just
``Scan ExistingRDD``: the real search/loop-body/CDC plan is gone
(VERDICT r9 ask #7, the observability gap). This module is the seam
that publishes the REAL plan: query code wraps the pre-checkpoint
DataFrame in :func:`capture_plan`, which is a zero-cost identity
unless ``LAS_CAPTURE_PLANS=1`` — set only by ``tools/plan_report.py``
(which appends the captured plans to PLANS.md) and the plan-assert
tests (which grep them), never in bench or the driver gate.
"""

from __future__ import annotations

import os

#: label -> formatted plan string, for the CURRENT key run. Consumers
#: (plan_report, tests) clear between keys; labels are
#: "<key>:<stage>" by convention so a report can group them.
_CAPTURED: dict[str, str] = {}


def capture_enabled() -> bool:
    return os.environ.get("LAS_CAPTURE_PLANS") == "1"


def capture_plan(label: str, df):
    """Record ``df``'s formatted physical plan under ``label`` and
    return ``df`` unchanged. Identity (no JVM calls at all) unless
    LAS_CAPTURE_PLANS=1, so the production/bench path pays nothing."""
    if not capture_enabled():
        return df
    spark = df.sparkSession
    _CAPTURED[label] = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    return df


def captured_plans() -> dict[str, str]:
    return dict(_CAPTURED)


def clear_captured() -> None:
    _CAPTURED.clear()
