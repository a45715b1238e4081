#!/usr/bin/env python
"""Dump ``explain("formatted")`` for the given registry keys into
plans/<tag>/<key>_<suffix>.txt — the before/after evidence files the
optimization rounds commit (the judge checks plan claims against
these).

Checkpointed keys (whose returned plan is just `Scan ExistingRDD`)
publish their REAL pre-checkpoint plans through
operators/plancapture.py; with LAS_CAPTURE_PLANS=1 those captured
plans are appended to the dump.

  python tools/dump_plans.py --tag r17 --suffix after key [key ...]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# pin scratch so paths inside plans don't churn per process
os.environ.setdefault("SPARK_GRAFT_SCRATCH", "/tmp/las_scratch_plans")
os.environ["LAS_CAPTURE_PLANS"] = "1"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.operators import plancapture as PC
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.queries import REGISTRY

    outdir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    for key in args.keys:
        PC.clear_captured()
        df = REGISTRY[key].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        parts = [plan]
        for tag, captured in sorted(PC.captured_plans().items()):
            parts.append(f"\n===== captured: {tag} =====\n{captured}")
        path = os.path.join(outdir, f"{key}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(parts))
        print(f"wrote {path}", flush=True)
        release_persisted()
    return 0


if __name__ == "__main__":
    sys.exit(main())
