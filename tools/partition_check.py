#!/usr/bin/env python
"""Partition-invariance sweep: the full oracle gate under adversarial
parallelism.

On local[32] every query runs with 32 shuffle partitions, one input
split per testdata file, and AQE quietly coalescing small exchanges.
On a 1000-executor cluster NONE of those hold: shuffle degree is in
the thousands, each file fans out into many splits, and AQE re-plans
at runtime. A result that depends on any of them — LIMIT without
ORDER, ties broken by partition arrival order, first()/collect_list
ordering, a fold that assumes one partition — passes the quiet gate
and silently diverges at scale.

This sweep re-runs tools/oracle_check.py (the complete Spark-vs-DuckDB
comparison, every registry key) under profiles that distort the
execution geometry in opposite directions while reading the SAME
clean data, so the oracle answer is unchanged and any mismatch is a
partition-sensitivity bug by construction:

  fewtasks   AQE OFF, 5 shuffle partitions (prime, !=32) — exchanges
             no longer line up with core count; per-partition folds
             see many groups each.
  manysplits 64 KiB maxPartitionBytes + zero open cost + 61 shuffle
             partitions — every scan shatters into dozens of splits,
             modeling the 1000-executor read geometry.

  python tools/partition_check.py [--profile NAME] [key ...]

Records bench/PARTITIONSWEEP_r{N}.json via --json-out.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

PROFILES: dict[str, dict[str, str]] = {
    "fewtasks": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "5",
        "spark.default.parallelism": "5",
    },
    "manysplits": {
        "spark.sql.files.maxPartitionBytes": "65536",
        "spark.sql.files.openCostInBytes": "0",
        "spark.sql.shuffle.partitions": "61",
        "spark.default.parallelism": "61",
    },
}

PASS = ("OK", "ROWS_ONLY")


def run_profile(name: str, keys: list[str], rec_path: str) -> dict:
    confs = ";".join(f"{k}={v}" for k, v in PROFILES[name].items())
    cmd = [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
           "--json", rec_path] + keys
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SRC_SF_DIR,
               SPARK_GRAFT_EXTRA_CONFS=confs)
    rc = subprocess.call(cmd, env=env, cwd=REPO)
    if not os.path.exists(rec_path):
        raise SystemExit(f"oracle_check wrote no record (exit {rc}); "
                         "see its output above")
    with open(rec_path) as fh:
        return json.load(fh)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", choices=sorted(PROFILES),
                    help="run one profile only (default: all)")
    ap.add_argument("--json-out", help="write the merged record here")
    ap.add_argument("keys", nargs="*", help="default: every registry key")
    args = ap.parse_args()

    profiles = [args.profile] if args.profile else sorted(PROFILES)
    merged: dict[str, dict] = {}
    bad: list[str] = []
    import tempfile
    for prof in profiles:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            rec_path = tf.name
        try:
            record = run_profile(prof, args.keys, rec_path)
        finally:
            if os.path.exists(rec_path):
                os.unlink(rec_path)
        merged[prof] = record
        fails = [k for k, v in record.items() if v["status"] not in PASS]
        bad.extend(f"{prof}:{k}" for k in fails)
        print(f"[{prof}] {len(record)} keys, {len(fails)} failures"
              + (f": {fails}" if fails else ""))

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
    print(f"\npartition sweep: {len(profiles)} profiles, "
          f"{len(bad)} failures" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
