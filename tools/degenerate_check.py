#!/usr/bin/env python
"""Degenerate-input robustness sweep: every registry key against
EMPTY (0-row, schema-preserving) replicas of the testdata tables.

At production scale empty inputs are routine, not exceptional — a
predicate-pushdown filter, a partition-pruned scan, or a quiet
ingestion window hands every downstream operator zero rows — so the
robustness contract is: every key RUNS on 0-row tables and returns a
DataFrame (almost always 0 rows; constant-output keys like gen_rows
may legitimately return rows). A key that raises on empty input would
take down a 1000-executor pipeline stage the first time a day's
partition is empty.

  python tools/degenerate_check.py [--json FILE] [key ...]

Builds the empty replicas in a temp dir from $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.001 — only schemas are read, so the
smallest sf is the right source), then runs each key's Spark callable
with cache release between keys, mirroring the driver harness.
--json records {key: {status, rows|error}} for the machine-readable
robustness trail (tests/test_smoke.py does NOT enforce this; it is
evidence, like bench/ORACLE_local_*.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from tools.oracle_check import TABLES  # noqa: E402 — one table list, three tools


def build_empty_replica(src_dir: str, dst: str) -> None:
    """0-row parquet per table, byte-level schema preserved (footer
    schema only is read — logical types kept exactly, incl. events'
    ns timestamps — so even an sf10 source costs zero data I/O)."""
    import pyarrow.parquet as pq

    for t in TABLES:
        schema = pq.read_schema(os.path.join(src_dir, f"{t}.parquet"))
        pq.write_table(schema.empty_table(),
                       os.path.join(dst, f"{t}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from lakehouse_automation_spark.engine.session import get_spark
    from lakehouse_automation_spark.operators.cache import release_persisted
    import lakehouse_automation_spark.queries as Q

    keys = args.keys or list(Q.REGISTRY)
    unknown = [k for k in keys if k not in Q.REGISTRY]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark()
    record: dict[str, dict] = {}
    fails = 0
    with tempfile.TemporaryDirectory(prefix="emptysf-") as sf_dir:
        build_empty_replica(SRC_SF_DIR, sf_dir)
        for k in keys:
            try:
                n = Q.REGISTRY[k].fn(spark, sf_dir).count()
                record[k] = {"status": "ok", "rows": n}
                print(f"{k:32s} OK rows={n}", flush=True)
            except Exception as e:  # noqa: BLE001 — recording, not handling
                fails += 1
                msg = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
                record[k] = {"status": "fail", "error": msg}
                print(f"{k:32s} FAIL {msg}", flush=True)
            finally:
                try:
                    release_persisted()
                except Exception:  # noqa: BLE001 — sweep must continue
                    pass
    print(f"\n{len(keys)} keys, {fails} failures")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
