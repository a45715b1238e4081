#!/usr/bin/env python
"""Extreme-timestamp robustness probe: the oracle gate on replicas
with EDGE datetimes deterministically injected into ``events.ts``.

Production event feeds carry epoch-zero sentinels (unset fields
serialized as 0), pre-1970 negatives (backfills, migrated legacy
data), century-scale typos (1924 for 2024), and far-future
placeholders (9999-12-31). The clean corpus is a tidy 2024 window, so
every day-bucketing, windowing, and sessionizing path is untested on
exactly the values where engines disagree — the known landmine being
integer division of negative epochs: Spark's ``div`` truncates toward
zero while DuckDB's ``//`` floors, so ``epoch_us div DAY`` puts
1969-12-31 23:00 on day 0 in one engine and day -1 in the other.

Injection: ~EDGE_RATE of events.ts rows, cycling through EDGES by row
position, deterministic per run — same replica every time.

  python tools/timeedge_check.py [--json FILE] [key ...]
      # default keys: every registry key reading events.ts
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import subprocess
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.oracle_check import TABLES  # noqa: E402

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

EDGE_RATE = 0.02

# Scope note: the comparison harness round-trips results through
# pandas (toPandas / duckdb .df()), whose timestamps are ns-backed —
# representable range 1677-09-21 .. 2262-04-11. Year-9999/0001
# sentinels cannot TRANSIT the comparator on either side (ArrowInvalid
# before any engine semantics are reached), so the probe's edges stay
# inside the ns window; that window still contains every
# divergence-prone case (negative epochs = floor-vs-truncate division,
# epoch zero, leap days, the 32-bit rollover, both ns extremes).
EDGES = (
    dt.datetime(1970, 1, 1, 0, 0, 0),              # epoch-zero sentinel
    dt.datetime(1969, 12, 31, 23, 59, 59, 999999),  # -1 us: floor-vs-trunc
    dt.datetime(1969, 6, 15, 12, 0, 0),            # deep negative epoch
    dt.datetime(1924, 2, 29, 23, 59, 59),          # century typo + leap day
    dt.datetime(2000, 2, 29, 0, 0, 0),             # century leap day
    dt.datetime(2038, 1, 19, 3, 14, 8),            # 32-bit rollover
    dt.datetime(2262, 4, 10, 0, 0, 0),             # ns-range max (pandas)
    dt.datetime(1677, 9, 22, 0, 0, 1),             # ns-range min (pandas)
)

# default probe scope: every key whose query reads events.ts
TS_FAMILIES = ("sessionize_", "event_", "ts_", "stream_", "win_pattern",
               "retention_cohort", "rfm_segments", "join_asof",
               "join_dpp_partition_pruned", "sink_partitioned",
               "sink_dynamic_overwrite", "join_interval_bucketed",
               "agg_sketch_rollup", "agg_sketch_setops")


def probe_keys() -> list[str]:
    from lakehouse_automation_spark.queries import REGISTRY

    return [k for k in REGISTRY if k.startswith(TS_FAMILIES)]


def build_timeedge_replica(src: str, dst: str) -> int:
    """Copy each table, replacing ~EDGE_RATE of events.ts with the
    EDGES cycle; every other table/column passes through unchanged."""
    import zlib

    injected = 0
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        if t == "events" and tbl.num_rows:
            seed = zlib.crc32(b"timeedge/events/ts")
            rng = np.random.Generator(np.random.PCG64(seed))
            pos = np.nonzero(rng.random(tbl.num_rows) < EDGE_RATE)[0]
            col = tbl.column("ts").combine_chunks()
            vals = col.to_pylist()
            for i, p in enumerate(pos):
                vals[p] = EDGES[i % len(EDGES)]
            arr = pa.array(vals, type=col.type)
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"), tbl.schema.field("ts"),
                arr)
            injected = len(pos)
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
    return injected


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    keys = args.keys or probe_keys()

    with tempfile.TemporaryDirectory(prefix="timeedge-") as dst:
        n = build_timeedge_replica(SRC_SF_DIR, dst)
        print(f"time-edge replica: {n} events.ts cells mutated")
        cmd = [sys.executable, os.path.join(REPO, "tools", "oracle_check.py")]
        if args.json_out:
            cmd += ["--json", args.json_out]
        cmd += keys
        return subprocess.call(
            cmd, env=dict(os.environ, SPARK_GRAFT_SF_DIR=dst), cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
