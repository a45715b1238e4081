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

Injection: ~EDGE_RATE of the target column's rows, cycling through
EDGES by row position, deterministic per run — same replica every
time. Two surfaces (VERDICT r10 ask #1 extended the gate beyond the
event stream):

- ``events``     -> events.ts (the r10 tier)
- ``relational`` -> lineitem.l_shipdate + orders.o_orderdate — the
  DATE/TIMESTAMP surface where calendar math is densest (flagship
  filter, partitioned sinks, DPP, monthly growth); probed keys are
  discovered by scanning each registry entry's source + oracle for
  the column names.

  python tools/timeedge_check.py [--surface events|relational|all]
                                 [--json FILE] [key ...]
      # default keys: every registry key reading the surface's columns
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

# Range note: the comparator projects every DATE/TIMESTAMP result
# column to a canonical string BEFORE pandas materialization
# (tools/oracle_check.py spark_temporal_safe / duck_temporal_safe —
# r11, closing VERDICT r10 ask #6), so the full representable range
# 0001-01-01 .. 9999-12-31 transits the harness; the old pandas
# ns-window bound (1677–2262) no longer applies to RESULT columns.
# The ns-range ends stay in the edge set anyway — they are exactly
# where a pandas-materializing USER pipeline would break.
EDGES = (
    dt.datetime(1970, 1, 1, 0, 0, 0),              # epoch-zero sentinel
    dt.datetime(1969, 12, 31, 23, 59, 59, 999999),  # -1 us: floor-vs-trunc
    dt.datetime(1969, 6, 15, 12, 0, 0),            # deep negative epoch
    dt.datetime(1924, 2, 29, 23, 59, 59),          # century typo + leap day
    dt.datetime(2000, 2, 29, 0, 0, 0),             # century leap day
    dt.datetime(2038, 1, 19, 3, 14, 8),            # 32-bit rollover
    dt.datetime(2262, 4, 10, 0, 0, 0),             # ns-range max (pandas)
    dt.datetime(1677, 9, 22, 0, 0, 1),             # ns-range min (pandas)
    dt.datetime(9999, 12, 31, 23, 59, 59, 999999),  # far-future placeholder
    dt.datetime(1, 1, 1, 0, 0, 0),                 # min representable ts
)

#: surface name -> (table, column) injection targets
SURFACES = {
    "events": (("events", "ts"),),
    "relational": (("lineitem", "l_shipdate"), ("orders", "o_orderdate")),
}

# events probe scope: every key whose query reads events.ts
TS_FAMILIES = ("sessionize_", "event_", "ts_", "stream_", "win_pattern",
               "retention_cohort", "rfm_segments", "join_asof",
               "join_dpp_partition_pruned", "sink_partitioned",
               "sink_dynamic_overwrite", "join_interval_bucketed",
               "agg_sketch_rollup", "agg_sketch_setops")


def probe_keys() -> list[str]:
    from lakehouse_automation_spark.queries import REGISTRY

    return [k for k in REGISTRY if k.startswith(TS_FAMILIES)]


def relational_probe_keys() -> list[str]:
    """Every registry key whose implementation OR oracle mentions one
    of the relational surface's date columns — discovered by source
    scan so the scope tracks the registry instead of a hand-list."""
    import inspect

    from lakehouse_automation_spark.queries import REGISTRY

    cols = tuple(c for _, c in SURFACES["relational"])
    out = []
    for k, q in REGISTRY.items():
        text = (q.oracle or "") + inspect.getsource(q.fn)
        if any(c in text for c in cols):
            out.append(k)
    return out


def surface_keys(surface: str) -> list[str]:
    if surface == "events":
        return probe_keys()
    if surface == "relational":
        return relational_probe_keys()
    seen = dict.fromkeys(probe_keys() + relational_probe_keys())
    return list(seen)


def build_timeedge_replica(src: str, dst: str,
                           targets=SURFACES["events"]) -> int:
    """Copy each table, replacing ~EDGE_RATE of every targeted
    (table, column) with the EDGES cycle; everything else passes
    through unchanged."""
    import zlib

    per_table: dict[str, list[str]] = {}
    for tname, cname in targets:
        per_table.setdefault(tname, []).append(cname)
    injected = 0
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        for cname in per_table.get(t, ()):
            if not tbl.num_rows:
                continue
            seed = zlib.crc32(f"timeedge/{t}/{cname}".encode())
            rng = np.random.Generator(np.random.PCG64(seed))
            pos = np.nonzero(rng.random(tbl.num_rows) < EDGE_RATE)[0]
            col = tbl.column(cname).combine_chunks()
            vals = col.to_pylist()
            for i, p in enumerate(pos):
                vals[p] = EDGES[i % len(EDGES)]
            arr = pa.array(vals, type=col.type)
            tbl = tbl.set_column(
                tbl.schema.get_field_index(cname), tbl.schema.field(cname),
                arr)
            injected += len(pos)
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
    return injected


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("--surface", choices=(*SURFACES, "all"),
                    default="events")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    keys = args.keys or surface_keys(args.surface)
    targets = (tuple(c for s in SURFACES.values() for c in s)
               if args.surface == "all" else SURFACES[args.surface])

    with tempfile.TemporaryDirectory(prefix="timeedge-") as dst:
        n = build_timeedge_replica(SRC_SF_DIR, dst, targets)
        cells = ", ".join(f"{t}.{c}" for t, c in targets)
        print(f"time-edge replica: {n} cells mutated across {cells}")
        cmd = [sys.executable, os.path.join(REPO, "tools", "oracle_check.py")]
        if args.json_out:
            cmd += ["--json", args.json_out]
        cmd += keys
        return subprocess.call(
            cmd, env=dict(os.environ, SPARK_GRAFT_SF_DIR=dst), cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
