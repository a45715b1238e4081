#!/usr/bin/env python
"""Extreme-numerics robustness sweep: the full Spark-vs-DuckDB oracle
gate on replicas with IEEE-754 edge values deterministically injected
into DOUBLE value columns.

Production pipelines meet ±Inf (upstream division), NaN (bad parses
propagated through float channels), subnormals, negative zero, and
integers above 2^53 stored in doubles. The clean corpus carries none
of these, so every aggregate/window/cast path is untested on exactly
the values where engines disagree (cast saturation vs error, NaN
grouping and ordering, -0.0 canonicalization, decimal conversion of
non-finite values). Both engines read the SAME replica, so a mismatch
is a genuine divergence or a finite-value assumption in our code.

Scope: DOUBLE columns only. Integer extremes are deliberately OUT of
scope: int64 overflow is defined differently by design (Spark non-ANSI
wraps, ANSI and DuckDB raise), so "parity" there would test engine
configuration, not our queries; doubles saturate identically per
IEEE-754 in both engines, making parity a fair contract.

Injection: ~EXTREME_RATE of each column's rows, cycling through
EXTREMES by row position, deterministic per (table, column) — same
replica every run.

  python tools/extremes_check.py [--json FILE] [key ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.oracle_check import TABLES  # noqa: E402 — one table list, five tools

SRC_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

EXTREME_RATE = 0.02

EXTREMES = (
    float("inf"),
    float("-inf"),
    float("nan"),
    1e300,           # finite but astronomically large
    -1e300,
    1e-300,          # subnormal-adjacent tiny
    -0.0,            # sign-of-zero canonicalization
    9007199254740993.0,   # 2^53 + 1: above exact-integer range
)

# table -> DOUBLE value columns (the null sweep's column map, floats only)
FLOAT_COLS: dict[str, tuple[str, ...]] = {
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
    "orders": ("o_totalprice",),
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "events": ("value",),
}


def _positions(table: str, col: str, n: int) -> np.ndarray:
    import zlib

    seed = zlib.crc32(f"extremes/{table}/{col}".encode())
    rng = np.random.Generator(np.random.PCG64(seed))
    return np.nonzero(rng.random(n) < EXTREME_RATE)[0]


def build_extremes_replica(src: str, dst: str) -> dict[str, int]:
    """Copy each table, replacing ~EXTREME_RATE of each FLOAT_COLS
    column with the EXTREMES cycle. Arrow-level rewrite; untouched
    columns pass through byte-identical."""
    injected: dict[str, int] = {}
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        n = tbl.num_rows
        cols = []
        for field in tbl.schema:
            arr = tbl.column(field.name).combine_chunks()
            if field.name in FLOAT_COLS.get(t, ()) and n:
                pos = _positions(t, field.name, n)
                if len(pos):
                    # to_pylist, not to_numpy: numpy maps NULL -> NaN
                    # and the round trip would silently convert every
                    # pre-existing NULL into a NaN VALUE, changing the
                    # replica's COUNT/SUM semantics for rows this
                    # sweep never touched
                    vals = arr.to_pylist()
                    for i, p in enumerate(pos):
                        vals[p] = EXTREMES[i % len(EXTREMES)]
                    arr = pa.array(vals, type=field.type)
                    injected[f"{t}.{field.name}"] = len(pos)
            cols.append(arr)
        out = pa.table(cols, schema=tbl.schema)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
    return injected


# The GATED scope (round 10): the WHOLE registry except the explicit
# exclusion list below. Round 9 gated only the raw-feed families
# (stream_/udf_/udtf_/ts_/sessionize_/event_ + extras, 43 keys);
# round 10 promoted the same recipe — one abs(v) <= 1e15 domain
# predicate per money-cast site, NULL-fold, mirrored in the oracle —
# onto the batch money/percentile surface, so every key is now
# extremes-safe by construction and gated.
#
# Exclusions (probed, never gated — each with a reason, not a waiver):
#   tf_constraints — the key IS the ingest CHECK gate; on an
#     extremes-injected corpus its correct behavior is to REJECT the
#     batch (ConstraintViolationError), which this harness's
#     pass criterion (query returns oracle-matching rows) cannot
#     express. Its rejection path under extremes is pinned in
#     tests/test_extremes.py instead.
GATED_EXCLUDE = ("tf_constraints",)


def gated_keys() -> list[str]:
    from lakehouse_automation_spark.queries import REGISTRY

    return [k for k in REGISTRY if k not in GATED_EXCLUDE]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("--gated", action="store_true",
                    help="run the gated scope (whole registry minus "
                         "documented exclusions)")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    if args.gated:
        args.keys = gated_keys() + args.keys

    with tempfile.TemporaryDirectory(prefix="extremesf-") as dst:
        injected = build_extremes_replica(SRC_SF_DIR, dst)
        print(f"extremes replica: {sum(injected.values())} cells "
              f"across {len(injected)} columns")
        cmd = [sys.executable, os.path.join(REPO, "tools", "oracle_check.py")]
        if args.json_out:
            cmd += ["--json", args.json_out]
        cmd += args.keys
        return subprocess.call(
            cmd, env=dict(os.environ, SPARK_GRAFT_SF_DIR=dst), cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
