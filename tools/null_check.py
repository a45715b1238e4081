#!/usr/bin/env python
"""Null-injection robustness sweep: the full Spark-vs-DuckDB oracle
gate on replicas with NULLs deterministically injected into value
columns.

Production tables carry NULLs the synthetic testdata never does; a
query that agrees with its oracle only on fully-populated columns is
untested on the case that actually diverges between engines (NULL
propagation in expressions, aggregates skipping NULLs, NULL group
keys). This sweep builds a replica of a testdata sf dir with ~NULL_RATE
of each VALUE column nulled — both engines read the SAME replica, so
any mismatch is a genuine engine-divergence or a driver-side non-null
assumption (the same bug class the 0-row sweep caught, one notch less
degenerate).

What gets nulled: scalar measure/attribute columns (names, prices,
quantities, flags, text, props, labels). What does NOT:
  - join/id keys, timestamps, dates: window/sort ORDER BY columns
    where Spark (ASC=NULLS FIRST) and DuckDB (ASC=NULLS LAST) have
    DIFFERENT defaults — nulling those tests engine defaults, not our
    queries; production pipelines key on non-null ids/event-times.
  - the embedding list column: element-level NULL semantics in
    list<float> dot products is a separate tier (vec queries document
    non-null vectors as an ingest contract).

Injection is deterministic: a numpy PCG64 stream seeded from
(table, column) — same replica every run, no wall-clock anywhere.

  python tools/null_check.py [--json FILE] [--sf-dir DIR] [key ...]

Runs tools/oracle_check.py as a subprocess with SPARK_GRAFT_SF_DIR
pointed at the replica (fresh JVM, same gate code path). --json is
forwarded. Exit status is the gate's.
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

from tools.oracle_check import TABLES  # noqa: E402 — one table list, three tools

NULL_RATE = 0.03

# table -> columns to inject NULLs into (value columns only; see
# module docstring for what is deliberately excluded and why)
NULLABLE: dict[str, tuple[str, ...]] = {
    "region": ("r_name",),
    "nation": ("n_name",),
    "customer": ("c_name", "c_acctbal", "c_mktsegment"),
    "supplier": ("s_name", "s_acctbal"),
    "part": ("p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders": ("o_orderstatus", "o_totalprice", "o_orderpriority"),
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus"),
    "events": ("event_type", "value", "props"),
    "documents": ("text", "lang", "source", "n_chars"),
    # tier 2: whole-vector NULLs too — the vector family's ingest
    # contract (with_vnorm filters NULL embeddings at the funnel) is
    # ENFORCED in code, so the sweep exercises it instead of trusting it
    "embeddings": ("label", "embedding"),
}

# Keys whose CORRECT response to null-injected input is a raised
# enforcement error, not a result: tf_constraints declares
# `o_orderstatus IS NOT NULL` as a CHECK constraint, so the
# null-injected batch MUST be refused — that is the feature under
# test working, and the sweep reclassifies exactly that error. Any
# other exception still fails the key.
EXPECTED_ENFORCEMENT = {
    "tf_constraints": "ConstraintViolationError",
}


def _mask(table: str, col: str, n: int) -> np.ndarray:
    """Deterministic per-(table, column) null positions."""
    # crc32 of the name, not hash(): hash() is salted per-process and
    # the replica must be identical across runs and machines
    import zlib

    seed = zlib.crc32(f"{table}/{col}".encode())
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.random(n) < NULL_RATE


def build_null_replica(src: str, dst: str) -> dict[str, int]:
    """Copy each table, nulling ~NULL_RATE of each NULLABLE column.
    Arrow-level rewrite preserves logical types exactly; untouched
    columns (keys, timestamps) pass through byte-identical."""
    injected: dict[str, int] = {}
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        n = tbl.num_rows
        cols = []
        for field in tbl.schema:
            arr = tbl.column(field.name).combine_chunks()
            if field.name in NULLABLE.get(t, ()) and n:
                m = _mask(t, field.name, n)
                if m.any():
                    pa_mask = pa.array(m)
                    # keep original values where mask is False
                    arr = pc.if_else(
                        pa_mask, pa.nulls(n, type=field.type), arr)
                    injected[f"{t}.{field.name}"] = int(m.sum())
            cols.append(arr)
        out = pa.table(cols, schema=pa.schema(
            [pa.field(f.name, f.type, nullable=True) for f in tbl.schema]))
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
    return injected


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import json

    with tempfile.TemporaryDirectory(prefix="nullsf-") as dst:
        injected = build_null_replica(args.sf_dir, dst)
        total = sum(injected.values())
        print(f"replica {dst}: {total} NULLs over "
              f"{len(injected)} columns (rate {NULL_RATE})", flush=True)
        rec_path = args.json_out or os.path.join(dst, "record.json")
        cmd = [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
               "--json", rec_path] + args.keys
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=dst)
        rc = subprocess.call(cmd, env=env, cwd=REPO)
        if not os.path.exists(rec_path):
            # the gate died before recording anything (unknown key,
            # import error, ...) — surface ITS failure, not a traceback
            print(f"oracle_check wrote no record (exit {rc}); "
                  "see its output above", file=sys.stderr)
            return rc or 1

        # reclassify documented enforcement outcomes, then re-judge
        with open(rec_path) as fh:
            record = json.load(fh)
        PASS = ("OK", "ROWS_ONLY")  # the gate's own pass statuses
        for key, exc in EXPECTED_ENFORCEMENT.items():
            entry = record.get(key)
            if entry and entry["status"] not in PASS and exc in entry["detail"]:
                entry["status"] = "OK"
                entry["detail"] = (
                    f"ENFORCED {exc} on null-violating batch (by design)")
                print(f"reclassified {key}: constraint enforcement "
                      f"is the expected null-input outcome", flush=True)
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump(record, fh, indent=1, sort_keys=True)
        fails = [k for k, v in record.items() if v["status"] not in PASS]
        print(f"null sweep: {len(record)} keys, {len(fails)} failures"
              + (f": {fails}" if fails else ""))
        return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
