#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every key in lakehouse_automation_spark.queries.REGISTRY at
sf0.01: the Spark callable and (when present) the DuckDB oracle SQL,
then compares row count, column names, and an order-insensitive value
hash. Use while iterating so the per-round CORRECTNESS file has no
surprises.

  python tools/oracle_check.py [--json FILE] [key ...]  # default: all keys

--json additionally records {key: {status, detail}} to FILE — the
machine-readable local-green trail for keys outside the driver's
50-slot official fold (tools/sweep_plan.py reads round coverage from
the OFFICIAL files only; this record never substitutes for them).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

# Run as `python tools/oracle_check.py` from anywhere: put the repo
# root (not tools/) on sys.path so the package imports resolve.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Env-overridable so robustness sweeps (tools/null_check.py) can point
# the whole gate — Spark side AND DuckDB views — at a replica dir.
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            if math.isinf(v):
                # IEEE non-finites are representable values, not
                # errors: both engines pass them through filters/
                # sorts/projections, and int(v) above would raise
                return "inf" if v > 0 else "-inf"
            if v == int(v) and abs(v) < 1e15:
                # int format, not '%.6f': a null-bearing int64 column
                # round-trips pandas as float64, so the SAME value can
                # arrive int-typed on one side and float-typed on the
                # other — collapse the dtype artifact, keep the value
                return str(int(v))
            # 12 significant digits: catches real accumulation drift
            # (>=1e-11 relative) while absorbing last-ulp libm noise
            return f"{v:.12g}"
        if isinstance(v, pd.Timestamp):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        if hasattr(v, "item"):  # numpy scalars
            return canon(v.item())
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(canon)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


#: Canonical temporal spelling, identical in Spark's date_format and
#: DuckDB's strftime for every representable year (verified 0001 and
#: 9999 inclusive): 4-digit zero-padded year, 6-digit microseconds.
#: Matches canon()'s old strftime of an in-range pd.Timestamp exactly,
#: so value hashes are unchanged for data inside the pandas ns range.
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def spark_temporal_safe(df):
    """Project DATE/TIMESTAMP columns to canonical strings BEFORE
    toPandas: pandas ns-timestamps span only 1677–2262, so year-9999 /
    0001 sentinels (the far-future/far-past placeholder class) would
    overflow the COMPARATOR itself even when both engines agree
    (VERDICT r10 ask #6). DATE formats with the full midnight time
    part — the same string the old pandas path produced for dates —
    so a Spark DATE still hashes equal to an oracle TIMESTAMP midnight
    and vice versa."""
    from pyspark.sql import functions as F, types as T

    sel, changed = [], False
    for f in df.schema.fields:
        if isinstance(f.dataType,
                      (T.TimestampType, T.TimestampNTZType, T.DateType)):
            # strip a leading '+': a year past 9999 (date arithmetic
            # overflow on a far-future placeholder) is spelled
            # ISO-8601-expanded by Spark ('+10000-…') but plain by
            # DuckDB's strftime — same value, different sign prefix
            sel.append(F.regexp_replace(
                F.date_format(F.col(f.name), _TS_FMT_SPARK),
                r"^\+", "").alias(f.name))
            changed = True
        else:
            sel.append(F.col(f.name))
    return df.select(sel) if changed else df


def duck_temporal_safe(rel):
    """DuckDB side of the same projection (its .df() materializes
    TIMESTAMP as datetime64[ns] too, with the same 1677–2262 bound)."""
    cols, changed = [], False
    for name, typ in zip(rel.columns, rel.types):
        q = '"' + name.replace('"', '""') + '"'
        t = str(typ).upper()
        if t.startswith("TIMESTAMP") or t == "DATE":
            cols.append(f"strftime({q}, '{_TS_FMT_DUCK}') AS {q}")
            changed = True
        else:
            cols.append(q)
    return rel.project(", ".join(cols)) if changed else rel


def compare(key: str, spark_df, oracle: str | None, con) -> str:
    spdf = spark_temporal_safe(spark_df).toPandas()
    if oracle is None:
        return f"ROWS_ONLY rows={len(spdf)}"
    odf = duck_temporal_safe(con.sql(oracle)).df()
    a, b = normalize(spdf), normalize(odf)
    if list(a.columns) != list(b.columns):
        return f"COLS_MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT_MISMATCH spark={len(a)} oracle={len(b)}"
    neq = (a != b)
    if neq.any().any():
        bad_cols = [c for c in a.columns if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        return (
            f"VALUE_MISMATCH cols={bad_cols} example_row={i} "
            f"spark={a.loc[i, bad_cols].to_dict()} oracle={b.loc[i, bad_cols].to_dict()}"
        )
    return f"OK rows={len(a)}"


def main() -> int:
    from lakehouse_automation_spark.engine import get_spark, load_tables
    from lakehouse_automation_spark.queries import REGISTRY

    spark = get_spark("oracle_check")
    load_tables(spark, SF_DIR)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # registration order — the same order the driver's sweep uses, so a
    # key that wedges shows up at the same position it would there
    from lakehouse_automation_spark.operators.cache import release_persisted

    args = sys.argv[1:]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        args = args[:i] + args[i + 2:]
    keys = args or list(REGISTRY)
    unknown = [k for k in keys if k not in REGISTRY]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2
    record: dict[str, dict] = {}
    failures = 0
    for key in keys:
        q = REGISTRY[key]
        try:
            res = compare(key, q.fn(spark, SF_DIR), q.oracle, con)
        except Exception as e:  # noqa: BLE001
            # `or [""]`: an empty exception message has no lines and
            # would crash the SWEEP instead of failing the KEY
            first = (str(e).splitlines() or [""])[0]
            res = f"ERROR {type(e).__name__}: {first[:300]}"
        release_persisted()  # no cache accumulation across the sweep
        status = res.split(" ")[0]
        if status not in ("OK", "ROWS_ONLY"):
            failures += 1
        record[key] = {"status": status, "detail": res}
        print(f"{key:28s} {res}")
    print(f"\n{len(keys)} keys, {failures} failures")
    if out_json:
        import json as _json
        with open(out_json, "w") as fh:
            _json.dump(record, fh, indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
