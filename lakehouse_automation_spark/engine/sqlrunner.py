"""SQL execution surface (reference A9-A13).

The reference's ``lib/commondb.py`` exposes four passthroughs into
MySQL/HeatWave: SQL->pandas (:81-89), DDL (:91-98), multi-statement
(:100-108), and stored-procedure calls (:110-124), plus a SQLite
executor with a 10-attempt retry loop (:14-36). Spark-native
equivalents:

- ``sql_to_pandas``: ``spark.sql(...).toPandas()`` (Arrow-accelerated)
  behind a mandatory limit guard — never collect unbounded results to
  the driver at 100 TB.
- ``ddl`` / ``multi``: ``spark.sql`` per statement (Spark has no
  multi-statement string API; we split respecting quotes).
- ``call_proc``: procedures become registered Python functions driving
  Spark; output rows are concatenated like the reference's
  ``'\\n'.join`` (commondb.py:118-121).
- ``execute_with_retry``: Spark task retries already cover executor
  faults; this driver-side loop covers transient analysis/FS races,
  capped at the reference's 10 attempts.
"""

from __future__ import annotations

import time
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .timing import timed

MAX_PANDAS_ROWS = 1_000_000  # hard stop for driver-side materialization

# ------------------------------------------------------------- procedures

PROCEDURES: dict[str, Callable[..., DataFrame]] = {}


def procedure(name: str):
    """Register a named procedure (the sys.heatwave_load extension
    point, check_lakehouse.py:149-150, as plain Python-over-Spark)."""
    def wrap(fn):
        PROCEDURES[name] = fn
        return fn
    return wrap


class SQLRunner:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    # A10 — SQL -> pandas with elapsed seconds
    def sql_to_pandas(self, sql: str, limit: int = MAX_PANDAS_ROWS) -> tuple[pd.DataFrame, float]:
        df = self.spark.sql(sql).limit(limit)
        return timed(df.toPandas)

    # A11 — DDL, elapsed seconds only
    def ddl(self, sql: str) -> float:
        _, secs = timed(self.spark.sql, sql)
        return secs

    # A12 — multi-statement script; returns the last statement's DataFrame
    def multi(self, script: str) -> DataFrame | None:
        last: DataFrame | None = None
        for stmt in split_statements(script):
            last = self.spark.sql(stmt)
        return last

    # A13 — stored procedure: run + concat result rows into one string.
    # Same driver-materialization cap as sql_to_pandas: proc output is
    # joined into a single Python string, so an unbounded collect here
    # would OOM the driver just as surely as an unbounded toPandas.
    def call_proc(
        self, name: str, *args, limit: int = MAX_PANDAS_ROWS, **kwargs
    ) -> tuple[str, DataFrame, float]:
        fn = PROCEDURES[name]
        t0 = time.perf_counter()
        df = fn(self.spark, *args, **kwargs)
        rows = df.limit(limit).collect()
        secs = round(time.perf_counter() - t0, 1)
        out = "\n".join(",".join(str(v) for v in row) for row in rows)
        return out, df, secs

    # A9 — retrying executor (<=10 attempts, commondb.py:12)
    def execute_with_retry(self, sql: str, retries: int = 10, backoff_s: float = 0.2) -> DataFrame:
        err: Exception | None = None
        for attempt in range(retries):
            try:
                return self.spark.sql(sql)
            except Exception as e:  # noqa: BLE001
                err = e
                time.sleep(backoff_s * (attempt + 1))
        raise RuntimeError(f"statement failed after {retries} attempts") from err


def split_statements(script: str) -> list[str]:
    """Split a multi-statement script on ';' outside quotes."""
    out, buf, quote = [], [], None
    for ch in script:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


# Built-in procedures ------------------------------------------------------


@procedure("event_type_summary")
def _event_type_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo procedure: per-type event counts (deterministically ordered,
    since proc output is row-concatenated into a string)."""
    from pyspark.sql import functions as F

    from .catalog import table

    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )
