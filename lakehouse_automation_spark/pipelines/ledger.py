"""Load-attempt audit ledger (reference A7/A8).

The reference keeps a SQLite table ``check_files(mountloc, is_apply,
checktime)`` with one row per load attempt (check_lakehouse.py:99-100)
written through a 10-retry executor (commondb.py:14-36). Here the
ledger is an append-only parquet table: atomic per-append (each append
is a new file), readable as a DataFrame, and the Structured Streaming
checkpoint — not the ledger — is what guarantees exactly-once, so the
ledger is pure audit just like the reference's.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class Ledger:
    SCHEMA = "mountloc string, is_apply int, checktime timestamp"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def record(self, mountloc: str, success: bool,
               when: dt.datetime | None = None) -> None:
        """A7 — one audit row per load attempt (is_apply 1/0 by
        success, check_lakehouse.py:115-119)."""
        row = [(mountloc, 1 if success else 0,
                when or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None))]
        self.spark.createDataFrame(row, self.SCHEMA).write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.schema(self.SCHEMA).parquet(self.path)

    def last_checks(self, k: int = 2) -> DataFrame:
        """A8 — most-recent-k lookup (ORDER BY checktime DESC LIMIT 2,
        check_lakehouse.py:99) -> TakeOrderedAndProject."""
        return self.read().orderBy(F.desc("checktime")).limit(k)

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )
