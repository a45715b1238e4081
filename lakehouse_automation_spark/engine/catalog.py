"""Table catalog over the driver-provided parquet testdata.

The reference's "catalog" is a MySQL schema bulk-loaded from a dump
(``/root/reference/lakehouse_setup.sh:250``) plus one external
lakehouse table refreshed from CSV files
(``/root/reference/check_lakehouse.py:149``). Here every table is a
parquet directory; loading = registering a (normalized) DataFrame.

Normalization handled here, once, for every consumer:

- ``events.ts`` is parquet TIMESTAMP(NANOS). On pyspark 4.1.2 the
  reader surfaces it natively as ``timestamp_ntz`` (us precision,
  ns truncated) and no conversion is needed; on older Sparks the
  ``nanosAsLong`` legacy conf makes it a ns-long, which :func:`table`
  detects by dtype and converts with integer floor division —
  matching DuckDB's ns->us truncation either way.
- ``orders.o_orderdate`` / ``lineitem.l_shipdate`` arrive as
  TIMESTAMP_NTZ already (ms precision) — left as-is.

At 100 TB these reads are partitioned parquet scans; nothing here
materializes data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import tune_session

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalized."""
    tune_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-long -> us TIMESTAMP_NTZ (naive, like every other ts here).
        # Integer `div`, NOT `/`: float division of epoch-ns loses the
        # last microseconds digit at ~1.7e18.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                register: bool = True) -> dict[str, DataFrame]:
    """Load all tables; optionally register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
