"""SparkSession construction and tuning.

The reference keeps one long-lived MySQL connection per daemon
(``/root/reference/lib/commondb.py:61-68``); our analog is one tuned
SparkSession per process. Scale posture (100 TB / 1000 executors):

- AQE on (runtime shuffle-partition coalescing, skew-join splitting),
- Arrow on (pandas hand-off, reference ``lib/commondb.py:86``),
- UTC session timezone (testdata timestamps are naive; the reference's
  Asia/Seoul stamps are handled explicitly where needed),
- shuffle partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number far less critical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-settable SQL confs applied to ANY session we are handed
# (the verify driver builds its own SparkSession; these must all be
# runtime-settable, and are).
RUNTIME_CONFS: dict[str, str] = {
    # testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
    # parquet reader refuses by default; read as long, convert in the
    # catalog (see catalog.load_tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # survey/testdata schemas are explicit; never pay an inference scan
    "spark.sql.csv.parser.columnPruning.enabled": "true",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (driver-owned
    sessions included)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build: keep going, callers cope
    return spark


def get_spark(app_name: str = "lakehouse_automation_spark",
              cpus: int | str | None = None) -> SparkSession:
    """Build (or fetch) the tuned local session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. In local mode
    the driver JVM is the only process, so driver memory is the single
    memory knob.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    n = (os.cpu_count() or 8) if cpus == "*" else int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Wide unrolled expressions (64-dim dot products, operators/
        # vector.py) codegen into single methods past HotSpot's 8 KB
        # JIT cutoff; without this flag they execute as interpreted
        # bytecode (~20x slower). JVM-launch-time only, so it applies
        # to sessions WE build (bench, tests); driver-owned sessions
        # still run correctly, just slower on those keys.
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_session(spark)
