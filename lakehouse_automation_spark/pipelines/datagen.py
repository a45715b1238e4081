"""Survey data generator — the reference's ``datagen.py`` made Spark-native.

Reference behavior (all of /root/reference/datagen.py):
- every minute, write a ~10k-row CSV named ``datagen_{YYYYMMDDHHMM}.csv``
  (Asia/Seoul minute stamp, :65-66) with header (:71-72) onto the
  s3fs-mounted bucket;
- columns drawn uniformly from closed domains (:22-27);
- hourly, delete files older than N days (:91-105).

Spark-native: ``spark.range(n)`` + seeded ``rand()`` — the whole row
path is JVM-side codegen, no Python loop (the reference writes rows
one at a time through csv.writer, :74-82). Throughput parity target:
the reference sustains ~167 rows/s; one Spark task does millions/s.
"""

from __future__ import annotations

import datetime as dt
import os
import zoneinfo

from pyspark.sql import DataFrame, SparkSession, functions as F

# Closed value domains (datagen.py:22-27)
ID_MAX = 129879
DELAY_MAX = 1600
CUSTOMER_TYPES = ["First-time", "Returning"]
TRAVEL_TYPES = ["Personal", "Business"]
SATISFACTION = ["Neutral or Dissatisfied", "Satisfied"]

STAMP_TZ = zoneinfo.ZoneInfo("Asia/Seoul")  # datagen.py:65


def _choice(domain: list[str], seed: int) -> F.Column:
    """Uniform draw from a closed set: literal array + seeded rand —
    distributed equivalent of random.choice (datagen.py:75-80)."""
    arr = F.array(*[F.lit(v) for v in domain])
    idx = (F.rand(seed) * len(domain) + 1).cast("int")
    return F.element_at(arr, F.least(idx, F.lit(len(domain))))


def generate_survey(spark: SparkSession, rowcount: int = 10_000, seed: int = 42) -> DataFrame:
    """A1 — one batch of survey rows (default 10,000, datagen.py:44-47).
    Seeded for reproducibility; ids drawn with replacement so
    duplicates occur, as in the reference (datagen.py:75)."""
    r = spark.range(rowcount)
    return r.select(
        (F.rand(seed) * ID_MAX + 1).cast("long").alias("id"),
        _choice(CUSTOMER_TYPES, seed + 1).alias("customer_type"),
        _choice(TRAVEL_TYPES, seed + 2).alias("travel_type"),
        (F.rand(seed + 3) * DELAY_MAX).cast("int").alias("departure_delay"),
        (F.rand(seed + 4) * 4 + 1).cast("int").alias("baggage_handling"),
        _choice(SATISFACTION, seed + 5).alias("satisfaction"),
    )


def minute_stamp(now: dt.datetime | None = None) -> str:
    """``datagen_{YYYYMMDDHHMM}`` stamp in Asia/Seoul (datagen.py:65-66)."""
    now = now or dt.datetime.now(tz=STAMP_TZ)
    return now.astimezone(STAMP_TZ).strftime("datagen_%Y%m%d%H%M")


def write_survey_csv(df: DataFrame, out_dir: str,
                     stamp: str | None = None) -> str:
    """A2 — land one batch as a headered CSV under a minute-stamped
    directory (one coalesced file: the reference writes exactly one
    file per tick; at scale drop the coalesce and let each partition
    write — downstream streaming readers don't care)."""
    path = os.path.join(out_dir, stamp or minute_stamp())
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return path


def run_generator_loop(spark: SparkSession, out_dir: str, *,
                       ticks: int, rowcount: int = 10_000,
                       interval_s: float = 60.0, sleep=None) -> list[str]:
    """A4 — the 1-minute generation schedule (datagen.py:128-135) as a
    bounded loop (tests pass ticks + a no-op sleep). The production
    form is the Structured Streaming rate-source pipeline in
    streaming.ingest."""
    import time as _time

    sleep = sleep or _time.sleep
    written = []
    for tick in range(ticks):
        batch = generate_survey(spark, rowcount, seed=42 + tick)
        written.append(write_survey_csv(batch, out_dir, stamp=f"datagen_tick{tick:04d}"))
        if tick < ticks - 1:
            sleep(interval_s)
    return written
