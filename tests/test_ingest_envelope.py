"""Live ingest-envelope test: the reference's operational contract —
sustained >=10,000 rows/min generator throughput with <=600 s data
freshness (BASELINE.md §3: datagen writes ~10k rows/min,
reference datagen.py:128; check_lakehouse polls on a 600 s bound,
check_lakehouse.py:81) — measured on a REAL pipeline: datagen files
landing -> Structured Streaming file source with maxFilesPerTrigger
backpressure -> one CowTable commit per micro-batch.

The numbers here are the envelope's, not the engine's limit (one
local executor sustains orders of magnitude more); what the test
pins is that the live path — file discovery, trigger cadence,
backpressure, ACID commit — meets the contract end to end.
"""

from __future__ import annotations

import glob
import shutil
import time

from lakehouse_automation_spark.pipelines.datagen import generate_survey
from lakehouse_automation_spark.tableformat import CowTable

N_FILES = 6
ROWS_PER_FILE = 10_000   # one reference "minute" of datagen output
ENVELOPE_ROWS_PER_MIN = 10_000
ENVELOPE_FRESHNESS_S = 600.0


def test_ingest_envelope_live(spark, tmp_path):
    # bounded internally: stream await deadline 180 s + stop() in finally
    landing = tmp_path / "landing"
    landing.mkdir()
    table_path = str(tmp_path / "tbl")

    # stage the datagen batches up front so generation cost doesn't
    # pollute the ingest measurement (the reference's datagen is a
    # separate process); each lands atomically via rename
    staged = []
    for i in range(N_FILES):
        d = tmp_path / f"stage{i}"
        (generate_survey(spark, ROWS_PER_FILE, seed=100 + i)
         .coalesce(1).write.parquet(str(d)))
        staged.append(glob.glob(str(d / "part-*.parquet"))[0])
    schema = spark.read.parquet(staged[0]).schema

    state: dict = {"tbl": None, "commits": []}

    def land(bdf, bid):
        n = bdf.count()
        if state["tbl"] is None:
            state["tbl"] = CowTable.create(spark, bdf, table_path)
        else:
            state["tbl"].append(bdf)
        state["commits"].append((bid, n, time.time()))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)    # backpressure: bounded batches
        .parquet(str(landing))
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        t0 = time.time()
        file_landed_at = []
        for i, src in enumerate(staged):
            shutil.move(src, str(landing / f"datagen_{i:04d}.parquet"))
            file_landed_at.append(time.time())
            time.sleep(0.3)  # files arrive over time, as in production

        total = N_FILES * ROWS_PER_FILE
        deadline = time.time() + 180
        while time.time() < deadline:
            if sum(n for _, n, _ in state["commits"]) >= total:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    committed = sum(n for _, n, _ in state["commits"])
    assert committed == total, f"only {committed}/{total} rows committed"
    # every row is in the ACID table (whole batches, never partials)
    assert state["tbl"].read().count() == total

    last_commit = max(t for _, _, t in state["commits"])
    # throughput: the whole run, arrival gaps included, must sustain
    # the reference's generator rate
    rows_per_min = committed / (last_commit - t0) * 60.0
    assert rows_per_min >= ENVELOPE_ROWS_PER_MIN, f"{rows_per_min:.0f} rows/min"
    # freshness: the LAST file's rows are queryable well inside the
    # reference's 600 s poll bound
    freshness = last_commit - file_landed_at[-1]
    assert freshness <= ENVELOPE_FRESHNESS_S, f"{freshness:.1f}s stale"

    # backpressure really bounded the batches: 6 files at
    # maxFilesPerTrigger=2 needs >=3 micro-batches, each <=2 files
    batches_with_rows = [n for _, n, _ in state["commits"] if n > 0]
    assert len(batches_with_rows) >= 3
    assert max(batches_with_rows) <= 2 * ROWS_PER_FILE
    # ...and each micro-batch is one ACID commit (create + appends)
    assert state["tbl"].version() + 1 == len(batches_with_rows)
