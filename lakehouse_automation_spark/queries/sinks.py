"""Sources & sinks (SURVEY §2.3 "Scans / sources / sinks").

CSV/JSON scans use explicit schemas — never inference (the reference
declares its schema in code, datagen.py:29-36). Sink keys round-trip
through a scratch directory and return the re-read contents so the
oracle validates the full write->read path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..engine.session import scratch_base
from .base import register, t, dec


def _scratch(sf_dir: str, name: str) -> str:
    # resolved lazily (not a module constant) so a test or harness can
    # set $SPARK_GRAFT_SCRATCH after import; PID-keyed by default —
    # parallel batteries get disjoint sink round-trip dirs
    return os.path.join(scratch_base(), "sinks",
                        os.path.basename(sf_dir.rstrip("/")), name)


NATION_SCHEMA = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])


@register(
    "scan_csv_schema",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with declared schema + header (the survey-table shape,
    datagen.py:71-72): write nation as headered CSV, read it back with
    an explicit StructType — no inference pass."""
    path = _scratch(sf_dir, "nation_csv")
    t(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(NATION_SCHEMA).option("header", True).csv(path)


@register(
    "scan_json",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with declared schema (HeatWave lakehouse
    supports CSV/Parquet/JSON externals). Doubles survive the text
    round-trip: Spark writes shortest-roundtrip decimal reprs."""
    path = _scratch(sf_dir, "events_json")
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").json(path)
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    return spark.read.schema(schema).json(path)


@register(
    "sink_parquet",
    oracle="""
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN abs(p_retailprice) <= 1e15 THEN p_retailprice END AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM part GROUP BY p_brand
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink: write an aggregate, read it back (columnar round
    trip is exact for all types)."""
    path = _scratch(sf_dir, "brand_agg_parquet")
    agg = (
        t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("p_retailprice")).cast("double").alias("price_sum"),
        )
    )
    agg.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "sink_csv_header",
    oracle="""
    SELECT i AS row_id,
           (i * 48271) % 129879 + 1 AS id,
           CASE WHEN (i * 7) % 2 = 0 THEN 'First-time' ELSE 'Returning' END AS customer_type,
           (i * 48271 + 7) % 1600 AS departure_delay
    FROM range(1, 10001) tbl(i)
    """,
)
def sink_csv_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — the reference's CSV sink: ',' delimiter, header row, one
    minute-stamped file per batch (datagen.py:65-82, tz Asia/Seoul).
    Written via pipelines.datagen.write_survey_csv (single coalesced
    file, stamped dir name), read back with the declared schema."""
    from ..pipelines.datagen import write_survey_csv

    from .tier_a import gen_rows

    rows = gen_rows(spark, sf_dir).select(
        "row_id", "id", "customer_type", "departure_delay"
    )
    path = write_survey_csv(rows, _scratch(sf_dir, "survey_csv"))
    schema = T.StructType([
        T.StructField("row_id", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("customer_type", T.StringType()),
        T.StructField("departure_delay", T.LongType()),
    ])
    return spark.read.schema(schema).option("header", True).csv(path)


@register(
    "sink_partitioned",
    oracle="""
    WITH lo AS (
      SELECT date_trunc('day', MIN(CAST(ts AS TIMESTAMP))) AS v FROM events
    )
    SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS VARCHAR)
             AS event_date,
           COUNT(*) AS n
    FROM events, lo
    WHERE CAST(ts AS TIMESTAMP) >= lo.v
      AND CAST(ts AS TIMESTAMP) <  lo.v + INTERVAL 7 DAY
    GROUP BY 1
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned lakehouse layout (SURVEY §2 scale rule: the
    reference's minute-stamp filenames become a partition column).
    Write events partitioned by event_date, read back with a 7-day
    predicate — the scan touches ONLY the matching partition dirs
    (partition pruning; plan asserted in tests), which at 100 TB is
    the difference between reading a week and reading years."""
    path = _scratch(sf_dir, "events_by_date")
    ev = t(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date(F.date_trunc("day", "ts")))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
    # read back under the writer's schema: no inference pass, and a
    # 0-row source (empty ingest window) reads back as 0 rows instead
    # of failing UNABLE_TO_INFER_SCHEMA on a partition dir tree with
    # no data files
    back = spark.read.schema(ev.schema).parquet(path)
    # the window bound comes from PARTITION METADATA, not a data scan:
    # min() over a partition column materializes zero data pages (the
    # value rides the directory name) — the sink's own layout serves
    # the bound the way SHOW PARTITIONS serves it from a metastore.
    # min(event_date) == date_trunc(day, min(ts)) by construction.
    lo = back.agg(F.min("event_date")).collect()[0][0]
    import datetime as dt

    # empty table -> no partitions -> vacuous window (predicate false)
    if lo is None:
        window = F.lit(False)
    else:
        hi = lo + dt.timedelta(days=7)
        # ISO strings cast engine-side, never python date objects in
        # F.lit: py4j converts a date literal via strftime('%Y-%m-%d'),
        # which does NOT zero-pad years < 1000 ('1-01-01'), and
        # java.sql.Date.valueOf rejects that spelling — the year-0001
        # far-past sentinel (r11 time-edge gate) crashed exactly here.
        # isoformat() always pads to 4 digits.
        window = ((F.col("event_date") >= F.lit(lo.isoformat()).cast("date"))
                  & (F.col("event_date") < F.lit(hi.isoformat()).cast("date")))
    # predicate on the PARTITION column -> PartitionFilters (directory
    # pruning; plan-asserted): excluded days are never listed, let
    # alone read. Row-identical to a ts-range filter because every
    # row's event_date IS date_trunc(day, ts).
    return (
        back.filter(window)
        .groupBy(F.col("event_date").cast("string").alias("event_date"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "table_compact",
    oracle="""
    SELECT 'before' AS phase, 20 AS n_files,
           (SELECT COUNT(*) FROM events) AS n_rows
    UNION ALL
    SELECT 'after', 2, (SELECT COUNT(*) FROM events)
    """,
)
def table_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the OPTIMIZE analog of HeatWave's
    re-load (check_lakehouse.py:149): streaming ingest lands many
    small files (one per micro-batch/minute, datagen.py:66); periodic
    compaction rewrites them into few large ones so scans stop paying
    per-file open/footer costs. Here: land events as 20 files,
    compact to 2, prove row counts survive and file counts drop."""
    frag = _scratch(sf_dir, "events_fragmented")
    comp = _scratch(sf_dir, "events_compacted")
    ev = t(spark, sf_dir, "events")
    ev.repartition(20).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(2).write.mode("overwrite").parquet(comp)

    def stats(phase, path):
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        return (phase, len(files), spark.read.parquet(path).count())

    return spark.createDataFrame(
        [stats("before", frag), stats("after", comp)],
        "phase string, n_files int, n_rows bigint",
    )


@register(
    "analyze_stats",
    oracle="""
    SELECT 'orders' AS table_name,
           (SELECT COUNT(*) FROM orders) AS stat_rowcount
    """,
)
def analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE COMPUTE STATISTICS — feeds Catalyst's CBO (join
    reordering, broadcast decisions; SURVEY §4 'collect stats'). The
    key writes a managed copy, analyzes it, and reads the row count
    back from the CATALOG stats (not from data) to prove the stats
    pipeline works end to end."""
    import re
    import shutil

    sf_tag = re.sub(r"[^0-9a-zA-Z]", "_", os.path.basename(sf_dir.rstrip("/")))
    name = f"stats_orders_{sf_tag}"
    if not spark.catalog.tableExists(name):
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            name.lower())
        if os.path.exists(loc):
            shutil.rmtree(loc, ignore_errors=True)
        t(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(name)
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    stats_row = next(r for r in desc if r.col_name == "Statistics")
    n_rows = int(re.search(r"(\d+) rows", stats_row.data_type).group(1))
    return spark.createDataFrame(
        [("orders", n_rows)], "table_name string, stat_rowcount bigint")


@register(
    "jdbc_source",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def jdbc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC source — the reference's primary data plane is a live MySQL
    connection (lib/commondb.py:61-68: host/port/user, 10 s timeout,
    autocommit). Spark-native form: ``spark.read.jdbc`` with
    ``column/lowerBound/upperBound/numPartitions`` so one logical table
    becomes N parallel range-scans (the scale path for draining an
    operational DB — each executor opens its own connection and reads
    a key range). No MySQL exists in this sandbox, so the round-trip
    runs on the embedded Derby engine that ships inside Spark's own
    jars: write nation over JDBC, read it back partitioned 4 ways on
    n_nationkey. Falls back to the direct parquet read if JDBC is
    unavailable (same rows either way, so the oracle holds and the
    sweep never wedges)."""
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    try:
        db = os.path.join(_scratch(sf_dir, "derby"), "nationdb")
        url = f"jdbc:derby:{db};create=true"
        props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
        (nat.write.mode("overwrite")
         # Derby's dialect maps StringType to CLOB; force a comparable
         # VARCHAR so the read-back schema matches the source
         .option("createTableColumnTypes",
                 "n_nationkey INT, n_name VARCHAR(32), n_regionkey INT")
         .jdbc(url, "nation", properties=props))
        out = spark.read.jdbc(
            url, "nation", column="n_nationkey",
            lowerBound=0, upperBound=25, numPartitions=4, properties=props,
        )
        # Derby upper-cases unquoted identifiers
        return out.toDF(*[c.lower() for c in out.columns]).select(
            "n_nationkey", "n_name", "n_regionkey")
    except Exception:  # noqa: BLE001 — no JDBC engine available here
        return nat


@register(
    "sink_upsert",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN abs(value) <= 1e15 THEN value END AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events GROUP BY event_type
    """,
)
def sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental upsert into the lakehouse table (A6's MERGE shape,
    SURVEY key sink_delta_upsert). Base = events older than the split
    point; update batch = the newer tail PLUS an overlapping slice
    (replayed rows, as object-storage re-lists produce); the upsert
    must converge to exactly the full table. With delta-spark present
    this is a real ACID ``DeltaTable.merge`` against a Delta path;
    without (this sandbox — probed at engine.session.delta_available)
    the same MERGE runs transactionally anyway through
    ``tableformat.CowTable`` (atomic manifest commit, file-pruned
    copy-on-write) — since round 3 the no-jar path is no longer a bare
    relational emulation."""
    import shutil
    import tempfile

    from ..engine.session import delta_available
    from ..operators.upsert import delta_merge_upsert
    from ..tableformat import CowTable

    ev = t(spark, sf_dir, "events")
    split = ev.agg((F.min("ts") + F.expr("INTERVAL 20 DAYS")).alias("_split"))
    overlap = ev.agg((F.min("ts") + F.expr("INTERVAL 18 DAYS")).alias("_olap"))
    base = ev.join(F.broadcast(split)).filter(F.col("ts") < F.col("_split")).drop("_split")
    updates = ev.join(F.broadcast(overlap)).filter(F.col("ts") >= F.col("_olap")).drop("_olap")
    if delta_available():
        path = _scratch(sf_dir, "events_delta")
        base.write.format("delta").mode("overwrite").save(path)
        delta_merge_upsert(spark, path, updates, key="event_id")
        merged = spark.read.format("delta").load(path)
        cleanup = None
    else:
        cleanup = tempfile.mkdtemp(prefix="las_upsert_")
        tbl = CowTable.create(spark, base, f"{cleanup}/events")
        tbl.merge(updates, "event_id")
        merged = tbl.read()
    out = merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("value_sum"),
    )
    if cleanup is not None:
        out = out.localCheckpoint(eager=True)
        shutil.rmtree(cleanup, ignore_errors=True)
    return out


@register(
    "sink_orc",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN abs(value) <= 1e15
                    THEN CAST(round(value * 100) AS BIGINT) END)
                AS BIGINT) AS cents
    FROM events GROUP BY event_type
    """,
)
def sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the third columnar format Spark carries
    natively (beyond the reference's CSV/Parquet/JSON lakehouse
    surface): write events as ORC with the same predicate-pushdown /
    column-pruning contract as parquet, read back, aggregate. The
    oracle restates from the source table, so the hash check proves
    the format conversion was lossless (ns-timestamps and all)."""
    path = _scratch(sf_dir, "events_orc")
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(F.abs(F.col("value")) <= 1e15,
                          F.round(F.col("value") * 100).cast("long")))
              .alias("cents"))
    )


@register(
    "profile_table",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           COUNT(*) AS n_rows, COUNT(*) - COUNT(l_quantity) AS n_null,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
           CAST(SUM(CASE WHEN abs(l_quantity) <= 1e15
                    THEN CAST(round(l_quantity * 100) AS BIGINT) END)
                AS BIGINT) AS cents
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           CAST(MIN(l_extendedprice) AS DOUBLE),
           CAST(MAX(l_extendedprice) AS DOUBLE),
           CAST(SUM(CASE WHEN abs(l_extendedprice) <= 1e15
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT) END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
           CAST(SUM(CASE WHEN abs(l_discount) <= 1e15
                    THEN CAST(round(l_discount * 100) AS BIGINT) END)
                AS BIGINT)
    FROM lineitem
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (the data-quality report a pipeline
    runs before trusting a new drop): per-column row/null/distinct
    counts, min/max, and an integer-cents sum — all numeric columns in
    a SINGLE aggregation over a single scan (the multi-count-distinct
    compiles to one Expand + one hash agg, not one job per column),
    then unpivoted to a row per column. At 100 TB this is one pass
    over the referenced columns only (ReadSchema prunes the rest)."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
            F.sum(F.when(F.abs(F.col(c)) <= 1e15,
                         F.round(F.col(c) * 100).cast("long")))
            .alias(f"sm_{c}"),
        ]
    one = t(spark, sf_dir, "lineitem").agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_v"),
            F.col(f"mx_{c}").alias("max_v"),
            F.col(f"sm_{c}").alias("cents"),
        ) for c in cols
    ])
    return one.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "sink_dynamic_overwrite",
    oracle="""
    SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d')
             AS event_date,
           COUNT(*) AS n,
           -- the guard applies to the RESTATED value (what the reader
           -- aggregates), so a doubled in-domain value that leaves the
           -- domain folds identically in both engines
           CAST(SUM(CASE WHEN abs(CASE WHEN CAST(CAST(ts AS TIMESTAMP)
                                            AS DATE) = DATE '2024-01-05'
                                  THEN value * 2 ELSE value END) <= 1e15
                    THEN CAST(round(
             CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE)
                       = DATE '2024-01-05'
                  THEN value * 2 ELSE value END * 100) AS BIGINT) END)
             AS BIGINT) AS cents
    FROM events
    WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) <= DATE '2024-01-08'
    GROUP BY 1
    """,
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (INSERT OVERWRITE ... PARTITION):
    ``partitionOverwriteMode=dynamic`` replaces ONLY the partitions
    the incoming frame touches — here one day is re-stated with
    corrected values while every other day's files are untouched (the
    static default would wipe the whole table). The daily-restatement
    pattern: at 100 TB, re-publishing one day costs one day's write,
    not a table rewrite. The writer-level option avoids mutating the
    session conf."""
    import shutil
    import tempfile

    ev = (
        t(spark, sf_dir, "events")
        .withColumn("event_date", F.col("ts").cast("date"))
        .filter(F.col("event_date") <= F.lit("2024-01-08").cast("date"))
        .select("event_id", "event_date", "value")
    )
    root = tempfile.mkdtemp(prefix="las_dynow_")
    path = f"{root}/events"
    try:
        ev.write.partitionBy("event_date").parquet(path)
        restated = (
            ev.filter(F.col("event_date") == F.lit("2024-01-05").cast("date"))
            .withColumn("value", F.col("value") * 2)
        )
        (restated.write
         .partitionBy("event_date")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite")
         .parquet(path))
        # writer-schema read-back: empty-source-safe (see sink_partitioned)
        return (
            spark.read.schema(ev.schema).parquet(path)
            .groupBy(F.date_format("event_date", "yyyy-MM-dd")
                     .alias("event_date"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.abs(F.col("value")) <= 1e15,
                              F.round(F.col("value") * 100)
                              .cast("long"))).alias("cents"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "scan_text",
    oracle="""
    WITH lines AS (
      -- the text format's second lossy rule: a NULL doc writes as an
      -- EMPTY LINE (there is no NULL in a line-oriented file), so the
      -- oracle models the round-trip with COALESCE('')
      SELECT COALESCE(regexp_replace(text, '[\\r\\n]+', ' ', 'g'), '')
               AS value
      FROM documents
    )
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(length(value)) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct_lines
    FROM lines
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source format (``spark.read.text``) — the last
    built-in batch source missing from the scan family (CSV / JSON /
    parquet / ORC / JDBC covered): documents round-trip through a
    line-per-doc text sink (newlines flattened — the format's one
    lossy rule, applied identically in the oracle) and are read back
    as the standard ``value`` column. The aggregate proves the
    round-trip byte count; at scale text reads split by line offsets
    exactly like CSV, so the plan is an ordinary FileScan."""
    docs = (t(spark, sf_dir, "documents")
            .select(F.regexp_replace("text", r"[\r\n]+", " ").alias("value")))
    path = _scratch(sf_dir, "docs_text")
    docs.write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
        F.countDistinct("value").cast("long").alias("n_distinct_lines"))


@register(
    "sink_json",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CASE WHEN abs(o_totalprice) <= 1e15 THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum
    FROM orders GROUP BY o_orderpriority
    """,
)
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines SINK round-trip (the write-side twin of
    `scan_json`, completing the sink matrix: parquet / ORC / CSV /
    partitioned / dynamic-overwrite / JSON): write an aggregate as
    JSON lines, read it back with a declared schema. Doubles survive
    because Spark writes shortest-roundtrip decimal representations;
    the aggregate goes through the DECIMAL-sum convention first so
    the value being round-tripped is already exact.

    100-TB shape: the aggregate collapses before the write; JSON
    files split on line offsets like CSV, so the read-back scan
    parallelizes."""
    path = _scratch(sf_dir, "priority_agg_json")
    agg = (t(spark, sf_dir, "orders")
           .groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(dec("o_totalprice"))
                .cast("double").alias("price_sum")))
    agg.write.mode("overwrite").json(path)
    schema = T.StructType([
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("price_sum", T.DoubleType()),
    ])
    return spark.read.schema(schema).json(path)
