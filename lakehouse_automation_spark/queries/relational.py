"""Relational core: scans, projections, filters, joins (SURVEY §2.3).

The reference delegates all of this to MySQL HeatWave through its
arbitrary-SQL passthrough (``/root/reference/lib/commondb.py:81-89``);
here each capability is a native Catalyst plan. Scale notes inline:
every query is a declarative plan — pushdown/pruning/join selection
are Catalyst's job, we only add explicit ``broadcast`` where the small
side is known-small by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .base import register, t, dec, dguard, dsum, davg

# --------------------------------------------------------------- flagship


@register(
    "flagship_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE)            AS sum_qty,
           CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2))) AS DOUBLE)       AS sum_base_price,
           CAST(SUM(CAST(CASE WHEN abs(l_extendedprice * (1 - l_discount)) <= 1e15 THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CASE WHEN abs(l_extendedprice * (1 - l_discount) * (1 + l_tax)) <= 1e15 THEN l_extendedprice * (1 - l_discount) * (1 + l_tax) END AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(CASE WHEN abs(l_discount) <= 1e15 THEN l_discount END AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: scan -> filter -> agg -> sort.

    The flagship ``entry()`` query. One shuffle (partial+final hash agg
    via Catalyst); the shipdate filter and 7-column projection reach
    the parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", 20, 4),
            # scale 6, not 4: the 3-factor product has 6 true decimal
            # places, so a scale-4 cast lands on round-half ties where
            # Spark (HALF_UP) and DuckDB (HALF_EVEN) disagree.
            dsum(charge, "sum_charge", 24, 6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ------------------------------------------------------------------ scans


@register(
    "scan_parquet",
    oracle="""
    SELECT p_partkey, p_name, p_size FROM part
    WHERE p_size BETWEEN 1 AND 15
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with pushdown: only 3 of 6 columns read, size
    predicate evaluated at the parquet row-group level."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(1, 15))
        .select("p_partkey", "p_name", "p_size")
    )


# --------------------------------------------------- projection / predicates


@register(
    "project_rename_cast",
    oracle="""
    SELECT l_orderkey AS okey,
           l_linenumber AS line_no,
           -- floor() explicitly: DuckDB CAST(double AS BIGINT) rounds
           -- where Spark truncates; the domain guard folds Inf/NaN/huge
           CAST(floor(CASE WHEN abs(l_quantity) <= 1e15
                      THEN l_quantity END) AS BIGINT) AS qty_int,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date
    FROM lineitem
    """,
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT/alias/cast — narrow projection pushed into the scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line_no"),
        F.floor(dguard("l_quantity")).cast("bigint").alias("qty_int"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_date"),
    )


@register(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean predicates (reference's mtime-window filter,
    check_lakehouse.py:111, is this shape)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_totalprice") > 100000) & (F.col("o_orderstatus") == "O"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "filter_in_between_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      AND c_acctbal BETWEEN 0 AND 5000
      AND c_name LIKE '%1%'
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE predicates."""
    c = t(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
            & F.col("c_acctbal").between(0, 5000)
            & F.col("c_name").like("%1%")
        ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


@register(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection (the reference's is_apply 1/0 success flag,
    check_lakehouse.py:114-119, re-expressed)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
    )


# ------------------------------------------------------------------- joins


@register(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 150000
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join; Catalyst picks broadcast (customer is small
    relative to orders at every SF) or sort-merge at scale."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(CASE WHEN abs(l.l_extendedprice * (1 - l.l_discount)) <= 1e15 THEN l.l_extendedprice * (1 - l.l_discount) END AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension side: no shuffle of the fact
    table for the join — the only shuffle is the final aggregation."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(disc_price, "revenue", 20, 4),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join — no row multiplication, right side
    reduced to its join keys before the shuffle."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (customers who never ordered)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_self",
    oracle="""
    SELECT a.l_orderkey AS okey, COUNT(*) AS n_pairs
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    GROUP BY a.l_orderkey
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: line-pairs within an order. Equi on the order key so
    it stays a hash join; the < predicate filters post-match."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .groupBy(F.col("a.l_orderkey").alias("okey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_theta_range",
    oracle="""
    WITH buckets AS (
      SELECT i AS bucket_id, i * 10.0 AS lo, (i + 1) * 10.0 AS hi
      FROM range(0, 5) tbl(i)
    )
    SELECT b.bucket_id, COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN abs(l.l_extendedprice) <= 1e15 THEN l.l_extendedprice END AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM lineitem l JOIN buckets b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bucket_id
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join against a tiny bucket dimension. The bucket
    side is broadcast, so the theta join is a broadcast-nested-loop
    over 5 rows — the scalable shape for band joins with few bands.
    (For dense band joins, pre-bucketize to an equi key instead.)"""
    li = t(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    buckets = spark.range(0, 5).select(
        F.col("id").alias("bucket_id"),
        (F.col("id") * 10.0).alias("lo"),
        ((F.col("id") + 1) * 10.0).alias("hi"),
    )
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "price_sum"))
    )


@register(
    "flagship_regional_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(CASE WHEN abs(l.l_extendedprice) <= 1e15 THEN l.l_extendedprice END AS DECIMAL(18,2))
                    * (1 - CAST(CASE WHEN abs(l.l_discount) <= 1e15 THEN l.l_discount END AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped second flagship: local-supplier revenue by
    nation — a 6-table join tree (fact lineitem/orders against 4 dims)
    with region + date pruning. Declared DataFrame-first and left to
    Catalyst: the tiny dims (region/nation/supplier/customer at dim
    scale) broadcast, the two fact tables hash-join on l_orderkey, the
    date filter reaches the orders parquet scan, and AQE handles the
    rest — the plan a 100-TB warehouse wants without a single hint.
    Revenue in exact DECIMAL (price x (1 - discount) is a lossless
    4-dp product), cast to DOUBLE at the end in both engines."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1998-01-01"))
         .select("o_orderkey", "o_custkey"))
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = (t(spark, sf_dir, "region")
         .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    revenue = F.sum(
        dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    ).cast("double").alias("revenue")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue, F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT s.s_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN abs(l.l_extendedprice) <= 1e15 THEN l.l_extendedprice END AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join via explicit key salting: the probe side
    gets a deterministic salt in [0, S), the build side is replicated
    across all S salts, and the join key becomes (key, salt) — a hot
    key's rows now spread over S reducers instead of one. Results are
    IDENTICAL to the plain join (the oracle is the unsalted SQL), which
    is the whole point: salting is a physical rewrite. AQE's skew-join
    splitting (enabled in this engine) handles moderate skew without
    this; explicit salting is the guard for the single-pathological-key
    case where one reducer would otherwise own the whole stage."""
    S = 8
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(S)).cast("int").alias("_salt"),
    )
    sup = (
        t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        .crossJoin(spark.range(S).select(F.col("id").cast("int").alias("_salt")))
    )
    return (
        li.join(sup, (li.l_suppkey == sup.s_suppkey) & (li._salt == sup._salt))
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "price_sum"))
    )


@register(
    "join_bucketed",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN abs(o.o_totalprice) <= 1e15 THEN o.o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: both tables written bucketBy(8)
    on the join key, so the sort-merge join reads pre-partitioned
    buckets with NO exchange on either side — the 100-TB pattern for
    repeated large-large joins (pay one layout write, then every join
    on that key skips its shuffle). tests assert the exchange-free
    plan; results equal the plain join (oracle)."""
    import re

    import shutil

    sf_tag = re.sub(r"[^0-9a-zA-Z]", "_", os.path.basename(sf_dir.rstrip("/")))
    ot, ct = f"b8_orders_{sf_tag}", f"b8_customer_{sf_tag}"
    for name, src, key in ((ot, "orders", "o_custkey"), (ct, "customer", "c_custkey")):
        if not spark.catalog.tableExists(name):
            # a PREVIOUS session's warehouse dir may linger without a
            # catalog entry (in-memory metastore); clear it or the
            # managed-table create refuses the location
            loc = os.path.join(
                spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
                name.lower())
            if os.path.exists(loc):
                shutil.rmtree(loc, ignore_errors=True)
            (t(spark, sf_dir, src).write.mode("overwrite")
             .bucketBy(8, key).sortBy(key).saveAsTable(name))
    o = spark.table(ot).select("o_custkey", "o_totalprice")
    c = spark.table(ct).select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "join_asof",
    oracle="""
    WITH errors  AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events WHERE event_type = 'error'),
         signups AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events WHERE event_type = 'signup')
    SELECT e.event_id, e.user_id, e.ts AS error_ts, s.ts AS last_signup_ts
    FROM errors e ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the latest signup by the same
    user at-or-before it (inclusive, matching DuckDB ASOF semantics).

    Spark has no native as-of operator (SURVEY §4). Implemented with
    the scalable union-scan pattern from operators.asof: tag both
    sides, one shuffle on (user_id), one window pass carrying the last
    signup ts forward — no join explosion, no per-group pandas.
    """
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        left=errors, right=signups, on="user_id",
        left_ts="ts", right_ts="ts", right_value_as="last_signup_ts",
    )
    return joined.select(
        "event_id", "user_id", F.col("ts").alias("error_ts"), "last_signup_ts"
    )


@register(
    "join_interval_bucketed",
    oracle="""
    SELECT e.event_id AS err_id, COUNT(*) AS n_purchases
    FROM events e JOIN events p
      ON CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
    GROUP BY e.event_id
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-x-large interval join (purchases within 10 min after each
    error), bucketized: explode the left interval over >=600 s time
    buckets (fanout <= 2), equi-join on the bucket id, residual-check
    the true interval. Catalyst gets a hash key, so the plan is a
    shuffle join on _bucket instead of the O(n*m) broadcast-nested-loop
    a pure range condition forces — the difference between a band join
    that scales and one that cannot run at 100 TB. (join_theta_range
    covers the other regime: a tiny band dimension where broadcast BNL
    is exactly right.)"""
    from ..operators.rangejoin import interval_join_bucketed as ijb

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
    return (
        ijb(errors, purchases, "err_ts", "p_ts", 0, 600)
        .groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH errors    AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                       FROM events WHERE event_type = 'error'),
         purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                       FROM events WHERE event_type = 'purchase')
    SELECT e.event_id, e.user_id, e.ts AS error_ts,
           p.ts AS next_purchase_ts
    FROM errors e ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'):
    for each error, the EARLIEST purchase at-or-after it by the same
    user — did the error precede a conversion? Same union-scan shape
    as the backward key with the in-partition scan order reversed;
    still exactly one shuffle, zero row multiplication. Matches
    DuckDB's ``ASOF ... ON l.ts <= r.ts`` inclusive semantics."""
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts")
    return (
        asof_join(errors, purchases, on="user_id",
                  left_ts="ts", right_ts="ts",
                  right_value_as="next_purchase_ts",
                  direction="forward")
        .select("event_id", "user_id", F.col("ts").alias("error_ts"),
                "next_purchase_ts")
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH errors  AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events WHERE event_type = 'error'),
         signups AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events WHERE event_type = 'signup')
    SELECT e.event_id, e.user_id, e.ts AS error_ts,
           CASE WHEN epoch_us(e.ts) - epoch_us(s.ts) <= 86400000000
                THEN s.ts END AS recent_signup_ts
    FROM errors e ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas merge_asof
    ``tolerance``): the latest signup at-or-before each error, but
    only if it happened within the last 24 h — staler matches null
    out. The matched timestamp rides the carried struct, so the
    tolerance costs no extra shuffle; the oracle restates it as ASOF
    plus a CASE on the epoch gap."""
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts")
    return (
        asof_join(errors, signups, on="user_id",
                  left_ts="ts", right_ts="ts",
                  right_value_as="recent_signup_ts",
                  direction="backward", tolerance_s=86400.0)
        .select("event_id", "user_id", F.col("ts").alias("error_ts"),
                "recent_signup_ts")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT o_orderkey, nullif(o_custkey % 50, 7) AS grp
      FROM orders
    ), d AS (
      SELECT DISTINCT nullif(o_custkey % 50, 7) AS grp FROM orders
    )
    SELECT COALESCE(CAST(d.grp AS VARCHAR), 'NULL') AS grp_key,
           COUNT(l.o_orderkey) AS n
    FROM d JOIN l ON l.grp IS NOT DISTINCT FROM d.grp
    GROUP BY 1
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics SCD
    lookups and sentinel-coded dimensions need. One of fifty groups is
    nulled via nullif; the plain equi-join would silently drop every
    such row, the null-safe join accounts for all of them (the n sum
    equals the table count, pytest-pinned). Plans as a normal hash
    join — ``<=>`` is a valid equi-join key, no nested loop."""
    o = t(spark, sf_dir, "orders")
    grp = F.nullif(F.col("o_custkey") % 50, F.lit(7))
    l = o.select("o_orderkey", grp.alias("grp"))
    d = o.select(grp.alias("d_grp")).distinct()
    return (
        d.join(l, l["grp"].eqNullSafe(d["d_grp"]))
        .groupBy(F.coalesce(F.col("d_grp").cast("string"), F.lit("NULL"))
                 .alias("grp_key"))
        .agg(F.count("o_orderkey").alias("n"))
    )


@register(
    "join_dpp_partition_pruned",
    oracle="""
    WITH ev AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             user_id, CASE WHEN abs(value) <= 1e15
                  THEN CAST(round(value * 100) AS BIGINT) END AS cents
      FROM events
    ), dim AS (
      SELECT day, substr(md5(day), 32, 1) AS tag
      FROM (SELECT DISTINCT day FROM ev)
    )
    SELECT ev.day, COUNT(*) AS n_events,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue
    FROM ev JOIN dim ON ev.day = dim.day
    WHERE dim.tag IN ('a', 'b')
    GROUP BY ev.day
    """,
)
def join_dpp_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING — the mechanism that makes
    fact-partitioned star joins viable at 100 TB: the fact side is a
    day-partitioned table, the dim side's selective filter (md5-tag —
    opaque to static analysis, so ONLY runtime pruning can help) is
    broadcast as a DynamicPruning subquery into the fact scan's
    PartitionFilters, and non-matching partition DIRECTORIES are never
    listed or read. The plan assertion lives in
    tests/test_scale_plans.py; this key pins the RESULT equality
    (pruned join == the oracle's unpruned join) so pruning can never
    change answers. The partitioned copy is (re)written to scratch —
    at scale the table already exists; the write is not the operator."""
    from .sinks import _scratch

    ev = (t(spark, sf_dir, "events")
          .select(F.date_format(F.col("ts").cast("timestamp"),
                                "yyyy-MM-dd").alias("day"),
                  "user_id",
                  F.when(F.abs(F.col("value")) <= 1e15,
                         F.round(F.col("value") * 100))
                  .cast("long").alias("cents")))
    path = _scratch(sf_dir, "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    # read back under the writer's schema (`day` stays STRING — its
    # canonical yyyy-MM-dd form is what the md5 tag hashes): no
    # inference pass, and a 0-row source reads back as 0 rows instead
    # of failing UNABLE_TO_INFER_SCHEMA on an empty partition tree.
    # DPP fires on the partition column regardless of its type.
    fact = spark.read.schema(ev.schema).parquet(path)
    dim = (fact.select("day").distinct()
           .withColumn("tag", F.substring(
               F.md5(F.col("day").cast("string")), 32, 1))
           .filter(F.col("tag").isin("a", "b")))
    return (fact.join(F.broadcast(dim), "day")
            .groupBy(F.col("day").cast("string").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum("cents").cast("double") / F.lit(100.0))
                 .alias("revenue")))


@register(
    "order_basket_lift",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n_ord AS (
      SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM op
    ), per_part AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM op GROUP BY p
    ), pairs AS (
      SELECT a.p AS part_a, b.p AS part_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT pr.part_a, pr.part_b, pr.n_ab,
           pa.n_p AS n_a, pb.n_p AS n_b,
           (CAST(pr.n_ab AS DOUBLE) * CAST(n_ord.n AS DOUBLE))
             / (CAST(pa.n_p AS DOUBLE) * CAST(pb.n_p AS DOUBLE))
             AS lift
    FROM pairs pr
    JOIN per_part pa ON pa.p = pr.part_a
    JOIN per_part pb ON pb.p = pr.part_b
    CROSS JOIN n_ord
    ORDER BY lift DESC, part_a, part_b
    LIMIT 100
    """,
)
def order_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over real order contents: top
    co-purchased part pairs by lift P(ab)/(P(a)P(b)) — the
    recommendation / assortment primitive, complementing
    `event_cooccurrence` (user-level event types) with true
    basket-level item pairs. The pair self-join shuffles on
    l_orderkey with fan-out bounded by TPC-H's <= 7 lineitems per
    order (<= 21 pairs); the n_ab >= 3 support floor prunes the
    singleton-pair tail BEFORE the part-count attach joins; lift is
    ONE shared IEEE expression; top-100 ties break on the pair key.

    100-TB shape: the distinct (order, part) projection
    partial-combines; pair fan-out is constant-bounded; per-part
    counts join on part keys (vocab-sized, shuffled not broadcast);
    the 1-row order total broadcasts; TakeOrderedAndProject top-k."""
    from ..operators.cache import tracked_persist

    op = (t(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    op = tracked_persist(op)   # pairs (twice) + counts + total
    n_ord = op.agg(F.countDistinct("o").alias("n"))
    per_part = op.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    a = op.select("o", F.col("p").alias("part_a"))
    b = op.select("o", F.col("p").alias("part_b"))
    pairs = (a.join(b, "o")
             .filter(F.col("part_a") < F.col("part_b"))
             .groupBy("part_a", "part_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= 3))
    pa = per_part.select(F.col("p").alias("part_a"),
                         F.col("n_p").alias("n_a"))
    pb = per_part.select(F.col("p").alias("part_b"),
                         F.col("n_p").alias("n_b"))
    return (pairs.join(pa, "part_a").join(pb, "part_b")
            .crossJoin(F.broadcast(n_ord))
            .select("part_a", "part_b", "n_ab", "n_a", "n_b",
                    ((F.col("n_ab").cast("double")
                      * F.col("n").cast("double"))
                     / (F.col("n_a").cast("double")
                        * F.col("n_b").cast("double"))).alias("lift"))
            .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
            .limit(100))


@register(
    "join_asof_nearest",
    oracle="""
    WITH errors  AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events WHERE event_type = 'error'),
         signups AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                     FROM events WHERE event_type = 'signup'),
         back AS (
           SELECT e.event_id, e.user_id, e.ts, s.ts AS b_ts
           FROM errors e ASOF LEFT JOIN signups s
             ON e.user_id = s.user_id AND e.ts >= s.ts
         ),
         fwd AS (
           SELECT e.event_id, s.ts AS f_ts
           FROM errors e ASOF LEFT JOIN signups s
             ON e.user_id = s.user_id AND e.ts <= s.ts
         )
    SELECT b.event_id, b.user_id, b.ts AS error_ts,
           CASE
             WHEN b.b_ts IS NULL THEN f.f_ts
             WHEN f.f_ts IS NULL THEN b.b_ts
             WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_ts
             ELSE f.f_ts
           END AS nearest_signup_ts,
           CASE
             WHEN b.b_ts IS NULL AND f.f_ts IS NULL THEN NULL
             WHEN b.b_ts IS NULL THEN 'after'
             WHEN f.f_ts IS NULL THEN 'before'
             WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN 'before'
             ELSE 'after'
           END AS direction
    FROM back b JOIN fwd f ON b.event_id = f.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'):
    each error matches the closest signup by the same user in EITHER
    direction, ties to the earlier (backward) side — completing the
    as-of family (backward / forward / tolerance / nearest).
    Composed from the two union-scan passes and a pure integer-
    microsecond distance compare — no interval join, no row
    multiplication; the oracle restates it as two DuckDB ASOF joins
    plus the same CASE.

    100-TB shape: two single-shuffle as-of passes (each the proven
    union-scan plan) joined back on the unique event id — 3 shuffles
    total, all key-partitioned, nothing broadcast or driver-side."""
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts")
    back = (asof_join(errors, signups, on="user_id",
                      left_ts="ts", right_ts="ts",
                      right_value_as="b_ts", direction="backward")
            .select("event_id", "user_id", "ts", "b_ts"))
    fwd = (asof_join(errors, signups, on="user_id",
                     left_ts="ts", right_ts="ts",
                     right_value_as="f_ts", direction="forward")
           .select(F.col("event_id").alias("event_id"), "f_ts"))
    j = back.join(fwd, "event_id")
    us = lambda c: F.expr(f"unix_micros(CAST({c} AS TIMESTAMP))")
    back_closer = (us("ts") - us("b_ts")) <= (us("f_ts") - us("ts"))
    nearest = (F.when(F.col("b_ts").isNull(), F.col("f_ts"))
               .when(F.col("f_ts").isNull(), F.col("b_ts"))
               .when(back_closer, F.col("b_ts"))
               .otherwise(F.col("f_ts")))
    direction = (F.when(F.col("b_ts").isNull()
                        & F.col("f_ts").isNull(), F.lit(None))
                 .when(F.col("b_ts").isNull(), F.lit("after"))
                 .when(F.col("f_ts").isNull(), F.lit("before"))
                 .when(back_closer, F.lit("before"))
                 .otherwise(F.lit("after")))
    return j.select("event_id", "user_id",
                    F.col("ts").alias("error_ts"),
                    nearest.alias("nearest_signup_ts"),
                    direction.alias("direction"))


@register(
    "project_unpivot",
    oracle="""
    WITH long_form AS (
      SELECT l_returnflag, 'quantity' AS measure,
             CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2)) AS val
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice',
             CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount',
             CAST(CASE WHEN abs(l_discount) <= 1e15 THEN l_discount END AS DECIMAL(18,2)) FROM lineitem
    )
    SELECT l_returnflag, measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val) AS DOUBLE) AS total,
           CAST(SUM(val) AS DOUBLE) / COUNT(*) AS mean
    FROM long_form GROUP BY 1, 2
    """,
)
def project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide measures -> long (measure, value) rows) —
    the reshape that feeds generic per-metric pipelines (profilers,
    drift monitors, metric stores) without one hand-written branch
    per column, exercising Spark's native `DataFrame.unpivot`
    (SQL UNPIVOT). The melted stream is immediately aggregated per
    (flag, measure) through the DECIMAL-sum convention, so the 3x
    row expansion never leaves the map side; the oracle restates the
    unpivot as the equivalent UNION ALL.

    100-TB shape: unpivot is a stateless projection (no shuffle);
    the only Exchange is the 3x|flags|x|measures|-group aggregate,
    which partial-combines the expansion away."""
    li = (t(spark, sf_dir, "lineitem")
          .select("l_returnflag",
                  dec("l_quantity")
                  .alias("quantity"),
                  dec("l_extendedprice")
                  .alias("extendedprice"),
                  dec("l_discount")
                  .alias("discount")))
    melted = li.unpivot(
        ids=["l_returnflag"],
        values=["quantity", "extendedprice", "discount"],
        variableColumnName="measure",
        valueColumnName="val")
    return (melted.groupBy("l_returnflag", "measure")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("val").cast("double").alias("total"),
                 (F.sum("val").cast("double") / F.count(F.lit(1)))
                 .alias("mean")))


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(CASE WHEN n.n_regionkey = r.r_regionkey
                     THEN 1 ELSE 0 END AS INT) AS is_member
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN of the two dimension tables (every
    (region, nation) combination with a membership flag) — the last
    join type of the matrix, exercised deliberately on BOUNDED
    dimension inputs. The only safe cartesian at 100 TB is
    dim x dim (|R| x |N| = 125 rows regardless of fact volume);
    Spark plans it as a broadcast nested loop with the tiny side
    broadcast, and the repo's convention everywhere else — cross
    join ONLY against 1-row aggregates or broadcast constant tables
    — is this same discipline.

    100-TB shape: both inputs are dimension-sized; the product is
    bounded by |dims|^2, never touched by fact tables."""
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = t(spark, sf_dir, "nation").select("n_regionkey", "n_name")
    return (r.crossJoin(F.broadcast(n))
            .select("r_name", "n_name",
                    F.when(F.col("n_regionkey") == F.col("r_regionkey"),
                           1).otherwise(0).cast("int")
                    .alias("is_member")))
