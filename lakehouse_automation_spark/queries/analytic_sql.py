"""Advanced analytic-SQL surface (SURVEY §2.3 Tier C): subqueries
(scalar / IN / correlated EXISTS — Catalyst decorrelates them into
joins, SURVEY §4), recursive CTEs (Spark 4 native), analytic rank
functions, and edit-distance.

The reference's users reach all of these through the raw-SQL
passthrough (lib/commondb.py:81-89) against MySQL; here they run
native through ``spark.sql`` / DataFrame ops with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .base import register, t, dguard


@register(
    "subq_scalar",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 1.5x the global average price.
    Catalyst plans the subquery once and broadcasts the scalar — no
    per-row re-execution (the decorrelation §4 promises)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders_v
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders_v)
    """)


@register(
    "subq_in",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery -> left-semi join after rewrite."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment FROM customer_v
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders_v WHERE o_orderpriority = '1-URGENT'
        )
    """)


@register(
    "subq_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_nationkey FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
    """,
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — the decorrelation stress case: Catalyst
    rewrites it to a left-semi join on the correlation key instead of
    a per-supplier rescan of lineitem."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT s_suppkey, s_nationkey FROM supplier_v s
        WHERE EXISTS (
          SELECT 1 FROM lineitem_v l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
    """)


@register(
    "cte_recursive",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1996-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1996-12-01'
    )
    SELECT CAST(m AS TIMESTAMP) AS month_start,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_orderdate >= m
              AND o.o_orderdate < m + INTERVAL 1 MONTH) AS n_orders
    FROM months
    """,
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (native in Spark 4): generate a 1996 month spine
    recursively, then count orders per month — the classic date-spine
    pattern that previously needed sequence()+explode. The spine is
    12 rows; the order counts come from one scan + broadcast range
    join, not 12 rescans."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1996-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1996-12-01'
        )
        SELECT CAST(m AS TIMESTAMP) AS month_start,
               (SELECT COUNT(*) FROM orders_v o
                WHERE o.o_orderdate >= m
                  AND o.o_orderdate < m + INTERVAL 1 MONTH) AS n_orders
        FROM months
    """)


@register(
    "win_rank_pct",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(percent_rank() OVER w, 9) AS pr,
           ROUND(cume_dist() OVER w, 9) AS cd,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice NULLS LAST, o_orderkey)
    """,
)
def win_rank_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile — the distribution-rank trio
    (win_rank covers row_number/rank/dense_rank). Rounded to 9 dp: the
    rank fractions are exact small rationals, identical across engines
    after rounding."""
    # NULLS LAST pinned: Spark ASC defaults nulls-first, DuckDB
    # nulls-last — rank positions over a nullable sort key must say
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc_nulls_last(), "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and,
           o_orderkey | 4096 AS b_or,
           xor(o_orderkey, 1365) AS b_xor,
           o_orderkey << 2 AS b_shl,
           o_orderkey >> 3 AS b_shr,
           bit_count(o_orderkey) AS b_pop
    FROM orders WHERE o_orderkey < 1000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator pack (MySQL's & | ^ << >> BIT_COUNT) — used in
    this engine for SimHash banding and salting; exposed as a key so
    the surface is explicit."""
    k = F.col("o_orderkey")
    return (
        t(spark, sf_dir, "orders").filter(k < 1000)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("b_and"),
            k.bitwiseOR(F.lit(4096)).alias("b_or"),
            k.bitwiseXOR(F.lit(1365)).alias("b_xor"),
            F.shiftleft(k, 2).alias("b_shl"),
            F.shiftright(k, 3).alias("b_shr"),
            F.bit_count(k).cast("bigint").alias("b_pop"),
        )
    )


@register(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           -- percentile domain contract: in-domain values only (see
           -- agg_percentile — NaN ranks largest in Spark, is ignored
           -- by DuckDB's median)
           ROUND(median(CASE WHEN abs(l_quantity) <= 1e15
                        THEN l_quantity END), 4) AS med_qty,
           ROUND(median(CASE WHEN abs(l_extendedprice) <= 1e15
                        THEN l_extendedprice END), 4) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIAN (interpolated) per group — the exact counterpart of
    agg_percentile's approx path; rounded at 4 dp so the two engines'
    interpolation agrees bit-for-bit."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.median(dguard("l_quantity")), 4).alias("med_qty"),
            F.round(F.median(dguard("l_extendedprice")), 4)
             .alias("med_price"),
        )
    )


@register(
    "fn_levenshtein",
    oracle="""
    SELECT c_custkey, c_name,
           levenshtein(regexp_replace(c_name, '[^ -~]', '', 'g'),
                       'Customer#000000000') AS dist
    FROM customer WHERE c_custkey < 100
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (fuzzy matching's workhorse; MySQL users reach it
    via UDFs, Spark has it built in JVM-side).

    The distance is computed over the PRINTABLE-ASCII projection of
    the name (non-ASCII and control code points deleted on both
    sides, a no-op on the clean corpus): Spark's levenshtein counts
    CODE POINTS while DuckDB's counts BYTES ('👩' vs 'e' is 1 there,
    4 here), so the raw function is not oracle-replayable on
    non-ASCII text — and deletion is the one projection where Java's
    code-unit regex and RE2's code-point regex agree exactly (each
    surrogate half is deleted individually vs the pair at once — same
    result). Found by the round-9 dirty-names probe."""
    ascii_name = F.regexp_replace(F.col("c_name"), "[^ -~]", "")
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(
            "c_custkey", "c_name",
            F.levenshtein(ascii_name,
                          F.lit("Customer#000000000")).alias("dist"),
        )
    )
