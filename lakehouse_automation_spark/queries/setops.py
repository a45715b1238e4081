"""Set operations + dedup (SURVEY §2.3 "Set operations").

The survey stream draws ids with replacement (datagen.py:75) so
duplicates are guaranteed — dedup is a first-class operator, not an
afterthought. Exact dedup at 100 TB = hash-shuffle on the dedup key;
fuzzy variants live in queries.text_pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .base import register, t


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey AS custkey, 'big_order' AS why FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT c_custkey AS custkey, 'machinery' AS why FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no dedup shuffle)."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"), F.lit("big_order").alias("why"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_custkey").alias("custkey"), F.lit("machinery").alias("why"))
    )
    return o.unionByName(c)


@register(
    "set_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) = union + one dedup shuffle."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.union(c).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — customers with both open and final orders."""
    o = t(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    final = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_.intersect(final)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers with no orders at all."""
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o).distinct()


@register(
    "dedup",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event_id, COUNT(*) AS n_dupes
    FROM events GROUP BY user_id, event_type
    """,
)
def dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-key with a deterministic survivor (min id) — the
    deterministic form of ``dropDuplicates([key])`` (whose survivor is
    partition-order dependent; that API is exercised in tests)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


@register(
    "distinct_proj",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a projection."""
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — the multiset variant: a customer with 3 open
    and 2 filled orders appears twice (min of multiplicities), where
    plain INTERSECT collapses to one. Spark's ``intersectAll`` plans
    as a count-compare aggregate + generate, one shuffle per side."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
        .intersectAll(
            o.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: multiplicities subtract
    (3 open − 2 filled leaves the customer once), where plain EXCEPT
    removes the customer entirely."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
        .exceptAll(
            o.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )
