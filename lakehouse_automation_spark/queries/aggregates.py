"""Aggregation surface (SURVEY §2.3 "Aggregation").

Determinism: every money/float aggregate goes through DECIMAL sums
(order-independent, exact) and is surfaced as DOUBLE; higher moments
(stddev/corr) are derived from decimal moment sums with the same IEEE
expression in Spark and the DuckDB oracle, so values match bit-exactly
regardless of partitioning. Catalyst plans all of these as
partial+final hash aggregates (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .base import register, t, dec, dsum, davg


@register(
    "agg_hash_basic",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_hash_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/avg/min/max hash aggregate (the satisfaction-by-
    customer-type shape the survey stream exists for)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "sum_qty"),
            davg("l_extendedprice", "avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (Catalyst expands to a single
    multi-phase plan; no driver-side work)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders_exact,
           COUNT(DISTINCT l_partkey)  AS n_parts_exact,
           true AS orders_sketch_ok,
           true AS parts_sketch_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB answer to
    COUNT(DISTINCT) when exactness isn't required: no exact-distinct
    shuffle explosion, fixed-size sketch per group.

    The raw sketch value cannot hash-match a DuckDB oracle (HLL
    internals differ across engines), which left this key rows-only in
    rounds 1-2. Instead the query SELF-VERIFIES the sketch: it also
    computes the exact distinct counts (hash-checked against DuckDB)
    and emits a boolean per sketch asserting |approx - exact| <=
    5*rsd*exact — deterministic, since Spark's HLL++ is hash-based
    with no RNG. The oracle then pins the booleans to true, so a
    sketch drifting out of its documented error bound fails the gate
    instead of passing unexamined. tests/test_sources_udfs.py keeps
    the tighter 8% empirical bound on the raw values."""
    rsd = 0.02
    li = t(spark, sf_dir, "lineitem")
    # Two separate aggregations, NOT one: mixing countDistinct with
    # approx_count_distinct in a single agg makes Catalyst thread the
    # HLL register buffers (hundreds of LONG columns at rsd=0.02)
    # through the Expand-distinct shuffle keyed on ~n_rows groups —
    # measured 10x slower and spill-prone. Split, each side gets its
    # natural plan (expand-distinct / direct sketch) and the join is
    # on the tiny group-count result.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("_ao"),
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("_ap"),
    )
    # null-safe: NULL is a legitimate group key; a plain equi-join
    # would silently drop that group from the verification output
    g = exact.alias("e").join(
        approx.alias("a"),
        F.col("e.l_returnflag").eqNullSafe(F.col("a.l_returnflag")))
    def ok(approx, exact):
        return (F.abs(F.col(approx) - F.col(exact))
                <= 5 * rsd * F.col(exact))
    return g.select(
        "e.l_returnflag", "n_orders_exact", "n_parts_exact",
        ok("_ao", "n_orders_exact").alias("orders_sketch_ok"),
        ok("_ap", "n_parts_exact").alias("parts_sketch_ok"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           -- percentile domain contract (SCALE.md §extremes): the
           -- distribution is the IN-DOMAIN values only — Spark ranks
           -- NaN as the largest value while DuckDB's quantile_cont
           -- ignores it, so an unguarded NaN shifts every rank
           ROUND(quantile_cont(CASE WHEN abs(l_extendedprice) <= 1e15
                               THEN l_extendedprice END, 0.5), 4)
             AS p50_price,
           ROUND(quantile_cont(CASE WHEN abs(l_extendedprice) <= 1e15
                               THEN l_extendedprice END, 0.95), 4)
             AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear
    interpolation over the sorted group; rounded to absorb the one-ulp
    formula difference). ``percentile_approx`` is the sketch-based
    scale path — used in bench, tested separately."""
    from .base import dguard

    li = t(spark, sf_dir, "lineitem")
    price = dguard("l_extendedprice")  # NaN-rank contract: in-domain only
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(price, F.lit(0.5)), 4).alias("p50_price"),
        F.round(F.percentile(price, F.lit(0.95)), 4).alias("p95_price"),
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           true AS p50_rank_ok,
           true AS p95_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` — the 100-TB percentile path. The sketch
    (GK) is fixed-size, merges map-side, and ships one small buffer
    per group through the shuffle; exact ``percentile`` instead
    collects every group's full value list on one reducer, whose
    memory and sort time grow with group size — a 3-group exact
    percentile at 100 TB is three single-reducer sorts of the whole
    table.

    The sketch value itself cannot hash-match DuckDB (GK internals
    differ across engines), which left this key rows-only. Instead the
    query SELF-VERIFIES the GK rank guarantee distributedly: a second
    pass joins the 3-row sketch output back (broadcast) and counts
    rows strictly below / at-or-below each returned value — the
    returned element's rank interval must overlap
    [q*n - n/accuracy - 2, q*n + n/accuracy + 2]. Both passes are
    plain scans + hash aggregations (no per-group collection), so the
    verification itself survives 100 TB. The oracle pins n_rows (hash
    vs DuckDB) and the rank booleans to true; exact percentile VALUES
    live in the ``agg_percentile`` key. tests/test_sources_udfs.py
    additionally tracks the raw estimates against the exact tier.
    accuracy=10000 -> rank error <= n/10000."""
    acc = 10000
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    sk = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(acc)).alias("_p50"),
        F.percentile_approx("l_extendedprice", F.lit(0.95), F.lit(acc)).alias("_p95"),
    )
    # null-safe join: the NULL-flag group must keep its rows through
    # the verification pass, not vanish from the output
    j = (li.alias("l").join(
            F.broadcast(sk).alias("s"),
            F.col("l.l_returnflag").eqNullSafe(F.col("s.l_returnflag")))
         .select("l.l_returnflag", "l_extendedprice", "_p50", "_p95"))
    ranks = j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        # the sketch sees only NON-NULL values, so rank targets are
        # against the non-null count (== n_rows on a null-free column)
        F.count("l_extendedprice").alias("_nv"),
        F.sum((F.col("l_extendedprice") < F.col("_p50")).cast("long")).alias("_lt50"),
        F.sum((F.col("l_extendedprice") <= F.col("_p50")).cast("long")).alias("_le50"),
        F.sum((F.col("l_extendedprice") < F.col("_p95")).cast("long")).alias("_lt95"),
        F.sum((F.col("l_extendedprice") <= F.col("_p95")).cast("long")).alias("_le95"),
    )
    def rank_ok(lt, le, q):
        # the value's rank interval [lt+1, le] must meet the target
        # rank window; tie clusters widen the interval, not the bound
        n, tol = F.col("_nv"), F.col("_nv") / acc + 2
        target = q * n
        return (F.col(lt) + 1 <= target + tol) & (F.col(le) >= target - tol)
    return ranks.select(
        "l_returnflag", "n_rows",
        rank_ok("_lt50", "_le50", 0.5).alias("p50_rank_ok"),
        rank_ok("_lt95", "_le95", 0.95).alias("p95_rank_ok"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING markers (subtotals + grand total)."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", "sum_qty"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_partkey
    HAVING SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2))) > 300
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — a filter above the agg node."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("_tq"))
        .filter(F.col("_tq") > 300)
        .select("l_partkey", F.col("_tq").cast("double").alias("total_qty"))
    )


@register(
    "agg_collect",
    oracle="""
    SELECT o_orderkey AS okey,
           string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_list
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List-valued aggregation + concat — the reference's proc-output
    row-concat (lib/commondb.py:118-121) as collect_list/concat_ws.
    Sorted inside the array so output is partition-order independent."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderkey").alias("okey"))
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
            ).alias("line_list")
        )
    )


@register(
    "agg_stddev_corr",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(CASE WHEN abs(l_quantity * l_quantity) <= 1e15 THEN l_quantity * l_quantity END AS DECIMAL(20,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CASE WHEN abs(l_extendedprice * l_extendedprice) <= 1e15 THEN l_extendedprice * l_extendedprice END AS DECIMAL(30,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(CASE WHEN abs(l_quantity * l_extendedprice) <= 1e15 THEN l_quantity * l_extendedprice END AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
           ROUND((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
    FROM m
    """,
)
def agg_stddev_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates computed from exact decimal moment sums,
    then one identical double-precision formula in both engines —
    deterministic under any partitioning (native stddev/corr merge
    order varies; tests cover them against these within 1e-9)."""
    li = t(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(qty)).cast("double").alias("sx"),
        F.sum(dec(qty * qty, 20, 4)).cast("double").alias("sxx"),
        F.sum(dec(price)).cast("double").alias("sy"),
        F.sum(dec(price * price, 30, 4)).cast("double").alias("syy"),
        F.sum(dec(qty * price, 28, 4)).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    return m.select(
        "l_returnflag",
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round(
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2)) END) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with explicit value list (no extra pass to discover
    values — required shape at scale)."""
    df = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")))
    )
    return df.select(
        "l_returnflag",
        F.col("O").cast("double").alias("O"),
        F.col("F").cast("double").alias("F"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus,
           o_orderpriority AS mode_priority, CAST(cnt AS BIGINT) AS mode_n
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderstatus
        ORDER BY cnt DESC, o_orderpriority) AS rk
      FROM c)
    WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: the most frequent o_orderpriority per
    o_orderstatus, ties broken by smallest value. Built-in ``F.mode``
    leaves ties engine-defined, so the portable form is
    count-then-argmax: one partial+final hash aggregate down to
    |status x priority| rows (bounded: 3x5 here), then ``min_by`` over
    a (-cnt, value) key — highest count wins, then smallest value — as
    a second tiny aggregate, never a window over the raw table. Scale
    shape: the raw-table shuffle is the count agg only; everything
    after runs on the group-cardinality rowset."""
    c = (t(spark, sf_dir, "orders")
         .groupBy("o_orderstatus", "o_orderpriority")
         .agg(F.count(F.lit(1)).alias("cnt")))
    key = F.struct((-F.col("cnt")).alias("ncnt"),
                   F.col("o_orderpriority").alias("pr"))
    return (c.groupBy("o_orderstatus")
            .agg(F.min_by("o_orderpriority", key).alias("mode_priority"),
                 F.min_by("cnt", key).cast("long").alias("mode_n")))


@register(
    "agg_hist_bins",
    oracle="""
    WITH src AS (
      -- histogram domain contract: in-domain values only (an Inf or
      -- NaN edge poisons every bucket's arithmetic)
      SELECT l_extendedprice FROM lineitem
      WHERE abs(l_extendedprice) <= 1e15
    ), st AS (
      SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      FROM src
    ), b AS (
      SELECT CASE WHEN mx = mn THEN 0
                  ELSE CAST(LEAST(19.0, FLOOR((l_extendedprice - mn)
                                              / (mx - mn)
                                              * 20.0)) AS INT)
             END AS bucket,
             mn, mx
      FROM src, st
    )
    SELECT bucket,
           mn + bucket * ((mx - mn) / 20.0) AS lo_edge,
           mn + (bucket + 1) * ((mx - mn) / 20.0) AS hi_edge,
           COUNT(*) AS n
    FROM b GROUP BY 1, 2, 3
    """,
)
def agg_hist_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of l_extendedprice with DATA-DRIVEN
    edges — the profiling primitive behind every column-stats UI. Two
    passes by necessity (edges need global min/max), both cheap at any
    scale: the stats agg reduces to one broadcastable row, the bin agg
    partial-combines to <= 20 rows per partition. Bucket arithmetic
    ``least(19, floor((v - mn)/(mx - mn) * 20))`` and the edge
    expressions use one shared IEEE op order, so the oracle hashes
    bit-for-bit (the max value folds into the top bucket, standard
    width_bucket behavior). A single-valued column (mx = mn) would
    make the bucket 0/0 = NaN — and under ANSI mode CAST(NaN AS INT)
    throws — so that case short-circuits to bucket 0, mirrored in the
    oracle (review r7)."""
    li = (t(spark, sf_dir, "lineitem")
          # the oracle's histogram domain contract (in-domain only)
          .filter(F.abs(F.col("l_extendedprice")) <= 1e15)
          .select("l_extendedprice"))
    st = li.agg(F.min("l_extendedprice").alias("mn"),
                F.max("l_extendedprice").alias("mx"))
    b = (li.crossJoin(F.broadcast(st))
         .select(F.expr(
             "CASE WHEN mx = mn THEN 0"
             " ELSE CAST(LEAST(19.0D, FLOOR((l_extendedprice - mn)"
             " / (mx - mn) * 20.0D)) AS INT) END").alias("bucket"),
             "mn", "mx"))
    return (b.groupBy("bucket", "mn", "mx")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bucket",
                    (F.col("mn") + F.col("bucket")
                     * ((F.col("mx") - F.col("mn")) / F.lit(20.0)))
                    .alias("lo_edge"),
                    (F.col("mn") + (F.col("bucket") + 1)
                     * ((F.col("mx") - F.col("mn")) / F.lit(20.0)))
                    .alias("hi_edge"),
                    "n"))


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-mergeable distinct counting via Spark 4's bitmap aggs —
    the third distinct tier: plain COUNT(DISTINCT) re-shuffles raw
    keys, HLL trades exactness for mergeability, BITMAPS give both
    when keys are dense integers (the Databricks/ClickHouse
    roaring-bitmap pattern). Per (event_type, 32k-bucket) the keys
    fold into a <=4-KB bitmap IN THE PARTIAL AGGREGATE, so the shuffle
    carries bitmaps, never user_ids; the '__all__' row is produced by
    ``bitmap_or_agg`` MERGING the per-type bitmaps — the persist-daily
    / union-any-window property the oracle checks exactly (no error
    bound, unlike the HLL keys). At 100 TB: persist the (group,
    bucket, bitmap) table; any later distinct-union is a bitmap OR
    over it, no raw re-scan."""
    from ..operators.cache import tracked_persist

    ev = t(spark, sf_dir, "events").select("event_type", "user_id")
    # persisted: the per-type and or-merged branches both consume the
    # bitmap table — without it each branch re-scans events and
    # re-runs the bitmap partial agg (the diamond the vector
    # operators persist for the same reason)
    b = tracked_persist(
        ev.groupBy("event_type",
                   F.expr("bitmap_bucket_number(user_id)").alias("bk"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
             .alias("bm")))
    per = (b.groupBy("event_type")
           .agg(F.expr("sum(bitmap_count(bm))").cast("long")
                .alias("n_users")))
    merged = (b.groupBy("bk")
              .agg(F.expr("bitmap_or_agg(bm)").alias("bm")))
    total = (merged
             .agg(F.expr("sum(bitmap_count(bm))").cast("long")
                  .alias("n_users"))
             .select(F.lit("__all__").alias("event_type"), "n_users"))
    return per.unionByName(total)


@register(
    "agg_gini",
    oracle="""
    WITH rev AS (
      SELECT l.l_suppkey, s.s_nationkey,
             CAST(SUM(CAST(CASE WHEN abs(l.l_extendedprice * (1 - l.l_discount)) <= 1e15
                           THEN l.l_extendedprice * (1 - l.l_discount) END
                           AS DECIMAL(20,4))) * 10000 AS BIGINT) AS r4
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
      -- a supplier whose EVERY revenue folds out-of-domain has a NULL
      -- r4; exclude it before the ASC rank (Spark orders NULLs first,
      -- DuckDB last — one such row would shift every rank)
      HAVING r4 IS NOT NULL
    ), rk AS (
      SELECT s_nationkey, r4,
             CAST(row_number() OVER (
               PARTITION BY s_nationkey
               ORDER BY r4, l_suppkey) AS BIGINT) AS i
      FROM rev
    ), m AS (
      SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r4) AS BIGINT) AS s,
             CAST(SUM(i * r4) AS BIGINT) AS w
      FROM rk GROUP BY 1
    )
    SELECT nn.n_name, m.n AS n_suppliers,
           CAST(m.s AS DOUBLE) / 10000 AS total_revenue,
           ROUND(CAST(2 * m.w - (m.n + 1) * m.s AS DOUBLE) /
                 CAST(m.n * m.s AS DOUBLE), 6) AS gini
    FROM m JOIN nation nn ON m.s_nationkey = nn.n_nationkey
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier revenue per nation — the
    concentration/inequality aggregate (0 = revenue evenly spread,
    -> 1 = one supplier takes all) behind vendor-risk and
    data-source-diversity dashboards; over a training corpus the same
    statistic measures how skewed token mass is across sources.

    Computed from the sorted-rank identity
    G = (2*SUM(i*x_i) - (n+1)*SUM(x)) / (n*SUM(x)) with x ascending:
    revenues become exact BIGINT ten-thousandths via the DECIMAL-sum
    convention, ranks tie-break on supplier key, and both moment sums
    are integers — one double division at the end (+ round 6), so the
    value hashes identically across engines.

    100-TB shape: the revenue agg partial-combines per supplier
    before one shuffle; the rank window partitions BY NATION so the
    sort is parallel across groups (a global gini would need the
    two-pass range-partitioned ranking); the nation dim broadcasts."""
    from pyspark.sql import Window as W

    # revenue per supplier in exact 1e-4 units
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        dec(F.col("l_extendedprice") * (1 - F.col("l_discount")),
            20, 4).alias("rev"))
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
    rev = (li.join(F.broadcast(sup), "l_suppkey")
           .groupBy("l_suppkey", "s_nationkey")
           .agg((F.sum("rev") * 10000).cast("long").alias("r4"))
           # oracle's HAVING: all-out-of-domain suppliers are out of
           # rank contention (NULL asc-ordering diverges cross-engine)
           .filter(F.col("r4").isNotNull()))
    w = W.partitionBy("s_nationkey").orderBy("r4", "l_suppkey")
    rk = rev.select("s_nationkey", "r4",
                    F.row_number().over(w).cast("long").alias("i"))
    m = rk.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r4").alias("s"),
        F.sum(F.col("i") * F.col("r4")).alias("w"))
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name")
    two_w = F.lit(2) * F.col("w")
    return (m.join(F.broadcast(nat), "s_nationkey")
            .select("n_name", F.col("n").alias("n_suppliers"),
                    (F.col("s").cast("double") / F.lit(10000))
                    .alias("total_revenue"),
                    F.round((two_w - (F.col("n") + 1) * F.col("s"))
                            .cast("double")
                            / (F.col("n") * F.col("s")).cast("double"), 6)
                    .alias("gini")))


@register(
    "agg_entropy",
    oracle="""
    WITH ev AS (
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             event_type
      FROM events
    ), cnt AS (
      SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1, 2
    ), p AS (
      SELECT day, n,
             CAST(SUM(n) OVER (PARTITION BY day) AS BIGINT) AS total
      FROM cnt
    )
    SELECT day, CAST(MAX(total) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(SUM(-(CAST(n AS DOUBLE) / total)
                     * ln(CAST(n AS DOUBLE) / total)), 6) AS entropy
    FROM p GROUP BY day
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the daily event-type mix — the
    diversity/monoculture probe (0 = one type dominates the day,
    ln(|types|) = perfectly mixed) behind traffic-anomaly and
    data-mixture monitoring; over a training corpus the same shape
    scores source diversity per shard. Counts are exact integers; the
    per-type terms use one shared double expression and the ≤ |types|
    term sum rounds at 6 dp — the `text_unigram_logprob`/`text_bm25`
    convention for ln()-based keys.

    100-TB shape: the count agg partial-combines to |days|×|types|
    rows before its shuffle; the day-total window re-keys once to day
    partitioning, which the final per-day agg then REUSES (two
    Exchanges total over the bounded count rowset — measured)."""
    from pyspark.sql import Window as W

    ev = (t(spark, sf_dir, "events")
          .select(F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                         " div 86400000000").alias("day"),
                  "event_type"))
    cnt = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n"))
    p = cnt.withColumn("total", F.sum("n").over(W.partitionBy("day")))
    frac = F.col("n").cast("double") / F.col("total")
    return (p.groupBy("day")
            .agg(F.max("total").alias("n_events"),
                 F.count(F.lit(1)).alias("n_types"),
                 F.round(F.sum(-frac * F.log(frac)), 6).alias("entropy")))


@register(
    "agg_mad_outliers",
    oracle="""
    WITH rev AS (
      SELECT l.l_suppkey, s.s_nationkey,
             CAST(SUM(CAST(CASE WHEN abs(l.l_extendedprice * (1 - l.l_discount)) <= 1e15
                           THEN l.l_extendedprice * (1 - l.l_discount) END
                           AS DECIMAL(20,4))) * 10000 AS BIGINT) AS r4
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
      -- a supplier whose EVERY revenue folds out-of-domain has a NULL
      -- r4; exclude it before the ASC rank (Spark orders NULLs first,
      -- DuckDB last — one such row would shift every rank)
      HAVING r4 IS NOT NULL
    ), rk AS (
      SELECT s_nationkey, r4,
             CAST(row_number() OVER (
               PARTITION BY s_nationkey ORDER BY r4) AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY s_nationkey)
                  AS BIGINT) AS n
      FROM rev
    ), med AS (
      SELECT s_nationkey, MAX(n) AS n,
             CAST(SUM(CASE WHEN i = (n + 1) // 2 THEN r4 ELSE 0 END)
                + SUM(CASE WHEN i = (n + 2) // 2 THEN r4 ELSE 0 END)
                AS BIGINT) AS med2
      FROM rk GROUP BY 1
    ), dev AS (
      SELECT r.s_nationkey, m.n, m.med2,
             ABS(2 * r.r4 - m.med2) AS dev2,
             CAST(row_number() OVER (
               PARTITION BY r.s_nationkey
               ORDER BY ABS(2 * r.r4 - m.med2)) AS BIGINT) AS i
      FROM rev r JOIN med m ON r.s_nationkey = m.s_nationkey
    ), mad AS (
      SELECT s_nationkey, MAX(n) AS n, MAX(med2) AS med2,
             CAST(SUM(CASE WHEN i = (n + 1) // 2 THEN dev2 ELSE 0 END)
                + SUM(CASE WHEN i = (n + 2) // 2 THEN dev2 ELSE 0 END)
                AS BIGINT) AS mad4
      FROM dev GROUP BY s_nationkey
    ), outl AS (
      SELECT d.s_nationkey,
             CAST(SUM(CASE WHEN 2 * d.dev2 > 3 * m.mad4
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev d JOIN mad m ON d.s_nationkey = m.s_nationkey
      GROUP BY 1
    )
    SELECT nn.n_name, mad.n AS n_suppliers,
           CAST(mad.med2 AS DOUBLE) / 20000 AS median_revenue,
           CAST(mad.mad4 AS DOUBLE) / 40000 AS mad_revenue,
           outl.n_outliers
    FROM mad
    JOIN outl ON mad.s_nationkey = outl.s_nationkey
    JOIN nation nn ON mad.s_nationkey = nn.n_nationkey
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per nation: median / MAD (median
    absolute deviation) of supplier revenue, and the count of
    suppliers beyond the classic 3-MAD fence — the robust-statistics
    alternative to 3-sigma that a single whale supplier cannot drag.

    EXACT by integer doubling: revenue is BIGINT 1e-4 units (the
    agg_gini convention); the median of n values is (x[(n+1)//2] +
    x[(n+2)//2]) kept DOUBLED (med2, so odd/even cases need no
    fractions); deviations are |2x - med2| (still integers); the MAD
    is kept QUADRUPLED (mad4); and the fence |x - med| > 3*MAD
    becomes the pure-integer predicate 2*dev2 > 3*mad4. Every
    comparison and count is integer arithmetic — the two division-
    by-20000/40000 display columns are the only doubles, derived at
    the very end. Rank ties are harmless: equal values give the same
    rank-k element regardless of tie order.

    100-TB shape: revenue partial-combines per supplier before one
    shuffle; both rank windows partition BY NATION (parallel across
    groups); the per-nation median table is group-count-sized and
    broadcasts back; the nation dim broadcasts."""
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        dec(F.col("l_extendedprice") * (1 - F.col("l_discount")),
            20, 4).alias("rev"))
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
    rev = (li.join(F.broadcast(sup), "l_suppkey")
           .groupBy("l_suppkey", "s_nationkey")
           .agg((F.sum("rev") * 10000).cast("long").alias("r4"))
           # oracle's HAVING: see agg_gini
           .filter(F.col("r4").isNotNull()))
    from ..operators.cache import tracked_persist
    rev = tracked_persist(rev)   # two ranked passes read it

    def rank2(df, val):
        wn = W.partitionBy("s_nationkey")
        wr = wn.orderBy(val)
        return (df.withColumn("i", F.row_number().over(wr).cast("long"))
                .withColumn("n", F.count(F.lit(1)).over(wn).cast("long")))

    rk = rank2(rev, F.col("r4"))
    med = rk.groupBy("s_nationkey").agg(
        F.max("n").alias("n"),
        (F.sum(F.when(F.col("i") == F.expr("(n + 1) div 2"), F.col("r4"))
               .otherwise(0))
         + F.sum(F.when(F.col("i") == F.expr("(n + 2) div 2"),
                        F.col("r4")).otherwise(0)))
        .cast("long").alias("med2"))
    dev = (rev.join(F.broadcast(med.select("s_nationkey", "med2")),
                    "s_nationkey")
           .withColumn("dev2", F.abs(2 * F.col("r4") - F.col("med2"))))
    dev = tracked_persist(dev)   # ranked pass + outlier count read it
    dv = rank2(dev, F.col("dev2"))
    mad = dv.groupBy("s_nationkey").agg(
        F.max("n").alias("n"), F.max("med2").alias("med2"),
        (F.sum(F.when(F.col("i") == F.expr("(n + 1) div 2"),
                      F.col("dev2")).otherwise(0))
         + F.sum(F.when(F.col("i") == F.expr("(n + 2) div 2"),
                        F.col("dev2")).otherwise(0)))
        .cast("long").alias("mad4"))
    mad = tracked_persist(mad)   # outlier fence + final output read it
    out = (dev.join(F.broadcast(mad.select("s_nationkey", "mad4")),
                    "s_nationkey")
           .groupBy("s_nationkey")
           .agg(F.sum(F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1)
                      .otherwise(0)).cast("long").alias("n_outliers")))
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name")
    return (mad.join(out, "s_nationkey")
            .join(F.broadcast(nat), "s_nationkey")
            .select("n_name", F.col("n").alias("n_suppliers"),
                    (F.col("med2").cast("double") / F.lit(20000))
                    .alias("median_revenue"),
                    (F.col("mad4").cast("double") / F.lit(40000))
                    .alias("mad_revenue"),
                    "n_outliers"))


@register(
    "agg_skew_kurt",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
      FROM lineitem
      -- moment domain: out-of-domain quantities (NULL/NaN/±Inf/huge)
      -- are excluded from the distribution entirely — an Inf would
      -- abort the BIGINT cast and a guarded NULL would skip sums but
      -- still count in n, skewing every moment
      WHERE abs(l_quantity) <= 1e15 GROUP BY 1
    ), m AS (
      SELECT l_returnflag, n, s1, s2, s3, s4,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM s
    ), c AS (
      SELECT l_returnflag, n, mean,
             r2 - mean * mean AS m2,
             r3 - 3 * mean * r2 + 2 * mean * mean * mean AS m3,
             r4 - 4 * mean * r3 + 6 * mean * mean * r2
                - 3 * mean * mean * mean * mean AS m4
      FROM m
    )
    SELECT l_returnflag, n AS n_rows, mean AS mean_qty,
           m2 AS var_pop,
           m3 / (m2 * sqrt(m2)) AS skewness_pop,
           m4 / (m2 * m2) - 3 AS kurtosis_excess
    FROM c
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of quantity per return
    flag — the 3rd/4th-moment distribution-shape aggregates behind
    drift monitors and data-quality dashboards. NOT Spark's builtin
    `skewness`/`kurtosis` (whose sample-vs-population corrections
    differ between engines): both statistics are derived from EXACT
    BIGINT power sums S1..S4 of the integer quantities (q <= 50 so
    q^4 <= 6.25e6; the sums stay inside int64 far past 1e11 rows),
    then ONE shared sequence of IEEE expressions — raw moments r_k =
    S_k/n, central moments by the binomial identities, and
    m2*sqrt(m2) instead of pow(m2, 1.5) because sqrt is correctly
    rounded in every IEEE implementation while pow/exp/ln are not.

    100-TB shape: a single partial+final hash aggregate over 3 flag
    groups — the power sums combine map-side, so the shuffle carries
    five longs per flag per task and nothing else."""
    q = F.col("l_quantity").cast("long")
    s = (t(spark, sf_dir, "lineitem")
         # the oracle's moment-domain contract (see oracle comment)
         .filter(F.abs(F.col("l_quantity")) <= 1e15)
         .select("l_returnflag", q.alias("q"))
         .groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("q").alias("s1"),
              F.sum(F.col("q") * F.col("q")).alias("s2"),
              F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
              F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q"))
              .alias("s4")))
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m = s.select("l_returnflag", F.col("n").alias("n_rows"),
                 mean.alias("mean"), r2.alias("r2"), r3.alias("r3"),
                 r4.alias("r4"))
    m2 = F.col("r2") - F.col("mean") * F.col("mean")
    m3 = (F.col("r3") - 3 * F.col("mean") * F.col("r2")
          + 2 * F.col("mean") * F.col("mean") * F.col("mean"))
    m4 = (F.col("r4") - 4 * F.col("mean") * F.col("r3")
          + 6 * F.col("mean") * F.col("mean") * F.col("r2")
          - 3 * F.col("mean") * F.col("mean") * F.col("mean")
          * F.col("mean"))
    c = m.select("l_returnflag", "n_rows",
                 F.col("mean").alias("mean_qty"),
                 m2.alias("m2"), m3.alias("m3"), m4.alias("m4"))
    return c.select(
        "l_returnflag", "n_rows", "mean_qty",
        F.col("m2").alias("var_pop"),
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2"))))
        .alias("skewness_pop"),
        (F.col("m4") / (F.col("m2") * F.col("m2")) - 3)
        .alias("kurtosis_excess"))


@register(
    "agg_weighted_median",
    oracle="""
    WITH pv AS (
      SELECT l_returnflag,
             CAST(CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem
      -- percentile semantics: NULL/out-of-domain prices are not points
      -- of the price distribution and NULL/out-of-domain quantities
      -- carry no weight (abs(x) <= 1e15 is FALSE for NULL, NaN, ±Inf
      -- in both engines)
      WHERE abs(l_extendedprice) <= 1e15 AND abs(l_quantity) <= 1e15
      GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, cents, w,
             CAST(SUM(w) OVER (
               PARTITION BY l_returnflag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag)
               AS BIGINT) AS tw
      FROM pv
    )
    SELECT l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN cents END) AS DOUBLE)
             / 100 AS weighted_median_price
    FROM cum GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the lower
    weighted median (smallest price whose cumulative weight reaches
    half the total), the robust 'typical unit price' that a plain
    median of line items (ignoring volumes) misstates. Prices
    collapse to exact cents, weights to BIGINT quantity sums, and
    the defining inequality 2*cum >= total is pure integer — no
    interpolation, no doubles until the display column.

    100-TB shape: the (flag, cents) pre-aggregate partial-combines
    raw lineitems down to <= |distinct prices| rows per flag BEFORE
    the window — the cumulative sum then runs over the compacted
    value histogram (price-cardinality-bounded, not row-bounded),
    partitioned by flag so groups proceed in parallel."""
    from pyspark.sql import Window as W

    pv = (t(spark, sf_dir, "lineitem")
          # the oracle's contract: NULL/out-of-domain prices are not
          # distribution points, NULL/out-of-domain quantities carry
          # no weight (a NULL cents bucket would cum-sum in engine-
          # specific NULL order; an Inf weight would abort the cast)
          .filter((F.abs(F.col("l_extendedprice")) <= 1e15)
                  & (F.abs(F.col("l_quantity")) <= 1e15))
          .select("l_returnflag",
                  (dec("l_extendedprice") * 100)
                  .cast("long").alias("cents"),
                  F.col("l_quantity").cast("long").alias("q"))
          .groupBy("l_returnflag", "cents")
          .agg(F.sum("q").alias("w")))
    wc = (W.partitionBy("l_returnflag").orderBy("cents")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (pv.withColumn("cw", F.sum("w").over(wc))
           .withColumn("tw",
                       F.sum("w").over(W.partitionBy("l_returnflag"))))
    return (cum.groupBy("l_returnflag")
            .agg(F.max("tw").alias("total_weight"),
                 (F.min(F.when(2 * F.col("cw") >= F.col("tw"),
                               F.col("cents"))).cast("double")
                  / F.lit(100)).alias("weighted_median_price")))


@register(
    "agg_freq_histogram",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
      FROM orders GROUP BY 1
    ), hist AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM per_cust GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n_customers) AS BIGINT) AS total FROM hist
    )
    SELECT h.k AS orders_per_customer, h.n_customers,
           CAST(h.n_customers AS DOUBLE) / CAST(tot.total AS DOUBLE)
             AS share
    FROM hist h CROSS JOIN tot
    """,
)
def agg_freq_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies: how many customers placed exactly k
    orders — the Good-Turing-style diagnostic behind dedup tuning
    (cluster-size spectra), long-tail analysis, and sampling design.
    Two chained hash aggregates; counts exact, the share column one
    shared IEEE divide against a 1-row broadcast total.

    100-TB shape: the per-customer count partial-combines before its
    shuffle; the histogram agg collapses to <= max-k rows (bounded
    by the heaviest customer, not row count); the total broadcasts."""
    from ..operators.cache import tracked_persist

    hist = (t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_customers")))
    hist = tracked_persist(hist)   # total + share read it
    tot = hist.agg(F.sum("n_customers").alias("total"))
    return (hist.crossJoin(F.broadcast(tot))
            .select(F.col("k").alias("orders_per_customer"),
                    "n_customers",
                    (F.col("n_customers").cast("double")
                     / F.col("total").cast("double")).alias("share")))


@register(
    "agg_sample_estimate",
    oracle="""
    WITH tagged AS (
      SELECT l_returnflag,
             CAST(CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS cents,
             CAST(('0x' || substr(md5('se:' || CAST(l_orderkey AS VARCHAR)
                   || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS bucket
      FROM lineitem
    ), both_sides AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(SUM(cents) AS BIGINT) AS cents_exact,
             CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_sample,
             CAST(SUM(CASE WHEN bucket = 0 THEN cents ELSE 0 END) * 100
                  AS BIGINT) AS cents_est
      FROM tagged GROUP BY 1
    )
    SELECT l_returnflag, n_exact,
           CAST(cents_exact AS DOUBLE) / 100 AS sum_exact,
           n_sample,
           CAST(cents_est AS DOUBLE) / 100 AS sum_estimate,
           abs(CAST(cents_est - cents_exact AS DOUBLE))
             / CAST(cents_exact AS DOUBLE) AS rel_err,
           abs(CAST(cents_est - cents_exact AS DOUBLE))
             / CAST(cents_exact AS DOUBLE) <= 0.05 AS within_bound
    FROM both_sides
    """,
)
def agg_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based SUM estimation with a self-verified error bound —
    the query-acceleration pattern for 100-TB interactive analytics:
    a DETERMINISTIC 1% hash sample (md5 of the row key, so the sample
    is identical across engines, runs, and cluster layouts — never
    rand(), which is irreproducible and per-task-seeded) estimates
    per-flag revenue as 100x the sample sum, and the query also
    computes the exact answer and emits the relative error plus a
    <= 5% acceptance boolean. The oracle hash-checks the exact side,
    the estimate (integer-exact: the same rows are sampled), and pins
    the boolean — an estimator drifting out of bound fails the gate
    loudly instead of passing unexamined (the `agg_approx_distinct`
    self-verification convention).

    100-TB shape: ONE scan computes both sides (the sample is a CASE
    inside the aggregate, not a second pass); everything
    partial-combines; in production the sampled aggregate alone runs
    ~100x less reducer traffic — this key carries the accuracy
    contract for that trade."""
    from ..operators.dedup import portable_hash

    h = portable_hash(F.concat(
        F.lit("se:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string")))
    tagged = (t(spark, sf_dir, "lineitem")
              .select("l_returnflag",
                      (dec("l_extendedprice")
                       * 100).cast("long").alias("cents"),
                      (h % 100).alias("bucket")))
    g = (tagged.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n_exact"),
              F.sum("cents").alias("cents_exact"),
              F.sum(F.when(F.col("bucket") == 0, 1).otherwise(0))
              .cast("long").alias("n_sample"),
              (F.sum(F.when(F.col("bucket") == 0, F.col("cents"))
                     .otherwise(0)) * 100).cast("long")
              .alias("cents_est")))
    err = (F.abs((F.col("cents_est") - F.col("cents_exact"))
                 .cast("double"))
           / F.col("cents_exact").cast("double"))
    return g.select(
        "l_returnflag", "n_exact",
        (F.col("cents_exact").cast("double") / F.lit(100))
        .alias("sum_exact"),
        "n_sample",
        (F.col("cents_est").cast("double") / F.lit(100))
        .alias("sum_estimate"),
        err.alias("rel_err"),
        (err <= 0.05).alias("within_bound"))


@register(
    "agg_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(CAST(CASE WHEN abs(o_totalprice) <= 1e15 THEN o_totalprice END AS DECIMAL(18,2))
                                   * 100 AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders
      -- Benford domain: at least one cent and in the money domain —
      -- a 1e-300 rounds to 0 cents (digit 0 divides by zero in the
      -- benford_share expression) and an Inf/NaN/huge price has no
      -- leading decimal digit
      WHERE o_totalprice >= 0.01 AND abs(o_totalprice) <= 1e15
    ), cnt AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt
    )
    SELECT c.digit, c.n,
           CAST(c.n AS DOUBLE) / CAST(tot.total AS DOUBLE)
             AS observed_share,
           ROUND(ln(1.0 + 1.0 / CAST(c.digit AS DOUBLE))
                 / ln(10.0), 9) AS benford_share
    FROM cnt c CROSS JOIN tot
    """,
)
def agg_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation log10(1 + 1/d) — the classic fabricated-data
    / fraud screen auditors run over financial columns, and a cheap
    drift alarm for generated datasets. The leading digit comes from
    the STRING of the exact integer cents (never log10/pow, whose
    last-ulp could flip a 9.9999→10 boundary between engines);
    counts are exact and the observed share is one shared IEEE
    divide. The Benford column is a 9-value constant expression,
    round(9)-pinned (the one ln() in the key, applied to constants).

    100-TB shape: one scan, one partial+final agg to <= 9 rows,
    1-row total broadcast."""
    from ..operators.cache import tracked_persist

    cnt = (t(spark, sf_dir, "orders")
           .filter((F.col("o_totalprice") >= 0.01)
                   & (F.abs(F.col("o_totalprice")) <= 1e15))
           .select(F.substring(
               (dec("o_totalprice") * 100)
               .cast("long").cast("string"), 1, 1)
               .cast("long").alias("digit"))
           .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    cnt = tracked_persist(cnt)   # total + shares read it
    tot = cnt.agg(F.sum("n").alias("total"))
    return (cnt.crossJoin(F.broadcast(tot))
            .select("digit", "n",
                    (F.col("n").cast("double")
                     / F.col("total").cast("double"))
                    .alias("observed_share"),
                    F.round(F.log(1.0 + 1.0 / F.col("digit")
                                  .cast("double")) / F.log(F.lit(10.0)),
                            9).alias("benford_share")))


@register(
    "agg_exact_deciles",
    oracle="""
    WITH pv AS (
      SELECT l_returnflag,
             CAST(CAST(CASE WHEN abs(l_extendedprice) <= 1e15 THEN l_extendedprice END AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem
      -- domain contract: NULL and out-of-domain prices (NaN/±Inf/
      -- |v|>1e15) are not points of the price distribution — a folded
      -- NULL cents bucket would cum-sum in engine-specific NULL order
      WHERE abs(l_extendedprice) <= 1e15
      GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, cents, w,
             CAST(SUM(w) OVER (
               PARTITION BY l_returnflag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag)
               AS BIGINT) AS tw
      FROM pv
    )
    SELECT l_returnflag, CAST(MAX(tw) AS BIGINT) AS n_rows,
           CAST(MIN(CASE WHEN 10 * cw >= 1 * tw THEN cents END)
                AS DOUBLE) / 100 AS p10,
           CAST(MIN(CASE WHEN 10 * cw >= 2 * tw THEN cents END)
                AS DOUBLE) / 100 AS p20,
           CAST(MIN(CASE WHEN 10 * cw >= 3 * tw THEN cents END)
                AS DOUBLE) / 100 AS p30,
           CAST(MIN(CASE WHEN 10 * cw >= 4 * tw THEN cents END)
                AS DOUBLE) / 100 AS p40,
           CAST(MIN(CASE WHEN 10 * cw >= 5 * tw THEN cents END)
                AS DOUBLE) / 100 AS p50,
           CAST(MIN(CASE WHEN 10 * cw >= 6 * tw THEN cents END)
                AS DOUBLE) / 100 AS p60,
           CAST(MIN(CASE WHEN 10 * cw >= 7 * tw THEN cents END)
                AS DOUBLE) / 100 AS p70,
           CAST(MIN(CASE WHEN 10 * cw >= 8 * tw THEN cents END)
                AS DOUBLE) / 100 AS p80,
           CAST(MIN(CASE WHEN 10 * cw >= 9 * tw THEN cents END)
                AS DOUBLE) / 100 AS p90
    FROM cum GROUP BY l_returnflag
    """,
)
def agg_exact_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT deciles p10..p90 per flag at 100-TB scale — the third
    percentile tier: `agg_percentile` (exact, but per-group value
    collection that cannot scale past one reducer per group),
    `agg_percentile_approx` (GK sketch, scalable but approximate),
    and THIS — exact AND scalable via the `agg_weighted_median`
    histogram-rank technique generalized to nine cut points: collapse
    rows to the (flag, cents) value histogram, one cumulative-sum
    window over it, and each lower decile is the pure-integer
    predicate 10*cum >= d*total. No interpolation, no per-group
    collection; the window input is price-cardinality-bounded.

    100-TB shape: the histogram pre-aggregate partial-combines raw
    lineitems down to <= |distinct prices| rows per flag; one
    flag-partitioned cumsum window; one collapsing agg to 3 rows."""
    from pyspark.sql import Window as W

    pv = (t(spark, sf_dir, "lineitem")
          # the oracle's contract: NULL and out-of-domain prices are
          # not distribution points (see agg_weighted_median)
          .filter(F.abs(F.col("l_extendedprice")) <= 1e15)
          .select("l_returnflag",
                  (dec("l_extendedprice") * 100)
                  .cast("long").alias("cents"))
          .groupBy("l_returnflag", "cents")
          .agg(F.count(F.lit(1)).alias("w")))
    wc = (W.partitionBy("l_returnflag").orderBy("cents")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (pv.withColumn("cw", F.sum("w").over(wc))
           .withColumn("tw",
                       F.sum("w").over(W.partitionBy("l_returnflag"))))
    aggs = [F.max("tw").alias("n_rows")]
    for d in range(1, 10):
        aggs.append(
            (F.min(F.when(10 * F.col("cw") >= d * F.col("tw"),
                          F.col("cents"))).cast("double") / F.lit(100))
            .alias(f"p{d}0"))
    return cum.groupBy("l_returnflag").agg(*aggs)


@register(
    "agg_topk_share",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nation, o.o_custkey,
             CAST(SUM(CAST(CASE WHEN abs(o.o_totalprice) <= 1e15 THEN o.o_totalprice END AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), rk AS (
      SELECT nation, cents,
             row_number() OVER (
               PARTITION BY nation
               ORDER BY cents DESC, o_custkey) AS rk
      FROM rev
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100
             AS total_revenue,
           CAST(CAST(SUM(CASE WHEN rk <= 10 THEN cents ELSE 0 END)
                     AS BIGINT) AS DOUBLE) / 100 AS top10_revenue,
           CAST(CAST(SUM(CASE WHEN rk <= 10 THEN cents ELSE 0 END)
                     AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
             AS top10_share
    FROM rk GROUP BY nation
    """,
)
def agg_topk_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10-customer revenue share per nation — the concentration-
    curve point ("what fraction do the biggest 10 accounts carry")
    complementing `agg_gini`'s single-number inequality: gini says
    HOW skewed, this says WHO carries it. Revenue is exact BIGINT
    cents; the rank window partitions BY NATION (parallel across
    groups, ties broken on customer key); the share is one shared
    IEEE divide at the end.

    100-TB shape: the per-customer agg partial-combines before one
    o_custkey-grain shuffle; the rank window input is customers, not
    orders; the final agg collapses to 25 rows."""
    from pyspark.sql import Window as W

    rev = (t(spark, sf_dir, "orders")
           .select("o_custkey",
                   dec("o_totalprice")
                   .alias("price"))
           .join(F.broadcast(
               t(spark, sf_dir, "customer")
               .select(F.col("c_custkey").alias("o_custkey"),
                       F.col("c_nationkey").alias("nation"))),
               "o_custkey")
           .groupBy("nation", "o_custkey")
           .agg((F.sum("price") * 100).cast("long").alias("cents")))
    wr = W.partitionBy("nation").orderBy(F.desc("cents"),
                                         F.asc("o_custkey"))
    rk = rev.withColumn("rk", F.row_number().over(wr))
    top = F.sum(F.when(F.col("rk") <= 10, F.col("cents"))
                .otherwise(0)).cast("long")
    return (rk.groupBy("nation")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 (F.sum("cents").cast("long").cast("double")
                  / F.lit(100)).alias("total_revenue"),
                 (top.cast("double") / F.lit(100))
                 .alias("top10_revenue"),
                 (top.cast("double")
                  / F.sum("cents").cast("long").cast("double"))
                 .alias("top10_share")))


@register(
    "agg_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey,
             CAST(SUM(CAST(CASE WHEN abs(l.l_extendedprice) <= 1e15 THEN l.l_extendedprice END AS DECIMAL(18,2))) * 100
                  AS HUGEINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(CAST(SUM(cents) AS HUGEINT) AS DOUBLE) / 100
             AS total_revenue,
           CAST(SUM(cents * cents) AS DOUBLE)
             / (CAST(CAST(SUM(cents) AS HUGEINT) AS DOUBLE)
                * CAST(CAST(SUM(cents) AS HUGEINT) AS DOUBLE)) AS hhi
    FROM rev GROUP BY nation
    """,
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per nation
    (sum of squared revenue shares, 1/n = even .. 1 = monopoly) —
    the regulator's concentration number beside `agg_gini`'s
    inequality and `agg_topk_share`'s head mass. The identity
    HHI = sum(c_i^2) / (sum c_i)^2 makes it ONE aggregation over
    exact cents: both the squared sum and the square of the sum are
    128-bit integers (Spark DECIMAL(38,0), DuckDB HUGEINT), and the
    single closing divide is shared-IEEE — no per-supplier share
    division ever happens, so there is no float summation anywhere.

    100-TB shape: per-supplier revenue partial-combines before one
    shuffle; the HHI agg collapses to 25 rows; supplier broadcasts."""
    d38 = "decimal(38,0)"
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        dec("l_extendedprice").alias("price"))
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nation"))
    rev = (li.join(F.broadcast(sup), "l_suppkey")
           .groupBy("nation", "l_suppkey")
           .agg((F.sum("price") * 100).cast(d38).alias("cents")))
    return (rev.groupBy("nation")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 F.sum("cents").alias("s"),
                 F.sum(F.col("cents") * F.col("cents")).alias("sq"))
            .select("nation", "n_suppliers",
                    (F.col("s").cast("double") / F.lit(100))
                    .alias("total_revenue"),
                    (F.col("sq").cast("double")
                     / (F.col("s").cast("double")
                        * F.col("s").cast("double"))).alias("hhi")))


@register(
    "agg_pareto_8020",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nation, o.o_custkey,
             CAST(SUM(CAST(CASE WHEN abs(o.o_totalprice) <= 1e15 THEN o.o_totalprice END AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), rk AS (
      SELECT nation, cents,
             row_number() OVER (
               PARTITION BY nation
               ORDER BY cents DESC, o_custkey) AS rk,
             CAST(SUM(cents) OVER (
               PARTITION BY nation
               ORDER BY cents DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(SUM(cents) OVER (PARTITION BY nation) AS BIGINT)
               AS total,
             CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT)
               AS n_cust
      FROM rev
    )
    SELECT nation, CAST(MAX(n_cust) AS BIGINT) AS n_customers,
           CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN rk END)
                AS BIGINT) AS n_for_80pct,
           CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN rk END)
                AS DOUBLE) / CAST(MAX(n_cust) AS DOUBLE)
             AS share_of_customers
    FROM rk GROUP BY nation
    """,
)
def agg_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto 80/20 point per nation: the SMALLEST number of
    top customers whose cumulative revenue reaches 80% of the
    nation's total, and what fraction of the customer base that is —
    the fourth concentration lens (gini = inequality, HHI =
    regulator's number, topk_share = fixed-head mass, THIS = head
    size at fixed mass). The threshold is the pure-integer predicate
    5*cum >= 4*total over the descending-revenue cumulative sum —
    no percentage arithmetic, no floats until the one display
    divide; ranks tie-break on customer key.

    100-TB shape: per-customer revenue partial-combines before one
    o_custkey-grain shuffle; both windows share the nation(-ordered)
    partitioning over the CUSTOMER-level rollup; the final agg
    collapses to 25 rows."""
    from pyspark.sql import Window as W

    rev = (t(spark, sf_dir, "orders")
           .select("o_custkey",
                   dec("o_totalprice")
                   .alias("price"))
           .join(F.broadcast(
               t(spark, sf_dir, "customer")
               .select(F.col("c_custkey").alias("o_custkey"),
                       F.col("c_nationkey").alias("nation"))),
               "o_custkey")
           .groupBy("nation", "o_custkey")
           .agg((F.sum("price") * 100).cast("long").alias("cents")))
    wo = W.partitionBy("nation").orderBy(F.desc("cents"),
                                         F.asc("o_custkey"))
    rk = (rev
          .withColumn("rk", F.row_number().over(wo))
          .withColumn("cum", F.sum("cents").over(
              wo.rowsBetween(W.unboundedPreceding, W.currentRow)))
          .withColumn("total",
                      F.sum("cents").over(W.partitionBy("nation")))
          .withColumn("n_cust",
                      F.count(F.lit(1)).over(W.partitionBy("nation"))))
    hit = F.min(F.when(5 * F.col("cum") >= 4 * F.col("total"),
                       F.col("rk")))
    return (rk.groupBy("nation")
            .agg(F.max("n_cust").alias("n_customers"),
                 hit.alias("n_for_80pct"),
                 (hit.cast("double")
                  / F.max("n_cust").cast("double"))
                 .alias("share_of_customers")))
