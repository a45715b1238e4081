"""Window functions + sort/limit/top-k/sample (SURVEY §2.3).

Every window here is partitioned on a key with enough cardinality to
parallelize (custkey / orderkey / user_id); none uses a global
unpartitioned window (which would serialize at 100 TB). Tie-breaks
always include a unique column so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .base import register, t, dec, dsum


@register(
    "win_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER()  OVER w AS rn,
             RANK()        OVER w AS rnk,
             DENSE_RANK()  OVER w AS drnk,
             NTILE(4)      OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: ROW_NUMBER/RANK/DENSE_RANK/NTILE.
    Catalyst's WindowGroupLimit pushes the rn<=3 limit below the sort."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id,
           CAST(ts AS TIMESTAMP) AS ts,
           LAG(CAST(ts AS TIMESTAMP))  OVER w AS prev_ts,
           LEAD(CAST(ts AS TIMESTAMP)) OVER w AS next_ts,
           FIRST_VALUE(event_type)     OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD/FIRST_VALUE per user ordered by event time."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.first("event_type").over(w).alias("first_type"),
    )


@register(
    "win_frame_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(CASE WHEN abs(l_quantity) <= 1e15 THEN l_quantity END AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_quantity NULLS LAST
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame (decimal-exact).
    ORDER BY includes l_quantity: (l_orderkey, l_linenumber) is not
    unique in the testdata, and a ROWS frame over ties is otherwise
    partition-order dependent."""
    # NULLS LAST pinned on the nullable tiebreaker: Spark's ASC
    # default is nulls-first, DuckDB's is nulls-last — an ORDER BY
    # over a nullable column must say which, or the ROWS frame
    # contents diverge between engines
    w = (
        W.partitionBy("l_orderkey")
        .orderBy(F.col("l_linenumber"),
                 F.col("l_quantity").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("running_qty"),
    )


@register(
    "win_frame_range",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: events per user in the trailing hour,
    ordered by epoch MICROSECONDS (the moving-rate query over the
    survey stream). Microseconds, not seconds: second-truncated order
    keys make the frame boundary depend on where each event falls
    inside its second — an event 3600.9 s back counts as in-window —
    and the engine's cast-to-long truncation silently disagreed with
    the oracle's fractional date_part('epoch') on exactly the
    sub-second boundary pairs a large corpus always has (the r12 sf1
    replica caught the ±1 count divergence; no such pair exists at
    the sf0.01/0.1 scales, so every smaller gate had passed). A
    trailing hour now means 3600.000000 s in both engines at any
    scale."""
    ev = t(spark, sf_dir, "events").withColumn(
        "_epoch_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (W.partitionBy("user_id").orderBy("_epoch_us")
         .rangeBetween(-3_600_000_000, 0))
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


# --------------------------------------------------- sort / top-k / sample


@register(
    "sort_multi",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC NULLS LAST, o_orderkey
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with nulls placement (range-partitioned
    exchange + in-partition sort; value set is order-insensitively
    hashed by the gate, the sort itself is exercised in tests)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderstatus", "o_orderkey", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"),
            F.desc_nulls_last("o_totalprice"),
            F.asc("o_orderkey"),
        )
    )


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k -> TakeOrderedAndProject: per-partition heap
    of k, merge on driver — never a global sort (A8's ledger lookup is
    the k=2 instance). Unique tie-break keeps it deterministic."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "sample",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE (l_orderkey * 2654435761) % 100 < 5
    """,
)
def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample (~5%) via multiplicative hashing
    on the key — reproducible across engines, unlike Bernoulli
    ``df.sample`` whose RNG is engine-specific (that path is covered in
    tests). At scale this is a scan-side filter: no shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_orderkey") * 2654435761) % 100 < 5).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "sample_hash_split",
    oracle="""
    WITH b AS (
      SELECT CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                         AS BIGINT) % 100 < 80 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                         AS BIGINT) % 100 < 90 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n FROM b GROUP BY split
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(doc_id) —
    the reproducible-at-scale alternative to rand()-based sampling: a
    document lands in the same split on every run, every engine, every
    cluster size (rand() depends on partition layout and seed plumbing
    and cannot be replayed by another engine). One narrow projection,
    no shuffle before the count; at 100 TB the split column is
    computed inline wherever the pipeline needs it, never materialized
    globally."""
    from ..operators.dedup import portable_hash

    d = t(spark, sf_dir, "documents")
    h = portable_hash(F.col("doc_id").cast("string")) % 100
    return (
        d.select(
            F.when(h < 80, "train").when(h < 90, "val")
            .otherwise("test").alias("split"))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "sample_stratified_topk",
    oracle="""
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substr(md5('strat:' ||
                 CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                 doc_id) AS rk
      FROM documents)
    WHERE rk <= 3
    """,
)
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified FIXED-SIZE sampling: exactly 3 docs per source,
    chosen by md5-hash rank — the third sampling regime next to
    mixture_sample (per-stratum RATE) and sample_hash_split (global
    percent split). Hash-rank selection is reproducible across runs,
    engines, and cluster layouts where rand() ordering is not, and
    re-picks (almost) the same rows as strata grow — the property an
    eval-holdout needs. One shuffle on the stratum key; at 100 TB with
    heavy strata, pre-aggregate a per-partition top-k first (the
    standard top-k-per-group rewrite) so no reducer sorts a full
    stratum."""
    from ..operators.dedup import portable_hash

    w = W.partitionBy("source").orderBy(
        portable_hash(F.concat(F.lit("strat:"),
                               F.col("doc_id").cast("string"))),
        "doc_id")
    return (t(spark, sf_dir, "documents")
            .select("source", "doc_id", "n_chars",
                    F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3)
            .drop("rk"))


@register(
    "sample_weighted",
    oracle="""
    SELECT doc_id, n_chars,
           ROUND(CAST(n_chars AS DOUBLE) * 1152921504606846976.0 /
                 (CAST(('0x' || substr(md5('pri:' ||
                    CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0),
                 6) AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT 100
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield-Lund-Thorup, JACM '07): each doc draws priority
    w / u with u uniform on (0, 1] and w = n_chars, and the sample is
    the top-k priorities — inclusion probability grows with weight,
    the scheme's subset-sum estimates are provably near-optimal, and
    (the reason it's here rather than A-Res) priority needs ONE
    multiply and ONE divide, so it is bit-identical across engines
    with no transcendental (``exp``/``ln``) whose last-ulp behavior
    differs between libm and the JVM. The uniform is the md5-derived
    60-bit hash shifted to (0, 1] — reproducible across runs, engines,
    and cluster layouts, and re-picks (almost) the same rows as the
    corpus grows, the eval-holdout property.

    Weighted sampling is the data-mixture primitive quality-weighted
    training pipelines need: w = a quality or dedup-cluster-size
    score, and the sample IS the mixing. At scale ORDER BY + LIMIT
    plans as TakeOrderedAndProject — per-partition partial top-k,
    only k rows per partition reach the driver-side merge; nothing
    global is sorted."""
    from ..operators.dedup import portable_hash

    h = portable_hash(F.concat(F.lit("pri:"),
                               F.col("doc_id").cast("string")))
    pri = F.round(
        F.col("n_chars").cast("double") * F.lit(1152921504606846976.0)
        / (h + F.lit(1.0)), 6)
    return (t(spark, sf_dir, "documents")
            .select("doc_id", "n_chars", pri.alias("priority"))
            .orderBy(F.desc("priority"), F.asc("doc_id"))
            .limit(100))


@register(
    "win_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      FROM events
    ), grp AS (
      SELECT user_id, day,
             day - row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS g
      FROM days
    ), runs AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run_len,
             MIN(day) AS run_start
      FROM grp GROUP BY user_id, g
    ), best AS (
      SELECT user_id, run_len, run_start,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY run_len DESC, run_start) AS rk,
             CAST(SUM(run_len) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_active_days
      FROM runs
    )
    SELECT user_id, run_len AS longest_streak, run_start AS streak_start,
           n_active_days
    FROM best WHERE rk = 1
    ORDER BY longest_streak DESC, user_id
    LIMIT 100
    """,
)
def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands idiom (group key = day − row_number, constant
    within a consecutive run) behind engagement/retention metrics and
    habit scoring. Top-100 by streak (user_id ties deterministic);
    every value is an exact integer.

    100-TB shape: the distinct-day projection partial-combines before
    one user_id shuffle; both windows and the run aggregate share the
    SAME user_id(-superset) partitioning so no further Exchange is
    needed; the final ORDER BY + LIMIT plans as TakeOrderedAndProject
    (per-partition top-k, never a global sort)."""
    days = (t(spark, sf_dir, "events")
            .select("user_id",
                    F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                           " div 86400000000").alias("day"))
            .distinct())
    wg = W.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("g", F.col("day") - F.row_number().over(wg))
    runs = (grp.groupBy("user_id", "g")
            .agg(F.count(F.lit(1)).alias("run_len"),
                 F.min("day").alias("run_start")))
    wb = W.partitionBy("user_id").orderBy(
        F.desc("run_len"), F.asc("run_start"))
    wtot = W.partitionBy("user_id")
    best = (runs
            .withColumn("rk", F.row_number().over(wb))
            .withColumn("n_active_days",
                        F.sum("run_len").over(wtot))
            .filter(F.col("rk") == 1))
    return (best.select("user_id",
                        F.col("run_len").alias("longest_streak"),
                        F.col("run_start").alias("streak_start"),
                        "n_active_days")
            .orderBy(F.desc("longest_streak"), F.asc("user_id"))
            .limit(100))


@register(
    "win_intervals_overlap",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderpriority AS priority,
             epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000
               AS d0,
             MAX(epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
                 // 86400000000) AS d1
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2, 3
    ), deltas AS (
      SELECT priority, d0 AS day, 1 AS delta FROM per_order
      UNION ALL
      SELECT priority, d1 + 1, -1 FROM per_order
    ), daily AS (
      SELECT priority, day,
             CAST(SUM(delta) AS BIGINT) AS net,
             CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS starts
      FROM deltas GROUP BY 1, 2
    ), run AS (
      SELECT priority, day,
             CAST(SUM(net) OVER (
               PARTITION BY priority ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS open_now,
             CAST(SUM(starts) OVER (PARTITION BY priority)
               AS BIGINT) AS n_orders
      FROM daily
    ), best AS (
      SELECT priority, day, open_now, n_orders,
             row_number() OVER (PARTITION BY priority
                                ORDER BY open_now DESC, day) AS rk
      FROM run
    )
    SELECT priority, open_now AS peak_open, day AS peak_day, n_orders
    FROM best WHERE rk = 1
    """,
)
def win_intervals_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per order-priority class — the
    sweep-line idiom: each order is an interval [orderdate,
    max(shipdate)] while it has undelivered lines; the peak count of
    simultaneously-open orders (and the first day it is reached) is
    computed from +1/-1 boundary deltas, NEVER an interval self-join
    (which is O(n^2) in overlapping spans and the classic scale trap
    for concurrency / occupancy / in-flight-inventory questions).

    Every value is an exact integer; peak-day ties break to the
    earliest day.

    100-TB shape: the order--lineitem join and the per-order MAX
    share one l_orderkey shuffle (ReuseExchange); boundary deltas
    partial-combine into the (priority, day) aggregate, so the
    cumulative-sum window runs over the AGGREGATED day series (span-
    bounded, ~2.5k rows per priority) rather than raw orders — the
    serialized-window hazard is capped by calendar length, not data
    volume."""
    per_order = (t(spark, sf_dir, "orders")
                 .select("o_orderkey",
                         F.col("o_orderpriority").alias("priority"),
                         F.expr("unix_micros(CAST(o_orderdate AS"
                                " TIMESTAMP)) div 86400000000")
                         .alias("d0"))
                 .join(t(spark, sf_dir, "lineitem")
                       .select(F.col("l_orderkey").alias("o_orderkey"),
                               F.expr("unix_micros(CAST(l_shipdate AS"
                                      " TIMESTAMP)) div 86400000000")
                               .alias("sd")),
                       "o_orderkey")
                 .groupBy("o_orderkey", "priority", "d0")
                 .agg(F.max("sd").alias("d1")))
    deltas = per_order.select(
        "priority",
        F.explode(F.array(
            F.struct(F.col("d0").alias("day"),
                     F.lit(1).alias("delta")),
            F.struct((F.col("d1") + 1).alias("day"),
                     F.lit(-1).alias("delta")))).alias("e"))
    daily = (deltas.select("priority", "e.day", "e.delta")
             .groupBy("priority", "day")
             .agg(F.sum("delta").alias("net"),
                  F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
                  .alias("starts")))
    wc = (W.partitionBy("priority").orderBy("day")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = (daily
           .withColumn("open_now", F.sum("net").over(wc))
           .withColumn("n_orders",
                       F.sum("starts").over(W.partitionBy("priority"))))
    wb = W.partitionBy("priority").orderBy(F.desc("open_now"), F.asc("day"))
    return (run.withColumn("rk", F.row_number().over(wb))
            .filter(F.col("rk") == 1)
            .select("priority", F.col("open_now").alias("peak_open"),
                    F.col("day").alias("peak_day"), "n_orders"))


@register(
    "win_cumulative_distinct",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      FROM events
    ), days AS (
      SELECT DISTINCT user_id, day FROM ev
    ), firsts AS (
      SELECT user_id, event_type, MIN(day) AS first_day
      FROM ev GROUP BY 1, 2
    ), daily_new AS (
      SELECT user_id, first_day AS day,
             CAST(COUNT(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY 1, 2
    )
    SELECT d.user_id, d.day,
           CAST(COALESCE(dn.n_new, 0) AS BIGINT) AS n_new_types,
           CAST(SUM(COALESCE(dn.n_new, 0)) OVER (
             PARTITION BY d.user_id ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_cum_distinct
    FROM days d LEFT JOIN daily_new dn
      ON d.user_id = dn.user_id AND d.day = dn.day
    """,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct event types per user per active day — the
    running COUNT(DISTINCT) that window functions famously cannot
    express directly (DISTINCT is unsupported in window aggregates in
    every engine). The scalable rewrite: distinct-ness is a property
    of each value's FIRST occurrence, so min(day) per (user, type)
    turns the problem into a plain cumulative SUM of first-occurrence
    counts — one extra aggregate instead of a per-frame distinct scan
    whose state grows with history. All values exact integers.

    100-TB shape: both the first-occurrence and active-day aggregates
    partial-combine before one user_id(-superset) shuffle; the cumsum
    window input is active-days-sized (calendar-bounded per user),
    never raw events; the daily_new side is first-occurrences-only
    (<= |types| rows per user)."""
    ev = (t(spark, sf_dir, "events")
          .select("user_id", "event_type",
                  F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                         " div 86400000000").alias("day")))
    from ..operators.cache import tracked_persist
    ev = tracked_persist(ev)   # feeds both aggregates
    days = ev.select("user_id", "day").distinct()
    daily_new = (ev.groupBy("user_id", "event_type")
                 .agg(F.min("day").alias("day"))
                 .groupBy("user_id", "day")
                 .agg(F.count(F.lit(1)).alias("n_new")))
    wc = (W.partitionBy("user_id").orderBy("day")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    j = (days.join(daily_new, ["user_id", "day"], "left")
         .select("user_id", "day",
                 F.coalesce("n_new", F.lit(0)).cast("long")
                 .alias("n_new_types")))
    return j.withColumn("n_cum_distinct",
                        F.sum("n_new_types").over(wc).cast("long"))


@register(
    "win_skyline",
    oracle="""
    WITH pts AS (
      SELECT p_partkey,
             CAST(CAST(CASE WHEN abs(p_retailprice) <= 1e15 THEN p_retailprice END AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS p_size
      FROM part
      -- dominance needs BOTH dimensions present: a row with a NULL
      -- size or price can neither dominate nor be dominated, so it
      -- is out of skyline contention by contract (and NULL ordering
      -- inside the window differs between engines anyway)
      WHERE p_size IS NOT NULL AND abs(p_retailprice) <= 1e15
    ), best AS (
      SELECT p_partkey, price_cents, p_size,
             MIN(price_cents) OVER (
               ORDER BY p_size, price_cents, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_prev
      FROM pts
    )
    SELECT p_partkey, CAST(price_cents AS DOUBLE) / 100 AS price,
           p_size
    FROM best
    WHERE best_prev IS NULL OR price_cents < best_prev
    """,
)
def win_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier): the parts no other part strictly
    beats on both smaller-size and cheaper-price — the dominance
    operator (cheapest-per-quality tradeoff curves, candidate pruning
    before expensive ranking) that naive SQL writes as an O(n^2)
    NOT-EXISTS anti-self-join. The scalable rewrite: sort by (size,
    price) and a point is on the frontier iff its price beats the
    running MIN over everything sorted before it — ONE window, one
    pass. The (size, price, key) composite order makes equal-size
    groups self-consistent: within a size, only the cheapest survives
    (later equal-size rows see the earlier cheaper price in the
    running min) and ties break deterministically.

    100-TB shape: this demo runs the window unpartitioned (the
    frontier is global) — the production form range-partitions by
    size, computes per-partition frontiers, and merges the bounded
    frontier set (frontier size <= distinct sizes, tiny); the
    anti-self-join alternative can never run at scale. Values exact
    cents/integers; no doubles until display."""
    pts = (t(spark, sf_dir, "part")
           # the oracle's contract: null-dimension rows are out of
           # skyline contention (can't dominate, can't be dominated)
           .filter(F.col("p_size").isNotNull()
                   & (F.abs(F.col("p_retailprice")) <= 1e15))
           .select("p_partkey",
                   (dec("p_retailprice") * 100)
                   .cast("long").alias("price_cents"),
                   F.col("p_size").cast("long").alias("p_size")))
    wb = (W.orderBy("p_size", "price_cents", "p_partkey")
          .rowsBetween(W.unboundedPreceding, -1))
    best = pts.withColumn("best_prev", F.min("price_cents").over(wb))
    return (best.filter(F.col("best_prev").isNull()
                        | (F.col("price_cents") < F.col("best_prev")))
            .select("p_partkey",
                    (F.col("price_cents").cast("double") / F.lit(100))
                    .alias("price"),
                    "p_size"))
