"""Time-series regularization: per-key resampling onto a fixed grid
with forward-fill and linear interpolation.

The reference's feed is event-driven (``check_lakehouse.py:102-123``
polls for whatever files landed); every downstream consumer of such a
feed — dashboards, feature stores, model training — eventually needs
the IRREGULAR event stream regularized onto a fixed time grid, and
monitored. These keys supply that as Spark-first plans:

- ``ts_resample_ffill`` — hourly grid per user, last observation
  carried forward (the feature-store staleness join).
- ``ts_interpolate_linear`` — same grid, gaps linearly interpolated
  between the surrounding observations (edges fall back to
  nearest-observation fill).
- ``ts_rolling_anomaly`` — trailing-window 3-sigma outlier flagging
  per user, with integer-exact rolling moments.

100-TB shape: EVERY step partitions by user_id (or its superset
(user_id, hr)) — observation compaction is a (user, hr) window,
the grid is an explode of per-user [lo, hi] hour spans (never a
global calendar cross join), the fill windows run per user. Grid
size is span-bounded per user and independent of event count, so the
operator's output can be SMALLER than its input on dense feeds. The
demo bound (user_id % 10 = 0, 7-day grid cap) keeps oracle compare
sets small; the plan shape is identical without it.

Determinism: hours are integer ``epoch_us div 3600e6`` — Spark's
``div`` and DuckDB's ``//`` BOTH truncate toward zero (verified:
``-7 // 2 = -3`` in DuckDB), so the bucketing agrees bit-for-bit even
for pre-epoch timestamps (where hour 0 spans (-1h, +1h) — odd but
consistently odd in both engines); the per-hour observation is the
row with max (us, event_id) — total order, no ties; interpolation
arithmetic uses the same IEEE operation order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .base import register, t

_HOUR_US = 3_600_000_000
_GRID_CAP = 7 * 24 - 1  # demo bound: first week of each user's span

# shared oracle CTE: hourly last-observation table + per-user grid
_ORACLE_BASE = f"""
    WITH ev AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             event_id, value
      FROM events WHERE user_id % 10 = 0
    ), obs AS (
      SELECT user_id, hr, value AS v_obs, n
      FROM (
        SELECT user_id, us // {_HOUR_US} AS hr, us, event_id, value,
               row_number() OVER (
                 PARTITION BY user_id, us // {_HOUR_US}
                 ORDER BY us DESC, event_id DESC) AS rn,
               COUNT(*) OVER (
                 PARTITION BY user_id, us // {_HOUR_US}) AS n
        FROM ev)
      WHERE rn = 1
    ), span AS (
      SELECT user_id, MIN(hr) AS lo,
             LEAST(MAX(hr), MIN(hr) + {_GRID_CAP}) AS hi
      FROM obs GROUP BY user_id
    ), grid AS (
      SELECT s.user_id, u.hr
      FROM span s, LATERAL unnest(generate_series(s.lo, s.hi)) AS u(hr)
    ), joined AS (
      SELECT g.user_id, g.hr, o.v_obs, o.n
      FROM grid g LEFT JOIN obs o
        ON g.user_id = o.user_id AND g.hr = o.hr
    )
"""


def _hourly_obs_and_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grid LEFT JOIN hourly-last-observations, the shared front half
    of both keys: (user_id, hr, v_obs nullable, n nullable)."""
    ev = (t(spark, sf_dir, "events")
          .filter(F.col("user_id") % 10 == 0)
          .select("user_id", "event_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                  "value")
          .withColumn("hr", F.expr(f"us div {_HOUR_US}")))
    wh = W.partitionBy("user_id", "hr")
    obs = (ev.withColumn("rn", F.row_number().over(
               wh.orderBy(F.desc("us"), F.desc("event_id"))))
           .withColumn("n", F.count(F.lit(1)).over(wh))
           .filter(F.col("rn") == 1)
           .select("user_id", "hr", F.col("value").alias("v_obs"), "n"))
    span = obs.groupBy("user_id").agg(
        F.min("hr").alias("lo"),
        F.least(F.max("hr"), F.min("hr") + F.lit(_GRID_CAP)).alias("hi"))
    grid = span.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("hr"))
    return grid.join(obs, ["user_id", "hr"], "left")


@register(
    "ts_resample_ffill",
    oracle=_ORACLE_BASE + """
    SELECT user_id, hr,
           last_value(v_obs IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hr
             ROWS UNBOUNDED PRECEDING) AS value_ffill,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events
    FROM joined
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward fill: each user's irregular event
    stream becomes one row per hour carrying the latest observed value
    at or before that hour (NULL until the first observation — the
    grid starts at the first observed hour, so only in theory here).
    The staleness-tolerant feature-store read, as a batch operator."""
    wff = (W.partitionBy("user_id").orderBy("hr")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (_hourly_obs_and_grid(spark, sf_dir)
            .select("user_id", "hr",
                    F.last("v_obs", ignorenulls=True).over(wff)
                     .alias("value_ffill"),
                    F.coalesce("n", F.lit(0)).cast("long").alias("n_events")))


@register(
    "ts_interpolate_linear",
    oracle=_ORACLE_BASE + """
    , ctx AS (
      SELECT user_id, hr, v_obs,
             last_value(v_obs IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hr
               ROWS UNBOUNDED PRECEDING) AS prev_v,
             last_value(CASE WHEN v_obs IS NOT NULL THEN hr END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hr
               ROWS UNBOUNDED PRECEDING) AS prev_hr,
             first_value(v_obs IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(CASE WHEN v_obs IS NOT NULL THEN hr END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_hr
      FROM joined
    )
    SELECT user_id, hr,
           CASE
             WHEN v_obs IS NOT NULL THEN v_obs
             WHEN next_v IS NULL THEN prev_v
             WHEN prev_v IS NULL THEN next_v
             ELSE prev_v + (next_v - prev_v)
                  * (CAST(hr - prev_hr AS DOUBLE)
                     / CAST(next_hr - prev_hr AS DOUBLE))
           END AS value_interp
    FROM ctx
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with linear interpolation: grid gaps take
    ``prev + (next - prev) * dt`` between the surrounding observed
    hours; grid edges (no observation on one side) fall back to the
    nearest observation. Same IEEE operation order in both engines, so
    the oracle hash matches bit-for-bit. Two additional windows on the
    SAME user_id partitioning as the fill — still one event-level
    shuffle plus per-user session-grid work."""
    base = _hourly_obs_and_grid(spark, sf_dir)
    wp = (W.partitionBy("user_id").orderBy("hr")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = (W.partitionBy("user_id").orderBy("hr")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    obs_hr = F.when(F.col("v_obs").isNotNull(), F.col("hr"))
    ctx = (base
           .withColumn("prev_v", F.last("v_obs", ignorenulls=True).over(wp))
           .withColumn("prev_hr", F.last(obs_hr, ignorenulls=True).over(wp))
           .withColumn("next_v", F.first("v_obs", ignorenulls=True).over(wn))
           .withColumn("next_hr", F.first(obs_hr, ignorenulls=True).over(wn)))
    dt = ((F.col("hr") - F.col("prev_hr")).cast("double")
          / (F.col("next_hr") - F.col("prev_hr")).cast("double"))
    interp = (F.when(F.col("v_obs").isNotNull(), F.col("v_obs"))
              .when(F.col("next_v").isNull(), F.col("prev_v"))
              .when(F.col("prev_v").isNull(), F.col("next_v"))
              .otherwise(F.col("prev_v")
                         + (F.col("next_v") - F.col("prev_v")) * dt))
    return ctx.select("user_id", "hr", interp.alias("value_interp"))


@register(
    "ts_rolling_anomaly",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN abs(value) <= 1e15  -- representable-cents guard
                  THEN CAST(round(value * 100) AS BIGINT) END AS cents
      FROM events
    ), st AS (
      SELECT user_id, event_id, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS s,
             CAST(SUM(cents * cents) OVER w AS BIGINT) AS ss,
             COUNT(*) OVER w AS n
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           CAST(cents AS DOUBLE) / 100.0 AS value,
           (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS mean_prev,
           CAST(n AS BIGINT) AS n_prev
    FROM st
    WHERE n >= 12
      AND (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          * (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          > 9.0 * ((CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   / CAST(n - 1 AS DOUBLE))
    """,
)
def ts_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flagging: an event is anomalous when it
    deviates > 3 sigma from the trailing 24-event window of ITS OWN
    user's history (current row excluded — no self-contamination).

    Cross-engine determinism the standard formulation can't give:
    rolling mean/variance built from INTEGER-CENT ``sum`` and
    ``sum of squares`` window aggregates — exact in both engines
    regardless of their window-summation internals — then identical
    IEEE double expressions; the 3-sigma test compares squared
    deviation to 9·variance, avoiding sqrt. One user_id Exchange;
    the frame is row-bounded so window state is O(24) per user at any
    scale."""
    # representable-cents guard (streaming/stateful.py CENTS_MAX_ABS):
    # out-of-domain values (NaN, ±Inf, |v|>1e15) carry NULL cents —
    # under ANSI mode a bare cast aborts the job on one corrupt double
    v = F.col("value")
    cents = F.when(F.abs(v) <= 1e15, F.round(v * 100).cast("long"))
    ev = (t(spark, sf_dir, "events")
          .select("user_id", "event_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                  cents.alias("cents")))
    w = (W.partitionBy("user_id").orderBy("us", "event_id")
         .rowsBetween(-24, -1))
    st = (ev
          .withColumn("s", F.sum("cents").over(w))
          .withColumn("ss", F.sum(F.col("cents") * F.col("cents")).over(w))
          .withColumn("n", F.count(F.lit(1)).over(w)))
    x = F.col("cents").cast("double")
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    dev = x - sd / nd
    var = (F.col("ss").cast("double") - sd * sd / nd) \
        / (F.col("n") - 1).cast("double")
    return (st.filter((F.col("n") >= 12) & (dev * dev > F.lit(9.0) * var))
            .select("user_id", "event_id",
                    (x / F.lit(100.0)).alias("value"),
                    ((sd / nd) / F.lit(100.0)).alias("mean_prev"),
                    F.col("n").cast("long").alias("n_prev")))


# ------------------------------------------------------------ EWMA smoothing

_EWMA_LAGS = 16  # window: current row + 15 lags; alpha = 1/2


def _ewma_oracle() -> str:
    terms, norms = [], []
    for k in range(_EWMA_LAGS):
        w = repr(0.5 ** k)
        x = "cents" if k == 0 else f"lag(cents, {k}) OVER w"
        terms.append(
            f"CASE WHEN {x} IS NOT NULL"
            f" THEN CAST({x} AS DOUBLE) * {w} ELSE 0.0 END")
        norms.append(
            f"CASE WHEN {x} IS NOT NULL THEN {w} ELSE 0.0 END")
    return f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN abs(value) <= 1e15  -- representable-cents guard
                  THEN CAST(round(value * 100) AS BIGINT) END AS cents
      FROM events WHERE user_id % 5 = 0
    )
    SELECT user_id, event_id,
           CAST(cents AS DOUBLE) / 100.0 AS value,
           -- NULLIF: a window whose EVERY tap is NULL/out-of-domain
           -- has no defined EWMA — NULL, not a divide-by-zero abort
           -- (surfaced by the composed null+extremes sweep at sf0.01)
           (({" + ".join(terms)})
            / NULLIF({" + ".join(norms)}, 0.0)) / 100.0 AS ewma
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    """


@register("ts_ewma", oracle=_ewma_oracle())
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2) of each
    user's value stream, truncated at 16 taps (weight 2^-15 ~ 3e-5 —
    below float-noise for this data).

    The recursive EWMA can't be a plain window aggregate, but the
    TRUNCATED form is a finite FIR filter: sum_k lag_k * alpha^k over
    a bounded lag fan, renormalized by the weights actually present
    (exact warm-up at partition heads, no bias). Determinism by
    construction: integer cents times dyadic 2^-k weights are exact
    doubles whose 35-bit value span sums without rounding in ANY
    order, so Spark and DuckDB agree bit-for-bit. One user_id
    Exchange; 16 lag reads share a single sort — window state is
    O(16) per user at any scale."""
    ev = (t(spark, sf_dir, "events")
          .filter(F.col("user_id") % 5 == 0)
          .select("user_id", "event_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                  F.when(F.abs(F.col("value")) <= 1e15,
                         F.round(F.col("value") * 100).cast("long"))
                  .alias("cents")))  # domain guard, see ts_rolling_anomaly
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    wsum, nsum = F.lit(0.0), F.lit(0.0)
    for k in range(_EWMA_LAGS):
        x = F.col("cents") if k == 0 else F.lag("cents", k).over(w)
        wt = F.lit(0.5 ** k)
        wsum = wsum + F.when(x.isNotNull(), x.cast("double") * wt) \
                       .otherwise(F.lit(0.0))
        nsum = nsum + F.when(x.isNotNull(), wt).otherwise(F.lit(0.0))
    return ev.select(
        "user_id", "event_id",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("value"),
        # oracle's NULLIF: an all-NULL 16-tap window has no EWMA
        (F.when(nsum > 0, wsum / nsum) / F.lit(100.0)).alias("ewma"))


_DAY_US = 86_400_000_000
_AC_CAP = 119  # demo bound: first 120 days of each type's span


@register(
    "ts_autocorr",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US} AS day
      FROM events
    ), cnt AS (
      SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev GROUP BY 1, 2
    ), span AS (
      SELECT event_type, MIN(day) AS lo,
             LEAST(MAX(day), MIN(day) + {_AC_CAP}) AS hi
      FROM cnt GROUP BY 1
    ), grid AS (
      SELECT s.event_type, u.day
      FROM span s, LATERAL unnest(generate_series(s.lo, s.hi)) AS u(day)
    ), series AS (
      SELECT g.event_type, g.day, COALESCE(c.c, 0) AS x
      FROM grid g LEFT JOIN cnt c
        ON g.event_type = c.event_type AND g.day = c.day
    ), lagged AS (
      SELECT event_type, x,
             lead(x) OVER (PARTITION BY event_type ORDER BY day) AS y
      FROM series
    ), m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(y) AS sy, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM lagged WHERE y IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n AS n_pairs,
           -- NULLIF: a constant (zero-variance) series has no defined
           -- correlation — NULL, not a divide-by-zero error
           ROUND((n * sxy - sx * sy) /
                 NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                        sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6)
             AS autocorr_lag1
    FROM m
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's DAILY volume — the
    seasonality/burstiness probe behind monitoring and
    forecast-readiness checks. The series is zero-filled over the
    type's (capped) day span — a sparse series without the fill
    silently skips gap days and overstates correlation. All moment
    sums are INTEGER (daily counts), so the Pearson numerator and
    variance terms are exact in both engines; one shared double
    formula + round(6) at the end, the ``agg_stddev_corr`` recipe.

    100-TB shape: the count agg partial-combines to |types| x days
    rows, the grid explodes from a |types|-row span table (never a
    calendar cross join), and the lead window partitions by
    event_type — per-type state is one row."""
    ev = (t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}")
                  .alias("day")))
    cnt = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c"))
    span = cnt.groupBy("event_type").agg(
        F.min("day").alias("lo"),
        F.least(F.max("day"), F.min("day") + F.lit(_AC_CAP)).alias("hi"))
    grid = span.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    series = (grid.join(cnt, ["event_type", "day"], "left")
              .select("event_type", "day",
                      F.coalesce(F.col("c"), F.lit(0)).alias("x")))
    w = W.partitionBy("event_type").orderBy("day")
    lagged = (series
              .withColumn("y", F.lead("x").over(w))
              .filter(F.col("y").isNotNull()))
    m = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"), F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n, sx, sxx, sy, syy, sxy = (
        F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    # nullif on the denominator: a constant (zero-variance) series —
    # e.g. a sparse group whose capped span is all zero-fill — has no
    # defined correlation; NULL, never an ANSI divide-by-zero
    denom = F.nullif(
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double")), F.lit(0.0))
    return m.select(
        "event_type", n.alias("n_pairs"),
        F.round((n * sxy - sx * sy) / denom, 6).alias("autocorr_lag1"))


@register(
    "ts_changepoint",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US} AS day
      FROM events
    ), cnt AS (
      SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev GROUP BY 1, 2
    ), span AS (
      SELECT event_type, MIN(day) AS lo,
             LEAST(MAX(day), MIN(day) + {_AC_CAP}) AS hi
      FROM cnt GROUP BY 1
    ), grid AS (
      SELECT s.event_type, u.day
      FROM span s, LATERAL unnest(generate_series(s.lo, s.hi)) AS u(day)
    ), series AS (
      SELECT g.event_type, g.day, COALESCE(c.c, 0) AS x
      FROM grid g LEFT JOIN cnt c
        ON g.event_type = c.event_type AND g.day = c.day
    ), tot AS (
      -- whole-partition windows, not GROUP BY + JOIN: mirrors the
      -- r16 one-pass Spark plan AND keeps a NULL event_type as its
      -- own series (the old inner join dropped the NULL group —
      -- engine-divergent under the null-injection sweep)
      SELECT event_type, day, x,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS d,
             CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT)
               AS t
      FROM series
    ), cs AS (
      SELECT event_type, day, d AS n_days,
             CAST(SUM(d * x - t) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cusum
      FROM tot
    ), rk AS (
      SELECT *, row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(cusum) DESC, day) AS rk
      FROM cs
    )
    SELECT event_type, day AS cp_day, cusum, n_days,
           ROUND(CAST(cusum AS DOUBLE) / n_days, 6) AS mean_shift
    FROM rk WHERE rk = 1
    """,
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on each event type's daily volume
    (zero-filled over the capped day span, like ``ts_autocorr``): the
    day where the cumulative deviation from the span mean peaks is the
    classic single-changepoint estimate (Page's CUSUM / binary
    segmentation's first split) — regime-shift detection for
    monitoring and pipeline drift alerts.

    Exactness: the per-day deviation is scaled by the span length —
    ``dev = D*x - T`` (so no fractional mean appears) — making the
    cumulative sums pure BIGINT arithmetic, order-independent and
    hash-identical across engines; the argmax tie-breaks to the
    earliest day deterministically, and only the final reported
    ``mean_shift`` (cusum/D) divides into a double.

    100-TB shape: the daily count agg partial-combines to
    |types| x days rows; the cumulative window partitions by
    event_type over the bounded span; argmax is a row_number over the
    same partitioning — nothing global, nothing driver-side.

    Plan shape (r16): the zero-filled series is derived ONCE. The
    original plan computed the per-type totals as a groupBy+join back
    onto the series, which re-executed the whole grid-explode +
    daily-count subtree (a second full events scan) — caught by the
    tools/plan_lint.py full-registry build gate on its first run.
    The totals are now whole-partition window aggregates over the
    SAME event_type partitioning the cusum window uses, so the plan
    is one scan, one exchange, three window specs sharing it.
    Per-type partitions are bounded (span is capped at {_AC_CAP}
    days), so the whole-partition window is skew-safe."""
    ev = (t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_DAY_US}")
                  .alias("day")))
    cnt = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c"))
    span = cnt.groupBy("event_type").agg(
        F.min("day").alias("lo"),
        F.least(F.max("day"), F.min("day") + F.lit(_AC_CAP)).alias("hi"))
    grid = span.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    series = (grid.join(cnt, ["event_type", "day"], "left")
              .select("event_type", "day",
                      F.coalesce(F.col("c"), F.lit(0)).alias("x")))
    wall = W.partitionBy("event_type")
    tot = series.select(
        "event_type", "day", "x",
        F.count(F.lit(1)).over(wall).alias("d"),
        F.sum("x").over(wall).alias("t"))
    wcs = (W.partitionBy("event_type").orderBy("day")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    cs = (tot
          .select("event_type", "day", F.col("d").alias("n_days"),
                  F.sum(F.col("d") * F.col("x") - F.col("t")).over(wcs)
                  .alias("cusum")))
    wrk = W.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day"))
    return (cs.withColumn("rk", F.row_number().over(wrk))
            .filter(F.col("rk") == 1)
            .select("event_type", F.col("day").alias("cp_day"),
                    "cusum", "n_days",
                    F.round(F.col("cusum").cast("double")
                            / F.col("n_days"), 6).alias("mean_shift")))


@register(
    "ts_seasonality",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US}) % 7 AS dow_idx
      FROM events
    ), cnt AS (
      SELECT event_type, dow_idx, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1, 2
    ), m AS (
      SELECT event_type, dow_idx, n,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
               AS total,
             CAST(MAX(n) OVER (PARTITION BY event_type) AS BIGINT)
               AS peak
      FROM cnt
    )
    SELECT event_type, dow_idx, n,
           CAST(n AS DOUBLE) / total AS share,
           CAST(7 * peak AS DOUBLE) / total AS peak_ratio
    FROM m
    """,
)
def ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: volume share
    by weekday plus the peak ratio (7·max/total — 1.0 means perfectly
    flat, 7.0 means all volume on one weekday), the weekly-cycle
    probe behind capacity planning and burst diagnosis. The weekday
    index is the EPOCH-DAY mod 7 (0 = Thursday) — derived from the
    same integer day arithmetic both engines share, deliberately
    avoiding calendar APIs whose week-start conventions differ across
    engines. Counts are exact integers; share and peak_ratio are one
    division each on exact-int doubles — bit-identical, no rounding.

    100-TB shape: the count agg partial-combines to ≤ |types|×7 rows
    per partition before its shuffle, and the per-type total/peak
    ride WINDOWS over the ≤ |types|×7 rowset (one event_type
    Exchange) rather than a separate aggregate branch — a groupBy +
    self-join formulation re-scans events for the moment side (4
    Exchanges measured vs this plan's 2)."""
    from pyspark.sql import Window as W

    ev = (t(spark, sf_dir, "events")
          .select("event_type",
                  (F.expr(f"unix_micros(CAST(ts AS TIMESTAMP))"
                          f" div {_DAY_US}") % 7).alias("dow_idx")))
    cnt = ev.groupBy("event_type", "dow_idx").agg(
        F.count(F.lit(1)).alias("n"))
    wt = W.partitionBy("event_type")
    m = cnt.select(
        "event_type", "dow_idx", "n",
        F.sum("n").over(wt).alias("total"),
        F.max("n").over(wt).alias("peak"))
    return m.select(
        "event_type", "dow_idx", "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
        ((F.lit(7) * F.col("peak")).cast("double")
         / F.col("total")).alias("peak_ratio"))


@register(
    "ts_linreg_trend",
    oracle="""
    WITH daily AS (
      SELECT s.s_nationkey AS nation,
             epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000
               AS day,
             CAST(SUM(CASE WHEN abs(l.l_extendedprice) <= 1e15
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) END)
                  * 100
                  AS HUGEINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), mn AS (
      SELECT MIN(day) AS day0 FROM daily
    ), xy AS (
      SELECT nation, day - mn.day0 AS x, cents AS y
      FROM daily CROSS JOIN mn
    ), sums AS (
      SELECT nation,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             SUM(y) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM xy GROUP BY nation
    )
    SELECT nation,
           CAST(n AS BIGINT) AS n_days,
           CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE)
             AS slope_cents_per_day,
           CAST((CAST(sy AS DOUBLE)
                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                AS DOUBLE) AS intercept_cents,
           CAST(CAST(sy AS DOUBLE) / 100 AS DOUBLE) AS total_revenue
    FROM sums
    """,
)
def ts_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend of daily shipped revenue — the
    feature-store / monitoring primitive "is this series growing and
    how fast" as a closed-form aggregate, not an iterative fit. The
    slope comes from the textbook normal equations over EXACT integer
    power sums: x = day offset from the corpus min day (a 1-row
    broadcast, keeps x small), y = daily revenue in DECIMAL-cents,
    and n/Sx/Sy/Sxy/Sxx accumulate as 128-bit integers (Spark
    DECIMAL(38,0), DuckDB HUGEINT) so no sum can overflow below
    1e38 — order-independent and bit-reproducible on any cluster
    layout, where a naive double accumulation would drift by
    partitioning. Only the FINAL slope/intercept divisions are IEEE,
    written as one identical expression in both engines.

    100-TB shape: the (nation, day) daily rollup partial-combines
    before its shuffle; the power-sum agg collapses 25 nations x
    ~2.5k days to 25 rows; supplier attaches by broadcast (dim-sized);
    nothing iterative, nothing driver-side but the 1-row min."""
    li = (t(spark, sf_dir, "lineitem")
          .select("l_suppkey",
                  F.expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                         " div 86400000000").alias("day"),
                  F.when(F.abs(F.col("l_extendedprice")) <= 1e15,
                         F.col("l_extendedprice").cast("decimal(18,2)"))
                  .alias("price")))
    sup = (t(spark, sf_dir, "supplier")
           .select(F.col("s_suppkey").alias("l_suppkey"),
                   F.col("s_nationkey").alias("nation")))
    daily = (li.join(F.broadcast(sup), "l_suppkey")
             .groupBy("nation", "day")
             .agg((F.sum("price") * 100).cast("decimal(38,0)")
                  .alias("cents")))
    mn = daily.agg(F.min("day").alias("day0"))
    xy = (daily.crossJoin(F.broadcast(mn))
          .select("nation",
                  (F.col("day") - F.col("day0")).alias("x"),
                  F.col("cents").alias("y")))
    d38 = "decimal(38,0)"
    sums = xy.groupBy("nation").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"))
    num = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx")
           - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return sums.select(
        "nation",
        F.col("n").cast("long").alias("n_days"),
        slope.alias("slope_cents_per_day"),
        ((F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
         / F.col("n").cast("double")).alias("intercept_cents"),
        (F.col("sy").cast("double") / F.lit(100)).alias("total_revenue"))


@register(
    "ts_crosscorr",
    oracle="""
    WITH daily AS (
      SELECT s.s_nationkey AS nation,
             epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000
               AS day,
             CAST(SUM(CASE WHEN abs(l.l_extendedprice) <= 1e15
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) END)
                  * 100
                  AS HUGEINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), pairs AS (
      SELECT a.nation AS nation_a, b.nation AS nation_b,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(a.cents) AS sx, SUM(b.cents) AS sy,
             SUM(a.cents * b.cents) AS sxy,
             SUM(a.cents * a.cents) AS sxx,
             SUM(b.cents * b.cents) AS syy
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.nation < b.nation
      GROUP BY 1, 2
    )
    SELECT nation_a, nation_b, CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
    FROM pairs
    """,
)
def ts_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the 25 nations' daily shipped
    revenue — the co-movement matrix ("which markets move together")
    behind portfolio-style monitoring and redundancy analysis of data
    sources. NOT Spark's `corr` (float accumulation order differs per
    partitioning): the five cross sums accumulate as 128-bit integers
    over exact cents (Spark DECIMAL(38,0), DuckDB HUGEINT), and the
    Pearson value is ONE shared IEEE expression — the numerator and
    the two variance terms are exact integers cast to double, with
    sqrt (correctly rounded everywhere) rather than pow.

    100-TB shape: the daily rollup partial-combines lineitems down
    to ~25 x 2.5k rows before the self-join; the pair join shuffles
    on day with fan-out bounded by |nations| per side, and the pair
    agg collapses to a 300-row triangle. Raw data is touched exactly
    once."""
    from ..operators.cache import tracked_persist

    li = (t(spark, sf_dir, "lineitem")
          .select("l_suppkey",
                  F.expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                         " div 86400000000").alias("day"),
                  F.when(F.abs(F.col("l_extendedprice")) <= 1e15,
                         F.col("l_extendedprice").cast("decimal(18,2)"))
                  .alias("price")))
    sup = (t(spark, sf_dir, "supplier")
           .select(F.col("s_suppkey").alias("l_suppkey"),
                   F.col("s_nationkey").alias("nation")))
    daily = (li.join(F.broadcast(sup), "l_suppkey")
             .groupBy("nation", "day")
             .agg((F.sum("price") * 100).cast("decimal(38,0)")
                  .alias("cents")))
    daily = tracked_persist(daily)   # both sides of the self-join
    a = daily.select(F.col("nation").alias("nation_a"), "day",
                     F.col("cents").alias("xa"))
    b = daily.select(F.col("nation").alias("nation_b"), "day",
                     F.col("cents").alias("xb"))
    pairs = (a.join(b, "day")
             .filter(F.col("nation_a") < F.col("nation_b"))
             .groupBy("nation_a", "nation_b")
             .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
                  F.sum("xa").alias("sx"), F.sum("xb").alias("sy"),
                  F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
                  F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
                  F.sum(F.col("xb") * F.col("xb")).alias("syy")))
    num = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx")
          - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy")
          - F.col("sy") * F.col("sy")).cast("double")
    return pairs.select(
        "nation_a", "nation_b",
        F.col("n").cast("long").alias("n_days"),
        (num / (F.sqrt(dx) * F.sqrt(dy))).alias("corr"))


@register(
    "ts_monthly_growth",
    oracle="""
    WITH monthly AS (
      SELECT s.s_nationkey AS nation,
             CAST(date_part('year', CAST(l.l_shipdate AS DATE)) * 100
                  + date_part('month', CAST(l.l_shipdate AS DATE))
                  AS BIGINT) AS ym,
             CAST(SUM(CASE WHEN abs(l.l_extendedprice) <= 1e15
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) END)
                  * 100
                  AS BIGINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), lagged AS (
      SELECT nation, ym, cents,
             lag(cents) OVER (PARTITION BY nation ORDER BY ym)
               AS prev_cents
      FROM monthly
    )
    SELECT nation, ym,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(cents - prev_cents AS BIGINT) AS delta_cents,
           CAST(cents - prev_cents AS DOUBLE)
             / CAST(NULLIF(prev_cents, 0) AS DOUBLE) AS growth
    FROM lagged
    """,
)
def ts_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the
    period-over-period BI primitive (lag + ratio) every dashboard
    derives. Months key as the integer year*100+month (calendar
    months, not fixed-width epoch buckets); revenue goes through the
    DECIMAL-cents convention so the level and delta columns are exact
    integers; growth is ONE shared IEEE divide. First months
    correctly surface NULL delta/growth (no prior period) rather
    than a fabricated zero.

    100-TB shape: raw lineitems partial-combine into the ~25 x 84
    (nation, month) grid before any window; the lag window then runs
    over the aggregated series partitioned by nation — window input
    is calendar-bounded, independent of row count; supplier attaches
    by broadcast."""
    li = (t(spark, sf_dir, "lineitem")
          .select("l_suppkey",
                  (F.year(F.col("l_shipdate").cast("date")) * 100
                   + F.month(F.col("l_shipdate").cast("date")))
                  .cast("long").alias("ym"),
                  F.when(F.abs(F.col("l_extendedprice")) <= 1e15,
                         F.col("l_extendedprice").cast("decimal(18,2)"))
                  .alias("price")))
    sup = (t(spark, sf_dir, "supplier")
           .select(F.col("s_suppkey").alias("l_suppkey"),
                   F.col("s_nationkey").alias("nation")))
    monthly = (li.join(F.broadcast(sup), "l_suppkey")
               .groupBy("nation", "ym")
               .agg((F.sum("price") * 100).cast("long").alias("cents")))
    wl = W.partitionBy("nation").orderBy("ym")
    lagged = monthly.withColumn("prev_cents",
                                F.lag("cents").over(wl))
    return lagged.select(
        "nation", "ym",
        (F.col("cents").cast("double") / F.lit(100)).alias("revenue"),
        (F.col("cents") - F.col("prev_cents")).cast("long")
        .alias("delta_cents"),
        # growth from a ZERO base is undefined, not infinite: NULLIF
        # folds it to NULL in both engines. Found by the r12 composed
        # kitchen-sink — a sparse time-edge month whose only surviving
        # price is an injected 0.0 makes prev_cents 0, and ANSI Spark
        # raises DIVIDE_BY_ZERO where the clean corpus never could.
        ((F.col("cents") - F.col("prev_cents")).cast("double")
         / F.nullif(F.col("prev_cents"), F.lit(0)).cast("double"))
        .alias("growth"))
