"""Semantic laws for the time-series resample keys — the invariants a
hash mismatch can't explain: grid completeness, fill/interp bounds,
exactness at observed hours."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_automation_spark.queries import REGISTRY

SF_SMOKE = "/root/testdata/sf0.001"


def run(key, spark, sf=SF_SMOKE):
    return REGISTRY[key].fn(spark, sf)


def test_ffill_grid_is_dense_and_carries_last_obs(spark):
    ff = run("ts_resample_ffill", spark).cache()
    rows = ff.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user, "no users selected"
    for u, rs in by_user.items():
        hrs = sorted(r.hr for r in rs)
        # dense: every hour between lo and hi present exactly once
        assert hrs == list(range(hrs[0], hrs[-1] + 1)), u
        rs.sort(key=lambda r: r.hr)
        # first grid row is an observed hour (grid starts at first obs)
        assert rs[0].n_events > 0 and rs[0].value_ffill is not None
        # carry-forward: value changes ONLY on observed hours
        for a, b in zip(rs, rs[1:]):
            if b.n_events == 0:
                assert b.value_ffill == a.value_ffill, (u, b.hr)
    # some hours genuinely unobserved, or the fill proves nothing
    assert any(r.n_events == 0 for r in rows)
    ff.unpersist()


def test_interp_exact_at_obs_and_bounded_between(spark):
    ff = run("ts_resample_ffill", spark)
    ip = run("ts_interpolate_linear", spark)
    j = (ip.join(ff, ["user_id", "hr"]).orderBy("user_id", "hr")).collect()
    assert j
    interp_strict = 0
    by_user = {}
    for r in j:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        obs = [(r.hr, r.value_ffill) for r in rs if r.n_events > 0]
        for r in rs:
            if r.n_events > 0:
                # exact at observations (ffill value IS the obs value)
                assert r.value_interp == r.value_ffill, (u, r.hr)
            else:
                prev = max((o for o in obs if o[0] < r.hr),
                           default=None)
                nxt = min((o for o in obs if o[0] > r.hr),
                          default=None)
                if prev and nxt:
                    lo, hi = sorted((prev[1], nxt[1]))
                    assert lo - 1e-9 <= r.value_interp <= hi + 1e-9, (u, r.hr)
                    if prev[1] != nxt[1]:
                        interp_strict += 1
                elif prev:
                    assert r.value_interp == prev[1]
                elif nxt:
                    assert r.value_interp == nxt[1]
    assert interp_strict > 0, "no gap actually interpolated"


def test_rolling_anomaly_flags_verified_by_recompute(spark):
    """Every flagged event must genuinely deviate >3 sigma from its
    trailing window, recomputed independently row-by-row in Python;
    and at least one unflagged event with a full window must exist
    (the filter is not vacuous)."""
    import math

    flagged = {(r.user_id, r.event_id): r
               for r in run("ts_rolling_anomaly", spark).collect()}
    ev = (REGISTRY["ts_rolling_anomaly"].fn.__globals__["t"](
              spark, SF_SMOKE, "events")
          .select("user_id", "event_id", "ts", "value").collect())
    by_user = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    n_checked = unflagged_full = 0
    for u, rows in by_user.items():
        cents = [round(r.value * 100) for r in rows]
        for i, r in enumerate(rows):
            w = cents[max(0, i - 24):i]
            key = (u, r.event_id)
            if len(w) < 12:
                assert key not in flagged
                continue
            mean = sum(w) / len(w)
            var = (sum(c * c for c in w) - sum(w) ** 2 / len(w)) / (len(w) - 1)
            is_anom = (cents[i] - mean) ** 2 > 9.0 * var
            assert (key in flagged) == is_anom, (key, cents[i], mean, var)
            if key in flagged:
                n_checked += 1
                assert math.isclose(flagged[key].mean_prev, mean / 100)
            else:
                unflagged_full += 1
    assert n_checked > 0 and unflagged_full > 0


# ------------------------------------------------------------------ EWMA

def test_ewma_is_convex_and_exact_at_heads(spark):
    """EWMA laws: weights renormalize to 1, so the output is a convex
    combination of the trailing 16 values — bounded by their min/max —
    and a user's FIRST event has ewma == value exactly."""
    out = run("ts_ewma", spark).collect()
    assert out
    ev = (REGISTRY["ts_ewma"].fn.__globals__["t"](
        spark, SF_SMOKE, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select("user_id", "event_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                (F.round(F.col("value") * 100) / 100).alias("v"))
        .collect())
    hist = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.us, r.event_id)):
        hist.setdefault(r.user_id, []).append((r.event_id, r.v))
    got = {(r.user_id, r.event_id): r.ewma for r in out}
    assert len(got) == len(ev)
    checked_head = checked_mid = 0
    for u, seq in hist.items():
        for i, (eid, v) in enumerate(seq):
            e = got[(u, eid)]
            window = [x for _, x in seq[max(0, i - 15):i + 1]]
            assert min(window) - 1e-9 <= e <= max(window) + 1e-9, (u, eid)
            if i == 0:
                assert e == v, (u, eid)  # exact: single-tap renorm
                checked_head += 1
            elif i >= 16:
                checked_mid += 1
    assert checked_head and checked_mid


def test_ewma_replays_in_python(spark):
    """Direct replay: the truncated FIR sum recomputed row-by-row in
    Python (same dyadic weights) must match the Spark output to the
    last bit — the arithmetic is exact by construction."""
    ev = (REGISTRY["ts_ewma"].fn.__globals__["t"](
        spark, SF_SMOKE, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select("user_id", "event_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                F.round(F.col("value") * 100).cast("long").alias("cents"))
        .collect())
    hist = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.us, r.event_id)):
        hist.setdefault(r.user_id, []).append((r.event_id, r.cents))
    got = {(r.user_id, r.event_id): r.ewma for r in run("ts_ewma", spark).collect()}
    for u, seq in hist.items():
        for i, (eid, _) in enumerate(seq):
            taps = [c for _, c in reversed(seq[max(0, i - 15):i + 1])]
            wsum = sum(float(c) * 0.5 ** k for k, c in enumerate(taps))
            nsum = sum(0.5 ** k for k in range(len(taps)))
            assert got[(u, eid)] == (wsum / nsum) / 100.0, (u, eid)


def test_autocorr_bounds_and_pandas_replay(spark):
    """autocorr in [-1, 1]; n_pairs = capped span - 1; and the whole
    computation replays exactly in pandas from the raw events."""
    import pandas as pd

    out = {r.event_type: r for r in run("ts_autocorr", spark).collect()}
    assert out, "no event types"
    ev = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
          .select("event_type",
                  F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                         " div 86400000000").alias("day"))
          .toPandas())
    for et, g in ev.groupby("event_type"):
        cnt = g.groupby("day").size()
        lo, hi = cnt.index.min(), min(cnt.index.max(), cnt.index.min() + 119)
        series = cnt.reindex(range(lo, hi + 1), fill_value=0)
        x = series.values[:-1].astype("int64")
        y = series.values[1:].astype("int64")
        r = out[et]
        assert r.n_pairs == len(x)
        assert -1.0 <= r.autocorr_lag1 <= 1.0
        n = len(x)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = ((n * int((x * x).sum()) - int(x.sum()) ** 2) ** 0.5
               * (n * int((y * y).sum()) - int(y.sum()) ** 2) ** 0.5)
        assert abs(r.autocorr_lag1 - round(num / den, 6)) <= 1e-6, et


def test_changepoint_replays_in_python(spark):
    """CUSUM changepoint: exact integer replay — per type, the
    reported day maximizes |cusum| (earliest on ties) and the cusum /
    n_days / mean_shift values match the python computation."""
    out = {r.event_type: r for r in run("ts_changepoint", spark).collect()}
    assert out, "no event types"
    ev = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
          .select("event_type",
                  F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                         " div 86400000000").alias("day"))
          .toPandas())
    for et, g in ev.groupby("event_type"):
        cnt = g.groupby("day").size()
        lo, hi = cnt.index.min(), min(cnt.index.max(), cnt.index.min() + 119)
        xs = [int(cnt.get(d, 0)) for d in range(lo, hi + 1)]
        d_ct, tot = len(xs), sum(xs)
        best_day, best_cs, cs = None, None, 0
        for off, x in enumerate(xs):
            cs += d_ct * x - tot
            if best_cs is None or abs(cs) > abs(best_cs):
                best_day, best_cs = lo + off, cs
        r = out[et]
        assert (r.cp_day, r.cusum, r.n_days) == (best_day, best_cs, d_ct)
        assert r.mean_shift == round(best_cs / d_ct, 6)


def test_seasonality_shares_and_peak(spark):
    """Per-type weekday shares sum to 1, peak_ratio = 7·max share,
    and counts replay exactly from the raw events."""
    rows = run("ts_seasonality", spark).collect()
    assert rows
    ev = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
          .select("event_type",
                  (F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                          " div 86400000000") % 7).alias("dow"))
          .collect())
    cnt = {}
    for r in ev:
        cnt[(r.event_type, r.dow)] = cnt.get((r.event_type, r.dow), 0) + 1
    assert {(r.event_type, r.dow_idx): r.n for r in rows} == cnt
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        total = sum(r.n for r in rs)
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-12
        peak = max(r.n for r in rs)
        for r in rs:
            assert r.share == r.n / total
            assert r.peak_ratio == 7 * peak / total


def test_ewma_all_null_window_is_null_not_divide_by_zero(spark, tmp_path):
    """A user whose every value in the 16-tap window is out-of-domain
    (NULL cents) has NO defined EWMA: the renormalizing weight sum is
    0 and under ANSI mode the bare division aborted the job (surfaced
    by the composed null+extremes sweep at sf0.01). The fixed form
    yields NULL — mirrored by the oracle's NULLIF."""
    import math

    ev = spark.createDataFrame(
        [(0, i, f"2024-01-01 00:0{i}:00", math.inf) for i in range(3)],
        "user_id long, event_id long, ts string, value double")
    path = str(tmp_path / "events.parquet")
    ev.select("user_id", "event_id",
              F.col("ts").cast("timestamp_ntz").alias("ts"),
              "value").write.parquet(path)
    out = REGISTRY["ts_ewma"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert all(r["ewma"] is None for r in out), out
    assert all(r["value"] is None for r in out)  # Inf folds out-of-domain


def test_monthly_growth_zero_base_is_null_not_divide_by_zero(spark, tmp_path):
    """A month whose revenue nets to exactly 0 cents has NO defined
    month-over-month growth for its successor: under ANSI mode the
    bare division aborted the job (surfaced by the r12 composed
    kitchen-sink — a sparse time-edge month whose only surviving
    price was an injected 0.0). The fixed form yields NULL, mirrored
    by the oracle's NULLIF; delta_cents stays exact."""
    li = spark.createDataFrame(
        [(1, "1997-01-15", 0.0),        # month 199701 nets to 0 cents
         (1, "1997-02-15", 50.0)],      # growth from a 0 base: NULL
        "l_suppkey long, l_shipdate string, l_extendedprice double")
    li.select("l_suppkey",
              F.col("l_shipdate").cast("date").alias("l_shipdate"),
              "l_extendedprice").write.parquet(
        str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 7)], "s_suppkey long, s_nationkey long").write.parquet(
        str(tmp_path / "supplier.parquet"))
    rows = {r["ym"]: r for r in
            REGISTRY["ts_monthly_growth"].fn(spark, str(tmp_path))
            .collect()}
    assert rows[199701]["revenue"] == 0.0
    assert rows[199702]["delta_cents"] == 5000
    assert rows[199702]["growth"] is None, rows[199702]
