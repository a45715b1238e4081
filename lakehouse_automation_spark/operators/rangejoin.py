"""Bucketed interval join — the large-×-large range-join scale path.

A time-interval join with no equi key (``r.ts BETWEEN l.ts + lower AND
l.ts + upper``) gives Catalyst nothing to hash on, so the physical
plan is a broadcast-nested-loop: O(|L|·|R|) comparisons and one side
fully broadcast — both non-starters at 100 TB. (``join_theta_range``
is the OTHER case: a tiny band dimension where the 5-row broadcast BNL
is exactly right.)

The standard fix, used by every interval-join implementation (Flink's
window join, KDB as-of variants): quantize time into fixed buckets no
narrower than the interval, explode the LEFT row to every bucket its
interval overlaps (fanout <= 2 when bucket width >= interval width),
tag the RIGHT row with its single bucket, equi-join on the bucket id,
and re-check the true interval as a residual predicate. The
nested-loop becomes one shuffle on ``_bucket`` with bounded fanout,
and every true pair matches EXACTLY once (the right row has one
bucket), so no dedup pass is needed.

Correctness of coverage: with integer ``lower``/``upper`` seconds and
width w, floor-of-epoch monotonicity gives bucket(r) within
[floor((epoch(l)+lower)/w), floor((epoch(l)+upper)/w)] for every r the
residual accepts — sub-second fractions cannot escape the bucket range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_join_bucketed(left: DataFrame, right: DataFrame,
                           left_ts: str, right_ts: str,
                           lower_s: int, upper_s: int,
                           bucket_s: int | None = None,
                           extra: Column | None = None) -> DataFrame:
    """Rows (l, r) with ``r[right_ts] - l[left_ts]`` in
    ``[lower_s, upper_s]`` seconds, joined via bucket-equi shuffle.

    ``bucket_s`` defaults to the interval width (minimum left fanout,
    <= 2 buckets per row); ``extra`` is an optional additional join
    predicate evaluated with the residual. Column names must be
    disjoint apart from the two timestamp columns' owners.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    w = bucket_s or (upper_s - lower_s)
    lb = F.floor((F.unix_timestamp(F.col(left_ts)) + lower_s) / w)
    ub = F.floor((F.unix_timestamp(F.col(left_ts)) + upper_s) / w)
    l2 = left.withColumn("_bucket", F.explode(F.sequence(lb, ub)))
    r2 = right.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(right_ts)) / w))
    cond = (
        (l2["_bucket"] == r2["_bucket"])
        & (r2[right_ts] >= l2[left_ts] + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (r2[right_ts] <= l2[left_ts] + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    if extra is not None:
        cond = cond & extra
    return l2.join(r2, cond).drop("_bucket")
