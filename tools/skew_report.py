#!/usr/bin/env python
"""Measure what a genuinely hot key costs — and what salting buys —
on the skewed 10x corpus (VERDICT r5 ask #4).

The uniform sf1 replica cannot produce a hot key (each replica repeats
the source distribution), so the salted-join / AQE-skew / window-skew
claims were plan-shape-only until this. Against
`.scaledata/sf1skew` (one supplier owning ~20% of lineitem, one user
owning ~20% of events — `gen_scale_data.py --skew`) this reports:

1. **Reducer spread** for the lineitem->supplier join key, plain vs
   salted: rows per shuffle partition under Spark's HashPartitioning
   (pmod(murmur3, P) — computed with F.hash, the same function), as
   max/mean ("spread"). Plain skew puts ~20% of the table on one
   reducer; the salt must flatten it ~S-fold.
2. **Join timings** (min of warm runs): the plain shuffle join with
   AQE skew-join splitting ON (the engine default), the same join
   with AQE skew handling OFF (what a naive engine pays), and the
   explicitly salted join (`join_skew_salted`'s rewrite).
3. **Window-skew timing**: `sessionize_events` (per-user windows —
   un-splittable by AQE, the worst case) on the uniform vs the skewed
   corpus at the same row count.

  python tools/skew_report.py [sf1_dir] [sf1skew_dir]

Writes bench/SKEW_sf1.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

WARM = 3


def timed(fn, warm: int = WARM) -> float:
    fn()  # cold
    best = float("inf")
    for _ in range(warm):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def spread(df: DataFrame, *cols: str) -> dict:
    """Rows per hash-shuffle partition for the given key columns —
    max/mean ratio 1.0 = perfectly flat, P = one reducer owns all.
    P comes from the LIVE session's spark.sql.shuffle.partitions so
    the simulation describes the same partitioning the timed joins
    actually used (a hardcoded 32 only matched 32-core hosts)."""
    P = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    per = (df.groupBy(F.pmod(F.hash(*cols), F.lit(P)).alias("_p"))
           .count().collect())
    counts = [r["count"] for r in per]
    mx, mean = max(counts), sum(counts) / P
    return {"max_rows": mx, "mean_rows": round(mean), "n_partitions": P,
            "spread": round(mx / mean, 2), "partitions_hit": len(counts)}


def plain_join(spark, sf_dir: str) -> DataFrame:
    from lakehouse_automation_spark.queries.base import dsum, t

    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (li.join(sup, li.l_suppkey == sup.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("l_extendedprice", "price_sum")))


def main() -> None:
    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.queries import REGISTRY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    uni = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".scaledata/sf1")
    skw = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, ".scaledata/sf1skew")

    spark = get_spark("skew-report")
    # disable broadcast for the measured joins: supplier at sf1 fits
    # under the threshold, and a broadcast join has no reducer skew to
    # measure — the 100-TB case this models is a large-large shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    out: dict = {"_meta": {
        "uniform": uni, "skewed": skw, "warm_runs": WARM,
        "skew_gen": "gen_scale_data.py --skew: ~20% of lineitem on one "
                    "l_suppkey, ~20% of events on one user_id",
    }}

    from lakehouse_automation_spark.queries.base import t
    li_skw = t(spark, skw, "lineitem")
    out["reducer_spread_plain"] = spread(li_skw, "l_suppkey")
    S = 8
    out["reducer_spread_salted"] = spread(
        li_skw.withColumn(
            "_salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(S)).cast("int")),
        "l_suppkey", "_salt")

    def with_aqe_skew(flag: str):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)

    with_aqe_skew("false")
    out["join_plain_noaqe_sec"] = timed(lambda: noop(plain_join(spark, skw)))
    with_aqe_skew("true")
    out["join_plain_aqe_sec"] = timed(lambda: noop(plain_join(spark, skw)))
    out["join_salted_sec"] = timed(
        lambda: noop(REGISTRY["join_skew_salted"].fn(spark, skw)))
    # sanity: identical results plain vs salted (salting is physical)
    a = {tuple(r) for r in plain_join(spark, skw).collect()}
    b = {tuple(r) for r in REGISTRY["join_skew_salted"].fn(spark, skw).collect()}
    out["salted_matches_plain"] = a == b

    sess = REGISTRY["sessionize_events"].fn
    out["sessionize_uniform_sec"] = timed(lambda: noop(sess(spark, uni)))
    out["sessionize_skew_sec"] = timed(lambda: noop(sess(spark, skw)))
    # the two-level mitigation on the same hot-user corpus: identical
    # rows (checked), bounded per-task partitions — the premium it
    # pays at benign scale is the insurance price; its win grows with
    # the hot user's share of one task's runtime
    salted = REGISTRY["sessionize_salted"].fn
    out["sessionize_salted_skew_sec"] = timed(lambda: noop(salted(spark, skw)))
    ps = {tuple(r) for r in sess(spark, skw).collect()}
    ss = {tuple(r) for r in salted(spark, skw).collect()}
    out["sessionize_salted_matches_plain"] = ps == ss

    # round-7 third wave: the two new user-partitioned windows under
    # the hot user (~20% of events in ONE un-splittable (user[, type])
    # window partition — the worst case AQE cannot split).
    # win_cumulative_distinct's window input is ACTIVE DAYS (the hot
    # user still contributes <= span days), so it should be immune;
    # event_interarrival_stats' lag window sees raw hot-user events
    # but its downstream percentile runs on the gap histogram.
    from lakehouse_automation_spark.operators.cache import release_persisted
    for key, slug in (("win_cumulative_distinct", "cumdistinct"),
                      ("event_interarrival_stats", "interarrival")):
        fn = REGISTRY[key].fn
        out[f"{slug}_uniform_sec"] = timed(lambda: noop(fn(spark, uni)))
        release_persisted()
        out[f"{slug}_skew_sec"] = timed(lambda: noop(fn(spark, skw)))
        release_persisted()

    dst = os.path.join(root, "bench", "SKEW_sf1.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
