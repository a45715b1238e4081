#!/usr/bin/env python
"""Headline benchmark: runs the flagship + representative heavy queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of the headline set (MINIMUM of
adaptive warm runs per query, after one cold warm-up — min, not
median, because this host carries constant external load: the minimum
estimates uncontended latency and is stable run-to-run where the
median swung 2-10x with background noise). Warm runs are adaptive:
at least WARM_RUNS, extended up to MAX_RUNS while the minimum is
still improving by >5%, so a background-load burst overlapping the
first window cannot pin the recorded number (round 3's apparent
shingle-family regression was exactly that — see BASELINE.md §4).

Since r17, keyed persists and memo scalars are RELEASED between warm
runs (r16 judge ask #2): every timed run pays the declared query's
full build, so ``queries`` minima are cold-equivalent — a query over
a keyed-persisted mid-table (LSH signatures, shingle windows, the
int8 scale) can no longer record a scan-free steady-state number as
its headline. The steady-state minima are still measured and emitted
separately as ``queries_steady`` (an ADDED field; nothing removed or
renamed). Affected keys' r16-and-earlier records are steady-state —
see BASELINE.md §18 before comparing across the boundary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_RUNS = 5   # minimum warm runs per key
MAX_RUNS = 10   # cap when the min keeps improving (load burst recovery)

# Representative heavy set: scan+agg, joins (broadcast/shuffle/self),
# windows, set ops, text + vector pipeline. Kept stable across rounds
# so BENCH_r{N}.json files are comparable. Changes log:
#   r2: vec_neardup_cosine (O(n^2) oracle tier) -> vec_neardup_lsh
#       (the scale path), per round-1 review #4.
#   r3: agg_percentile (exact; per-group full-value collection that
#       cannot scale past one reducer per group) -> its sketch twin
#       agg_percentile_approx; the exact key stays oracle-gated in the
#       registry. Comparable r2 value for the swapped slot: 2.04 s.
#   r4: agg_percentile_approx REDEFINED to self-verify the GK rank
#       guarantee in-query (second lineitem scan + broadcast 3-row
#       rank-check join) so the sketch gets a hash oracle — ~1.7x the
#       r3 work in the same slot (quiet-host baseline 0.62 s -> 1.03
#       s). A BENCH_r3-vs-r4 delta on this key is that redefinition,
#       not a regression.
#   r5: + sessionize_events (chained window/agg on one Exchange) and
#       join_bloom_filtered (Bloom semi-join reduction) — the round-5
#       events-analytics family's two heaviest keys; baselines
#       recorded at introduction, earlier keys unchanged.
#   r6: + sessionize_salted (two-level window-skew-safe variant) and
#       ts_resample_ffill (time-series grid + forward fill) — the
#       round-6 families' representative keys; baselines recorded at
#       introduction, earlier keys unchanged.
#       Second wave: + text_substring_dedup (duplicated-span
#       detection, the heaviest new text key) and vec_int8_topk (SQ8
#       quantized ANN) — baselines recorded at introduction.
HEADLINE = [
    "flagship_pricing_summary",
    "flagship_regional_revenue",
    "agg_hash_basic",
    "agg_distinct",
    "agg_rollup",
    "agg_percentile_approx",
    "join_inner_equi",
    "join_broadcast",
    "join_self",
    "join_asof",
    "join_bloom_filtered",
    "sessionize_events",
    "sessionize_salted",
    "ts_resample_ffill",
    "win_rank",
    "win_frame_rows",
    "set_union",
    "dedup",
    "fn_math",
    "fn_json",
    "text_exact_dedup",
    "text_tokenize_stats",
    "tfidf_keywords",
    "text_ngram_jaccard",
    "text_minhash_dedup",
    "text_simhash",
    "text_substring_dedup",
    "curate_pipeline",
    "vec_cosine_topk",
    "vec_neardup_lsh",
    "vec_knn_join",
    "vec_int8_topk",
    "mm_decode_features",
    # round 7 additions: the iterative-join graph family and the
    # zero-filled time-series correlation
    "graph_components",
    "ts_autocorr",
    # round 7 third wave: the wedge self-join (heaviest new graph
    # key) and the double ranked-window robust-stats key — baselines
    # recorded at introduction, earlier keys unchanged.
    "graph_jaccard_neighbors",
    "agg_mad_outliers",
    # round 8 addition: the incremental ANN-index maintenance key
    # (build 80% + refresh 20% + search; the round's only new key)
    "vec_ivf_index_refresh",
]


# Ambient-drift controls (BASELINE.md §8/§9): keys whose code has been
# byte-identical since their baseline was recorded, so their measured
# ratio vs bench/BASELINE_results.json is PURE host drift. The emitted
# control_ratio (median of the three) is the waterline every other
# key's ratio must be judged against — raw cross-round totals on this
# shared host are meaningless without it (r8's "regressions" were all
# explained by a 1.5-1.6x control waterline). If one of these keys is
# ever edited, swap in another untouched-since-baseline key and note
# the change in BASELINE.md §9.
CONTROL_KEYS = ["set_union", "join_asof", "win_frame_rows"]


def main() -> None:
    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.queries import REGISTRY

    from lakehouse_automation_spark.operators.cache import release_persisted

    spark = get_spark("bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    results: dict[str, float] = {}
    steady: dict[str, float] = {}
    for key in HEADLINE:
        if key not in REGISTRY:
            continue
        fn = REGISTRY[key].fn
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # cold: plan+JIT
        had_state = release_persisted() > 0
        times: list[float] = []
        best, stale = float("inf"), 0
        while len(times) < MAX_RUNS and (len(times) < WARM_RUNS or stale < 3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(dt)
            if dt < best * 0.95:   # still finding quieter windows: keep going
                best, stale = dt, 0
            else:
                stale += 1
            # r17 (judge ask #2): release keyed persists / memo scalars
            # BETWEEN WARM RUNS, so every timed run pays the declared
            # query's full build (mid-table persists, calibration
            # collects) — the recorded min is COLD-EQUIVALENT, not a
            # query over a prebuilt in-memory index. Cleanup runs
            # outside the timed window (blocking unpersist).
            had_state = (release_persisted() > 0) or had_state
        results[key] = round(min(times), 4)
        # steady-state companion number (the build-once-query-many
        # latency an LSH/shingle index amortizes to): one untimed
        # rebuild of the persisted mid-tables, then timed runs that
        # reuse them. Reported separately in queries_steady — it never
        # feeds `value` or `queries`. Keys that registered no persisted
        # state have no distinct steady state: their warm minimum IS
        # it, so the 3 extra runs are skipped.
        if had_state:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            sruns: list[float] = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                sruns.append(time.perf_counter() - t0)
            steady[key] = round(min(sruns), 4)
            release_persisted()
        else:
            steady[key] = results[key]

    record = {
        "metric": "headline_query_set_wallclock",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "queries_steady": steady,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # Baseline epochs (BASELINE.md §11): epoch 1 is the r4-era
    # quiet-window record (kept immutable so r4–r10 history stays
    # comparable); epoch 2 is the r11 re-record on then-HEAD — after
    # 6+ rounds of host drift the controls sat at ~1.1-1.5 vs epoch 1,
    # burning a decomposition argument every round. Ratios are emitted
    # vs BOTH; the control waterline is near 1.0 against epoch 2.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench")
    for tag, fname in (("epoch1", "BASELINE_results_epoch1.json"),
                       ("epoch2", "BASELINE_results.json")):
        try:
            with open(os.path.join(bench_dir, fname)) as fh:
                base = json.load(fh)
            common = [k for k in results
                      if base.get(k, {}).get("sec")
                      and float(base[k]["sf"]) == record["sf"]]
            if common:
                record[f"ratio_{tag}"] = round(
                    sum(results[k] for k in common)
                    / sum(base[k]["sec"] for k in common), 4)
            ratios = {k: round(results[k] / base[k]["sec"], 4)
                      for k in CONTROL_KEYS if k in common}
            if ratios:
                # statistics.median averages the two middle values on
                # an even count (a filtered-out control key must not
                # bias the drift waterline toward the upper-middle
                # element)
                med = round(statistics.median(ratios.values()), 4)
                record[f"control_keys_{tag}"] = ratios
                record[f"control_ratio_{tag}"] = med
        except (OSError, ValueError, KeyError, TypeError):
            # annotation only — a missing/malformed baseline entry must
            # never discard the measured record it decorates
            pass
    # r4-r10 readers look for the unsuffixed names: keep them aliased
    # to epoch 1 (the same baseline those rounds compared against)
    if "control_ratio_epoch1" in record:
        record["control_keys"] = record["control_keys_epoch1"]
        record["control_ratio"] = record["control_ratio_epoch1"]

    print(json.dumps(record))


if __name__ == "__main__":
    main()
