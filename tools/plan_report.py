#!/usr/bin/env python
"""Generate PLANS.md: the formatted physical plan of each headline
query at sf0.1, so plan-shape review (pushdown, pruning, join
strategy, exchange placement) doesn't require re-running anything.

  python tools/plan_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The default scratch root is PID-keyed (engine.session.scratch_base,
# r16 de-race); pin it here so scratch paths inside published plans
# don't churn on every regen. This tool is manual and single-instance,
# so a fixed path is safe.
os.environ.setdefault("SPARK_GRAFT_SCRATCH", "/tmp/las_scratch_plans")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PLANS.md")

NOTES = {
    "flagship_pricing_summary": "date filter + projection reach the parquet scan; one partial+final hash agg.",
    "flagship_regional_revenue": "6-table join: facts hash-join on l_orderkey, 4 dims broadcast, date filter pushed to the orders scan.",
    "join_asof": "union-scan as-of: single shuffle, window carry-forward, no row multiplication.",
    "join_bucketed": "bucketed sort-merge join: no exchange on either side (run with auto-broadcast off to see it).",
    "join_skew_salted": "salted (key, salt) join: hot keys spread over 8 reducers; identical results to the plain join.",
    "text_minhash_dedup": "explode + 16 grouped-min aggregates: one shuffle on doc_id, band hashes map-side.",
    "text_ngram_jaccard": "inverted-index self-join on capped shingles; persisted mid-table computed once.",
    "curate_pipeline": "quality + exact-dup + CC-cluster verdict; clustering iterations run before this final join plan.",
    "vec_neardup_lsh": "LSH band-bucket candidates (shuffle on (band, bucket)), exact rerank, shuffle re-attach — nothing corpus-sized is broadcast.",
    "vec_knn_join": "same candidate generation, top-k window per query.",
    "agg_percentile_approx": "GK sketches (fixed-size partial buffers, map-side merge) + a broadcast 3-row rank-check join: the self-verifying percentile path whose reducer memory does NOT grow with group size.",
    "agg_approx_distinct": "two aggregations joined on the 3-row result: expand-distinct for the exact side, direct HLL sketch for the approx side — never one plan threading sketch buffers through the expand shuffle.",
    "vec_pq_topk": "ADC scan over 8-byte codes (pandas-UDF encode), broadcast per-query LUTs, exact rerank via shuffle equi-join on ids.",
    "stream_stream_join": "batch restatement of the watermarked interval join: one shuffle per side on user_id, range predicate bounds the state.",
    "join_interval_bucketed": "interval -> bucket-equi join (left fanout <= 2) + residual: a hash shuffle where a pure range condition forces nested-loop.",
    "text_bm25_rank": "explode + tf/df/doclen aggs, broadcast 1-row stats, TakeOrderedAndProject top-20 (no global single-partition window).",
    "text_decontaminate": "eval shingle-hash set BROADCAST against the exploded corpus side, then one groupBy — linear, never corpus x eval.",
    "mixture_sample": "stateless hash-keep projection + per-source partial/final count — no shuffle before the audit agg.",
    "pack_sequences": "window cumsum partitioned by hash bucket: one shuffle on bucket, per-bucket sort only (no global sort).",
    "tf_cdc_updates": "manifest-diff CDC checkpointed once, then key-paired into update pre/post images via semi/anti joins on the (small) diff.",
    "join_bloom_filtered": "8-KB Bloom literal probed JVM-side before the shuffle; the exact semi join afterwards only sees survivors.",
    "sessionize_events": "lag + running cumsum + session agg share ONE user_id Exchange (window keys ⊆ groupBy keys).",
    "event_funnel": "three chained window-mins on one user_id partitioning; the 3-row stage table explodes from a single agg row.",
    "win_pattern_detect": "pattern-class filter pushed to scan, one user_id Exchange, lag in integer µs.",
    "sessionize_salted": "two-level skew-safe sessionization: ONE event-level Exchange on (user_id, day), the plain user_id Exchange sees only session rows.",
    "ts_resample_ffill": "per-(user, hr) last-row compaction, per-user span explode for the grid, ignorenulls fill window — all on user_id(-superset) partitionings.",
    "ts_interpolate_linear": "same front half; prev/next observation context rides two extra windows on the SAME user_id partitioning.",
    "ts_rolling_anomaly": "one user_id Exchange; integer-cent sum/sum-of-squares rolling moments (row-bounded frame, O(24) state), anomaly predicate as a plain filter.",
    "tf_bloom_index": "point-scan plan reads ONLY the Bloom-admitted files (pruning decided driver-side before this plan exists); residual equality filter settles FPs.",
    "sessionize_incremental": "refresh plan: batch-local sessionize + tail join + anti-join carry — historical events never appear as a scan.",
    "agg_mode": "count agg shuffles the raw table once; the argmax agg runs on the |status×priority| rowset.",
    "ts_ewma": "one user_id Exchange; 16 lag reads share a single sort — the truncated FIR is a plain window projection.",
    "event_attribution": "one user_id window (running last-touch), then a 5-row hash aggregate.",
    "text_substring_dedup": "stride-10 windows explode inline, shuffle on md5 keys; dup-span set HAVING-pruned then broadcast back.",
    "vec_int8_topk": "calibration agg → broadcast scalar; int8 code dot in one codegen projection; rerank joins only the 32-wide shortlist.",
    "stream_tws_state": "per-user Arrow fold (applyInPandas restatement of the TWS processor); one group-key Exchange.",
    "agg_count_min_sketch": "5x explode collapses to <=K*W counters per partition before the shuffle; 1280-cell sketch broadcasts to the probe join.",
    "agg_hist_bins": "1-row stats agg broadcast into the bin projection; bin agg partial-combines to <=20 rows.",
    "sample_stratified_topk": "one stratum-key Exchange; rank filter drops all but k rows per stratum.",
    "event_path_analysis": "two leads share one user_id window sort; bounded path agg then a 5-row rank.",
    "graph_components": "final labeling plan of the min-label/pointer-jump loop: per-round join+groupBy on node keys; the co-supplier pair build shuffles on l_orderkey with the supplier dim broadcast.",
    "ts_autocorr": "daily count agg partial-combines to |types|xdays; grid explodes from a |types|-row span table; one event_type window then a 6-sum moment agg.",
    "agg_bitmap_distinct": "partial agg folds ids into <=4-KB bucket bitmaps; bitmap_or_agg merges per-type bitmaps for the union row.",
    "join_dpp_partition_pruned": "DynamicPruning subquery in the fact scan's PartitionFilters — unmatched day directories never listed.",
    "vec_binary_topk": "sign-bit packing in one projection; Hamming rank via two popcounts; rerank joins the 32-wide shortlist only.",
    "graph_jaccard_neighbors": "wedge self-join shuffles on the shared endpoint (fan-out bounded by blocking-key degree); degree attach is two node-keyed joins; nothing broadcast corpus-side.",
    "agg_mad_outliers": "both rank windows partition by nation over the supplier-level rollup; the per-nation median/MAD tables broadcast back for the integer 3-MAD fence.",
    "win_intervals_overlap": "order-lineitem join + per-order MAX share one l_orderkey Exchange; sweep-line deltas partial-combine so the cumsum window sees only the (priority, day) series.",
    "ts_crosscorr": "day-keyed self-join over the persisted 25xdays rollup; 128-bit integer cross sums collapse to the 300-row pair triangle.",
    "vec_dispersion": "64-way posexplode partial-combines to labelx64 sums map-side; both aggregates reuse one persisted exploded projection.",
    "text_collocations": "unigram/bigram aggs partial-combine before token-keyed shuffles; the support floor prunes the bigram tail before the vocab joins; top-100 is TakeOrderedAndProject.",
    "agg_exact_deciles": "value-histogram pre-agg collapses rows before the flag-partitioned cumsum window; nine integer cut predicates in one collapsing agg.",
    "order_basket_lift": "orderkey pair self-join (fan-out <= 21/order), support-floor HAVING before the part-count attach joins, TakeOrderedAndProject top-100.",
    "join_asof_nearest": "two union-scan as-of passes (backward + forward) joined on the unique event id — 3 key-partitioned shuffles, no row multiplication.",
    "event_active_users": "distinct active-pair agg, x7 cover explode on the compacted set, re-distinct, per-day counts; span broadcast for end clipping.",
    "agg_sample_estimate": "ONE lineitem scan computes exact and sampled sides as CASE aggregates (plan-asserted single Scan parquet).",
    "win_cumulative_distinct": "first-occurrence and active-day aggregates share user-grain shuffles; the cumsum window reads active days only.",
    "event_interarrival_stats": "lag window on (user, type); gaps collapse to the (type, gap) histogram before the type-keyed cumsum window.",
    "win_skyline": "one running-min window over the (size, price) sort — the O(n^2) dominance anti-join never exists in the plan.",
    "text_vocab_coverage": "unigram agg partial-combines; the rank/cumsum window input is the vocab; 4-row output via a broadcast cut table.",
    "agg_hhi": "per-supplier cents agg then ONE collapsing 128-bit sum-of-squares agg — no share division in the plan.",
    "project_unpivot": "Expand (unpivot) is a stateless projection; the only Exchange is the (flag, measure) partial+final agg.",
    "event_attribution_linear": "one user window for journey ids; purchases/touches/stats join at (user, journey) grain; |types|+1-row agg.",
    "vec_ivf_index_refresh": "search plan over the refreshed index: probed cell ids as partition filters (only touched+probed cell dirs listed); the refresh itself is a broadcast centroid join + batch-sized append, run before this plan exists.",
    "tf_cdc_feed": "post-checkpoint Scan ExistingRDD; the captured pre-checkpoint plan below is the real manifest-diff CDC: only the rewritten chunk and its predecessor are scanned, exceptAll cancels carried rows.",
    "tf_cdc_updates": "post-checkpoint Scan ExistingRDD; the captured plan is the update-pairing layer (semi/anti joins on the small diff) over the same manifest-diff CDC.",
    "mv_incremental_refresh": "post-checkpoint Scan ExistingRDD; the captured plan is the signed-delta refresh: change-feed groupBy + null-safe full-outer fold into the 3-row MV — historical base rows never rescanned.",
    "tf_zorder": "the captured compact-write plan is the sampled z layout (r13): NO InMemoryRelation and no approxQuantile job — one driver-side sample of the z columns supplies rank cuts + murmur-token file placement, the data scans once (plan-pinned in tests/test_scale_plans.py).",
}

# informative non-HEADLINE plans appended to the report
EXTRAS = ["vec_pq_topk", "stream_stream_join", "join_interval_bucketed",
          "text_bm25_rank", "agg_approx_distinct",
          "text_decontaminate", "mixture_sample", "pack_sequences",
          "event_funnel", "retention_cohort", "win_pattern_detect",
          "agg_sketch_rollup", "agg_sketch_setops",
          "text_incremental_dedup", "profile_table",
          "vec_matryoshka_topk", "join_null_safe", "udf_grouped_agg",
          "sessionize_salted", "ts_resample_ffill",
          "ts_interpolate_linear", "ts_rolling_anomaly",
          "tf_bloom_index", "sessionize_incremental",
          "agg_mode", "ts_ewma", "event_attribution",
          "stream_tws_state", "agg_count_min_sketch", "agg_hist_bins",
          "sample_stratified_topk", "event_path_analysis",
          "agg_bitmap_distinct", "join_dpp_partition_pruned",
          "vec_binary_topk",
          "win_intervals_overlap", "ts_crosscorr", "vec_dispersion",
          "text_collocations",
          "agg_exact_deciles", "order_basket_lift",
          "join_asof_nearest", "event_active_users",
          "agg_sample_estimate", "win_cumulative_distinct",
          "event_interarrival_stats",
          "win_skyline", "text_vocab_coverage", "agg_hhi",
          "project_unpivot", "event_attribution_linear",
          "vec_ivf_index_refresh",
          # checkpointed CDC/MV keys: published for their captured
          # pre-checkpoint plans (the post-checkpoint plan is only
          # `Scan ExistingRDD`)
          "tf_cdc_feed", "tf_cdc_updates", "mv_incremental_refresh",
          # compact publishes its write-side plan the same way — the
          # one-scan sampled z layout is otherwise invisible post-commit
          "tf_zorder"]


def main() -> int:
    from bench import HEADLINE

    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.operators.plancapture import (
        captured_plans,
        clear_captured,
    )
    from lakehouse_automation_spark.queries import REGISTRY

    # checkpointed keys stash their REAL (pre-checkpoint) plans through
    # operators/plancapture.py; without this the report would show only
    # `Scan ExistingRDD` for them (VERDICT r9 ask #7)
    os.environ["LAS_CAPTURE_PLANS"] = "1"

    spark = get_spark("plan_report")
    lines = [
        "# PLANS — formatted physical plans of the headline set",
        "",
        f"Generated by `tools/plan_report.py` at `{SF_DIR}`. AQE is on, so",
        "`AdaptiveSparkPlan isFinalPlan=false` shows the INITIAL plan;",
        "runtime re-planning (broadcast conversion, partition coalescing,",
        "skew splitting) refines it per query stage at execution.",
        "",
        "Keys that `localCheckpoint` their result (scratch tables are",
        "deleted before return) publish BOTH plans: the post-checkpoint",
        "plan the driver sees (`Scan ExistingRDD`) and the real",
        "pre-checkpoint plan captured via `operators/plancapture.py`.",
        "",
    ]
    for key in HEADLINE + EXTRAS:
        if key not in REGISTRY:
            continue
        clear_captured()
        df = REGISTRY[key].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        lines.append(f"## {key}")
        if key in NOTES:
            lines.append(f"\n{NOTES[key]}\n")
        lines.append("```")
        lines.append(plan.rstrip())
        lines.append("```")
        for label, pre in sorted(captured_plans().items()):
            lines.append(f"\n### {key} — pre-checkpoint plan `{label}`\n")
            lines.append("```")
            lines.append(pre.rstrip())
            lines.append("```")
        lines.append("")
        print(key, file=sys.stderr)
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
