"""Named-query registry: the implementation of SURVEY.md §2.

Every operator in the survey's inventory is a key here, with

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (DataFrame-API
  first; Catalyst picks the physical plan), and
- a DuckDB oracle SQL string used by the driver's correctness gate
  (row-count + schema + order-insensitive value hash). As of round 4
  EVERY key carries an oracle: deterministic pipelines (incl. PQ and
  fixed-plane LSH) replay fully in SQL; sketch/trained-model keys
  (HLL, GK percentile, k-means IVF) self-verify in-query — exact
  side columns hash-checked, the approximation asserted against its
  error bound as oracle-pinned booleans.

Determinism conventions (SURVEY §5, FIXTURES §4):
- money aggregates go through DECIMAL so sums are order-independent
  and exact, then CAST to DOUBLE in both engines;
- every computed column is aliased identically in Spark and oracle;
- float expressions use the same IEEE operation order in both engines;
- timestamps returned to the driver are us-precision (oracle casts
  ns->TIMESTAMP explicitly).
"""

from __future__ import annotations

from .base import Q, REGISTRY

from . import relational      # noqa: E402,F401
from . import analytic_sql    # noqa: E402,F401
from . import aggregates      # noqa: E402,F401
from . import windows         # noqa: E402,F401
from . import setops          # noqa: E402,F401
from . import scalar_fns      # noqa: E402,F401
from . import tier_a          # noqa: E402,F401
from . import streaming_batch # noqa: E402,F401
from . import text_pipeline   # noqa: E402,F401
from . import vector_pipeline # noqa: E402,F401
from . import multimodal      # noqa: E402,F401
from . import sinks           # noqa: E402,F401
from . import udfs            # noqa: E402,F401
from . import cowtable        # noqa: E402,F401
from . import events_analytics  # noqa: E402,F401
from . import timeseries      # noqa: E402,F401

# ------------------------------------------------------------------
# Sweep ordering. The driver's per-round correctness gate evaluates
# the first 50 registry keys in registration order, so official
# coverage accumulates round over round only if the rotation is driven
# by the official CORRECTNESS_r*.json files (tools/sweep_plan.py
# derives it — never hand-count). Round-6 priority, in order
# (freshness rotation per VERDICT r5 asks #1/#6, plus the round's
# new and changed keys):
#
#   1. The full 22-key r2 cohort — the oldest official greens in the
#      repo. After this round no key's green predates r3.
#   2. The round-6 NEW keys (never swept): sessionize_salted (the
#      two-level window-skew mitigation measured in SCALE.md
#      §sf1skew), the ts_resample_ffill / ts_interpolate_linear /
#      ts_rolling_anomaly time-series family, and tf_bloom_index
#      (per-file Bloom point-lookup skipping) and
#      sessionize_incremental (persisted-state session refresh);
#      plus tf_zorder +
#      tf_constraints + sink_partitioned, whose implementation
#      changed this round (per-column z-bit budget 63//k; single-job
#      constraint aggregation; partition-metadata bound +
#      partition-column predicate) — old greens no longer cover the
#      shipped code; likewise agg_sketch_setops (degenerate-segment
#      guard), tf_cdc_updates (UTC commit timestamp),
#      tf_delete_vacuum (vacuum horizon tolerance) and tf_stats_prune
#      (temporal-gated prune padding) from the round-6 review fixes.
#   2b. The session's second new-key wave (never swept, must be in
#      the fold): agg_mode, ts_ewma, event_attribution,
#      text_substring_dedup, vec_int8_topk, stream_tws_state,
#      agg_count_min_sketch, agg_hist_bins, sample_stratified_topk,
#      event_path_analysis, agg_bitmap_distinct, scan_text,
#      join_dpp_partition_pruned, vec_binary_topk.
#   3. 1 of the 48 r3-cohort keys: the r5-changed CowTable-rewrite
#      family first (tf_merge_cow / table_compact / sink_upsert all
#      took the mergeSchema-read change, c76b7bd), then the Tier-A
#      head in registration order. The 44-key remainder queues for
#      round 7.
#
# All 50 fold keys are batch-checked — the wedge-isolation tail rule
# (live-stream keys {tf_stream_ingest, lifecycle_daemon,
# stream_custom_state, stream_stream_join} last) is vacuously
# satisfied; the bounded-await streaming_batch keys are not live.
_SWEEP_ORDER = [
    # --- 1: the r2 cohort, registration order ---
    "filter_in_between_like", "join_theta_range", "agg_percentile",
    "agg_cube", "agg_grouping_sets", "agg_having", "agg_collect",
    "agg_stddev_corr", "agg_pivot", "win_analytic", "win_frame_rows",
    "win_frame_range", "sort_multi", "topk", "sample",
    "set_union_all", "set_union", "set_intersect", "set_except",
    "dedup", "distinct_proj", "fn_string",
    # --- 2: new this round, then implementation-changed this round ---
    "sessionize_salted", "ts_resample_ffill", "ts_interpolate_linear",
    "ts_rolling_anomaly", "tf_bloom_index", "sessionize_incremental",
    "tf_zorder", "tf_constraints", "sink_partitioned",
    "agg_sketch_setops", "tf_cdc_updates", "tf_delete_vacuum",
    "tf_stats_prune",
    # --- 2b: the session's second wave of new keys (never swept):
    # deterministic mode, truncated-FIR EWMA, last-touch attribution,
    # duplicated-span detection, SQ8 quantized ANN, the
    # transformWithStateInPandas batch gate, count-min sketch,
    # data-driven histogram, fixed-k stratified sample, path n-grams,
    # exact-mergeable bitmap distinct, plain-text source, dynamic
    # partition pruning, binary (sign-bit) quantized ANN ---
    "agg_mode", "ts_ewma", "event_attribution",
    "text_substring_dedup", "vec_int8_topk", "stream_tws_state",
    "agg_count_min_sketch", "agg_hist_bins", "sample_stratified_topk",
    "event_path_analysis", "agg_bitmap_distinct", "scan_text",
    "join_dpp_partition_pruned", "vec_binary_topk",
    # --- 3: r3 cohort head (1 of 48): one of the three r5-changed
    # CowTable-rewrite keys (they share the mergeSchema-read path;
    # table_compact and sink_upsert front the round-7 queue) ---
    "tf_merge_cow",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # Round-7 queue: table_compact, sink_upsert, then the 44
    # remaining r3 keys (incremental_load, ledger_insert,
    # ledger_topk, retry_exec, sql_to_pandas, ddl_exec,
    # multi_stmt_exec, bulk_load, catalog_list,
    # storage_mount, exec_timing, stream_tumbling_agg,
    # stream_sliding_agg, stream_session, stream_watermark_late,
    # stream_dedup_state,
    # stream_file_ingest, stream_foreach_batch, text_tokenize_stats, text_lang_id,
    # text_quality_score, text_fingerprint,
    # text_exact_dedup, text_ngram_jaccard, text_dedup_clusters,
    # text_minhash_dedup, text_simhash, text_repetition,
    # text_pii_redact, tfidf_keywords, vec_cosine_topk,
    # vec_neardup_cosine, vec_ivf_topk, mm_decode_features,
    # scan_csv_schema, scan_json, sink_parquet, sink_csv_header,
    # analyze_stats, jdbc_source, udf_pandas_scalar,
    # udf_sql_register, udf_grouped_map, udtf_lateral), then the r4
    # cohort; derive with tools/sweep_plan.py.
]


def _apply_sweep_order() -> None:
    missing = [k for k in _SWEEP_ORDER if k not in REGISTRY]
    if missing:  # a rename must update the order list, loudly
        raise KeyError(f"_SWEEP_ORDER names unknown keys: {missing}")
    ordered = {k: REGISTRY[k] for k in _SWEEP_ORDER}
    ordered.update((k, q) for k, q in REGISTRY.items() if k not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_sweep_order()

__all__ = ["Q", "REGISTRY"]
