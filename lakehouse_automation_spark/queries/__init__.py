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
from . import graph           # noqa: E402,F401

# ------------------------------------------------------------------
# Sweep ordering. The driver's per-round correctness gate evaluates
# the first 50 registry keys in registration order, so official
# coverage accumulates round over round only if the rotation is driven
# by the official CORRECTNESS_r*.json files (tools/sweep_plan.py
# derives it — never hand-count). Round-15 priority, in order
# (VERDICT r14 ask #2: the r10 cohort + changed-key spares; registry
# frozen):
#
#   1. The complete 48-key r10-gated cohort (every key whose newest
#      official gate entry is round 10), exactly as round 14's
#      _NEXT_SWEEP_QUEUE pinned it. The cohort includes
#      join_bloom_filtered, whose baseline entry was re-merged this
#      round (BASELINE.md §15) — the official re-gate rides along.
#   2. The 2 spare slots go to changed-key re-confirmation
#      (changed-keys-first rule). Three keys changed this round for
#      two slots: vec_neardup_lsh and vec_knn_join share ONE changed
#      stage (_lsh_signatures: the corpus count is now memoized under
#      the signature plan key; ADVICE r14), so officially re-gating
#      vec_neardup_lsh covers the shared path and the second slot
#      goes to tfidf_keywords, whose plan changed outright (single
#      corpus scan + persisted tf mid-table instead of two
#      scan+explode passes). vec_knn_join keeps its two-tier local
#      green trail (ORACLE_local_r15 + the sf1 replica + LSHTIER_r15)
#      and its official entry is r14-fresh.
#
# No live-stream key sits in this fold (all four were swept r14), so
# the wedge-isolation block constraint is satisfied vacuously.
# After this round's sweep the oldest official entry is >= r11 for
# every key. Growth freeze: round 15 adds ZERO new keys.
_SWEEP_ORDER = [
    # --- 1: the complete r10 cohort (48 keys) ---
    "agg_approx_topk", "agg_distinct", "agg_hash_basic", "agg_having",
    "agg_hist_bins", "agg_rollup", "agg_sketch_rollup",
    "agg_stddev_corr", "call_proc", "case_when", "event_funnel",
    "filter_pred", "fn_try_arith", "join_anti", "join_asof_forward",
    "join_asof_tolerance", "join_bloom_filtered", "join_inner_equi",
    "join_null_safe", "join_outer", "join_self", "join_semi",
    "mixture_sample", "mv_incremental_refresh", "pack_sequences",
    "profile_table", "project_rename_cast", "retention_cohort",
    "scan_parquet", "sessionize_events", "set_except_all",
    "set_intersect_all", "sink_dynamic_overwrite",
    "stream_static_join", "text_chunk_split", "text_decontaminate",
    "text_unigram_logprob", "tf_clone", "tf_history", "tf_restore",
    "tf_verify", "udf_grouped_agg", "udf_grouped_map",
    "vec_ivf_index_persisted", "vec_matryoshka_topk", "win_frame_rows",
    "win_pattern_detect", "win_rank",
    # --- 2: the 2 changed-key spares ---
    "vec_neardup_lsh", "tfidf_keywords",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-16 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-16 fold front, machine-readable: once the r15 fold lands,
# the stalest official cohort is the 48 r11-gated keys — queued here
# completely. tests/test_smoke.py recomputes the cohort from the
# CORRECTNESS_r*.json files and enforces that this list is exactly
# the stalest-not-in-fold set, so the rotation cannot silently drop a
# stale key. Any NEW key must be inserted into the fold itself
# (growth-freeze rule above), not here. The cohort is 48 keys for 50
# slots, so round 16 has 2 spare slots for changed-key
# re-confirmation.
_NEXT_SWEEP_QUEUE = [
    "agg_bitmap_distinct", "agg_collect", "agg_count_min_sketch",
    "agg_cube", "agg_grouping_sets", "agg_mode", "agg_percentile",
    "agg_pivot", "agg_sketch_setops", "dedup", "distinct_proj",
    "event_attribution", "event_path_analysis",
    "filter_in_between_like", "flagship_pricing_summary",
    "fn_datetime", "fn_string", "join_broadcast",
    "join_dpp_partition_pruned", "join_theta_range", "sample",
    "sample_stratified_topk", "scan_text", "sessionize_incremental",
    "sessionize_salted", "set_except", "set_intersect", "set_union",
    "set_union_all", "sink_partitioned", "sort_multi",
    "stream_tws_state", "text_substring_dedup", "tf_bloom_index",
    "tf_cdc_updates", "tf_constraints", "tf_delete_vacuum",
    "tf_merge_cow", "tf_stats_prune", "tf_zorder", "topk", "ts_ewma",
    "ts_interpolate_linear", "ts_resample_ffill", "ts_rolling_anomaly",
    "vec_binary_topk", "vec_int8_topk", "win_analytic",
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
