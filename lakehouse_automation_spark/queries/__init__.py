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
# derives it — never hand-count). Round-10 priority, in order
# (VERDICT r9 ask #3: steady-state rotation, registry frozen):
#
#   1. The entire 45-key r5-gated cohort (round 9's
#      _NEXT_SWEEP_QUEUE — every key whose newest official gate entry
#      is round 5). After this round's sweep the oldest official
#      entry is >= r6. Many of these keys' ORACLES gained the round-10
#      extremes domain guard (value-identical on clean data), so this
#      fold also re-confirms the guarded forms officially.
#   2. The 5 spare slots go to changed-key re-confirmation:
#      udf_grouped_map (VERDICT r9 "what's wrong" #1 — its cents fold
#      changed AFTER the r9 records, and again this round: unbounded-
#      int accumulate), plus the 4 r6-gated keys whose code or oracle
#      changed in this round's extremes promotion and are not already
#      in the cohort: agg_having, agg_stddev_corr, win_frame_rows
#      (also a §9 control key), agg_hist_bins (new histogram domain
#      contract).
#
# Growth freeze: round 10 adds ZERO new keys.
#
# Wedge isolation: no live-stream key ({tf_stream_ingest,
# lifecycle_daemon, stream_custom_state, stream_stream_join}) is in
# this fold (all re-gated r9), so the rule holds vacuously;
# stream_static_join's ingest is the bounded/fallback form.
_SWEEP_ORDER = [
    # --- 1: the 45-key r5 cohort, registration order ---
    "flagship_pricing_summary", "scan_parquet", "project_rename_cast",
    "filter_pred", "case_when", "join_inner_equi", "join_broadcast",
    "join_outer", "join_semi", "join_anti", "join_self",
    "join_asof_forward", "join_asof_tolerance", "join_null_safe",
    "agg_hash_basic", "agg_distinct", "agg_rollup", "win_rank",
    "set_intersect_all", "set_except_all", "fn_try_arith", "call_proc",
    "stream_static_join", "text_decontaminate", "mixture_sample",
    "pack_sequences", "text_chunk_split", "text_unigram_logprob",
    "vec_ivf_index_persisted", "vec_matryoshka_topk", "profile_table",
    "sink_dynamic_overwrite", "udf_grouped_agg", "tf_restore", "tf_clone",
    "mv_incremental_refresh", "tf_verify", "tf_history",
    "sessionize_events", "event_funnel", "retention_cohort",
    "agg_sketch_rollup", "join_bloom_filtered", "agg_approx_topk",
    "win_pattern_detect",
    # --- 2: the 5 changed-key spares ---
    "udf_grouped_map", "agg_having", "agg_stddev_corr",
    "win_frame_rows", "agg_hist_bins",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-11 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-11 fold front, machine-readable: the stalest official
# greens once the r10 fold lands — the r6-gated cohort minus the 4
# members pulled forward as r10 spares (46 keys), in registration
# order. tests/test_smoke.py recomputes the cohort from the
# CORRECTNESS_r*.json files and enforces that this list is exactly
# the stalest-not-in-fold set, so the rotation cannot silently drop a
# stale key. Any NEW key must be inserted into the fold itself
# (growth-freeze rule above), not here.
_NEXT_SWEEP_QUEUE = [
    "agg_bitmap_distinct", "agg_collect", "agg_count_min_sketch",
    "agg_cube", "agg_grouping_sets", "agg_mode", "agg_percentile",
    "agg_pivot", "agg_sketch_setops", "dedup", "distinct_proj",
    "event_attribution", "event_path_analysis", "filter_in_between_like",
    "fn_string", "join_dpp_partition_pruned", "join_theta_range",
    "sample", "sample_stratified_topk", "scan_text",
    "sessionize_incremental", "sessionize_salted", "set_except",
    "set_intersect", "set_union", "set_union_all", "sink_partitioned",
    "sort_multi", "stream_tws_state", "text_substring_dedup",
    "tf_bloom_index", "tf_cdc_updates", "tf_constraints",
    "tf_delete_vacuum", "tf_merge_cow", "tf_stats_prune", "tf_zorder",
    "topk", "ts_ewma", "ts_interpolate_linear", "ts_resample_ffill",
    "ts_rolling_anomaly", "vec_binary_topk", "vec_int8_topk",
    "win_analytic", "win_frame_range",
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
