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
# derives it — never hand-count). Round-16 priority, in order
# (VERDICT r15 ask #3: the r11 cohort + changed-key spares; registry
# frozen):
#
#   1. The complete 48-key r11-gated cohort (every key whose newest
#      official gate entry is round 11), exactly as round 15's
#      _NEXT_SWEEP_QUEUE pinned it.
#   2. The 2 spare slots go to changed-key re-confirmation
#      (changed-keys-first rule). Four keys changed this round for
#      two slots: text_substring_dedup (single-pass re-plan) sits in
#      the r11 cohort, so its re-gate rides its cohort slot; the two
#      spares go to the other real plan changes — text_bm25_rank
#      (doc-set selection pivoted from the score's sign to the
#      explicit term-match disjunction, ADVICE r15; plus the keyed
#      per_doc persist) and ts_changepoint (totals folded into the
#      cusum window's partitioning after the new plan-lint gate
#      caught its double series derivation). tfidf_keywords' change
#      is persist KEYING only (plan byte-identical, pinned by
#      tests/test_scale_plans.py) and its official entry is
#      r15-fresh, so it keeps the local-green trail
#      (ORACLE_local_r16). The scratch de-race (sinks/_scratch and
#      the warehouse moved under the PID-keyed scratch_base) is path
#      plumbing, not semantics — its keys likewise, and the r12
#      sink/scan cohort is next round's queue anyway.
#
# No live-stream key sits in this fold, so the wedge-isolation block
# constraint is satisfied vacuously. After this round's sweep the
# oldest official entry is >= r12 for every key. Growth freeze:
# round 16 adds ZERO new keys.
_SWEEP_ORDER = [
    # --- 1: the complete r11 cohort (48 keys) ---
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
    # --- 2: the 2 changed-key spares ---
    "text_bm25_rank", "ts_changepoint",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-17 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-17 fold front, machine-readable: once the r16 fold lands,
# the stalest official cohort is the 48 r12-gated keys — queued here
# completely. tests/test_smoke.py recomputes the cohort from the
# CORRECTNESS_r*.json files and enforces that this list is exactly
# the stalest-not-in-fold set, so the rotation cannot silently drop a
# stale key. Any NEW key must be inserted into the fold itself
# (growth-freeze rule above), not here. The cohort is 48 keys for 50
# slots, so round 17 has 2 spare slots for changed-key
# re-confirmation.
_NEXT_SWEEP_QUEUE = [
    "analyze_stats", "bulk_load", "catalog_list", "ddl_exec",
    "event_markov_transitions", "exec_timing", "graph_components",
    "incremental_load", "jdbc_source", "ledger_insert", "ledger_topk",
    "mm_decode_features", "multi_stmt_exec", "retry_exec",
    "sample_weighted", "scan_csv_schema", "scan_json",
    "sink_csv_header", "sink_parquet", "sink_upsert", "sql_to_pandas",
    "storage_mount", "stream_dedup_state", "stream_file_ingest",
    "stream_foreach_batch", "stream_session", "stream_sliding_agg",
    "stream_tumbling_agg", "stream_watermark_late", "table_compact",
    "text_dedup_clusters", "text_fingerprint", "text_lang_id",
    "text_minhash_dedup", "text_ngram_jaccard", "text_pii_redact",
    "text_quality_score", "text_repetition", "text_simhash",
    "text_tokenize_stats", "ts_autocorr", "ts_monthly_growth",
    "udf_pandas_scalar", "udtf_lateral", "vec_cosine_topk",
    "vec_ivf_topk", "vec_neardup_cosine", "win_frame_range",
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
