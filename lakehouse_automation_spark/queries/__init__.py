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
# derives it — never hand-count). Round-11 priority, in order
# (VERDICT r10 ask #3: steady-state rotation, registry frozen):
#
#   1. The entire 46-key r6-gated cohort (round 10's
#      _NEXT_SWEEP_QUEUE — every key whose newest official gate entry
#      is round 6). After this round's sweep the oldest official
#      entry is >= r7.
#   2. The 4 spare slots go to changed-key re-confirmation (ask #2's
#      guard-site edits first): flagship_pricing_summary and
#      join_broadcast (the double domain-guard de-dup — idempotent,
#      values cannot change, re-gated anyway), fn_datetime (due_date
#      now ltrims the ISO-expanded '+' that year-10000 date-arithmetic
#      overflow produces — found by the r11 relational time-edge
#      gate), and tf_cdc_feed (the manifest publish now routes through
#      PathIO publish_if_absent — ask #5's conditional-put commit
#      seam, exercised by its create+append+merge commit sequence;
#      also the r10 memory-flagged re-gate priority after its sf0.01
#      oracle fix landed post-r9-gate). Note tf_zorder — the round's
#      other changed-implementation key (rank-based z-values) — is
#      already in the cohort above.
#
# Growth freeze: round 11 adds ZERO new keys.
#
# Wedge isolation: no live-stream key ({tf_stream_ingest,
# lifecycle_daemon, stream_custom_state, stream_stream_join}) is in
# this fold (all re-gated r9), so the rule holds vacuously;
# stream_tws_state's stateful path is the batch-restatement form.
_SWEEP_ORDER = [
    # --- 1: the 46-key r6 cohort ---
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
    # --- 2: the 4 changed-key spares ---
    "flagship_pricing_summary", "join_broadcast", "fn_datetime",
    "tf_cdc_feed",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-12 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-12 fold front, machine-readable: the stalest official
# greens once the r11 fold lands — the full 47-key r7-gated cohort
# (none of its members is an r11 spare). tests/test_smoke.py
# recomputes the cohort from the CORRECTNESS_r*.json files and
# enforces that this list is exactly the stalest-not-in-fold set, so
# the rotation cannot silently drop a stale key. Any NEW key must be
# inserted into the fold itself (growth-freeze rule above), not here.
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
    "text_tokenize_stats", "tfidf_keywords", "ts_autocorr",
    "udf_pandas_scalar", "udtf_lateral", "vec_cosine_topk",
    "vec_ivf_topk", "vec_neardup_cosine",
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
