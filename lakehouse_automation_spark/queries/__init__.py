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
# derives it — never hand-count). Round-7 priority, in order
# (VERDICT r6 ask #1: re-green the r3-stale cohort; after this round
# no key's latest official green predates r4):
#
#   1. table_compact + sink_upsert first — they took the round-5
#      mergeSchema-read rewrite (c76b7bd) without an official
#      re-green since (tf_merge_cow, the third key of that family,
#      was re-greened in the r6 fold).
#   2. The remaining 44 r3-cohort keys, grouped by family in
#      registration order: Tier-A procedural, bounded-await
#      streaming, the r3 text tier, the r3 vec tier, multimodal
#      decode, scan/sink/profiling, and the UDF matrix.
#   3. 4 r4-cohort head keys to start the next freshness wave:
#      flagship_regional_revenue and vec_knn_join (also this round's
#      bench watch items), join_asof, curate_pipeline. The 44-key r4
#      remainder queues for round 8.
#
# All 50 fold keys are batch-checked — the wedge-isolation tail rule
# (live-stream keys {tf_stream_ingest, lifecycle_daemon,
# stream_custom_state, stream_stream_join} last) is vacuously
# satisfied; the bounded-await streaming_batch keys are not live.
_SWEEP_ORDER = [
    # --- 1: the r5-changed CowTable-rewrite keys, never re-greened ---
    "table_compact", "sink_upsert",
    # --- 2: the r3 cohort remainder, family order ---
    "incremental_load", "ledger_insert", "ledger_topk", "retry_exec",
    "sql_to_pandas", "ddl_exec", "multi_stmt_exec", "bulk_load",
    "catalog_list", "storage_mount", "exec_timing",
    "stream_tumbling_agg", "stream_sliding_agg", "stream_session",
    "stream_watermark_late", "stream_dedup_state",
    "stream_file_ingest", "stream_foreach_batch",
    "text_tokenize_stats", "text_lang_id", "text_quality_score",
    "text_fingerprint", "text_exact_dedup", "text_ngram_jaccard",
    "text_dedup_clusters", "text_minhash_dedup", "text_simhash",
    "text_repetition", "text_pii_redact", "tfidf_keywords",
    "vec_cosine_topk", "vec_neardup_cosine", "vec_ivf_topk",
    "mm_decode_features",
    "scan_csv_schema", "scan_json", "sink_parquet", "sink_csv_header",
    "analyze_stats", "jdbc_source",
    "udf_pandas_scalar", "udf_sql_register", "udf_grouped_map",
    "udtf_lateral",
    # --- 3: the round-7 NEW keys (never swept — a new key without an
    # official entry reads as unverified; they take the last four
    # fold slots): relational connected components, daily-volume
    # autocorrelation, the Markov transition matrix, and
    # priority-sampling weighted selection ---
    "graph_components", "ts_autocorr", "event_markov_transitions",
    "sample_weighted",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-8 queue continues in _NEXT_SWEEP_QUEUE below.
]

# Keys added AFTER this round's 50-slot fold froze (the fold is fully
# committed to the r3-stale re-green + the first 4 new keys). These
# are pytest- and local-oracle-green but have never been officially
# swept; they MUST front the next round's fold, before the r4 cohort
# (derive the remainder with tools/sweep_plan.py — never hand-count).
# tests/test_smoke.py enforces that every never-swept key is either
# inside the fold or named here, so nothing lingers unswept invisibly.
_NEXT_SWEEP_QUEUE = [
    "graph_pagerank", "ts_changepoint", "event_cooccurrence",
    "agg_gini", "win_streaks", "ts_seasonality", "agg_entropy",
    "text_rake_keywords", "graph_triangles", "rfm_segments",
    "win_intervals_overlap", "graph_jaccard_neighbors",
    "ts_linreg_trend", "text_collocations",
    "agg_mad_outliers", "agg_skew_kurt", "agg_weighted_median",
    "ts_crosscorr",
    "graph_shortest_paths", "ts_monthly_growth", "vec_dispersion",
    "agg_freq_histogram",
    "agg_sample_estimate", "graph_assortativity",
    "win_cumulative_distinct",
    "vec_cluster_quality", "text_vocab_stats",
    "event_interarrival_stats",
    "event_active_users", "agg_benford_digits", "event_ab_test",
    "agg_exact_deciles", "order_basket_lift", "join_asof_nearest",
    "mm_exact_dedup", "agg_topk_share", "vec_centroid_drift",
    "event_attribution_linear", "win_skyline", "text_vocab_coverage",
    "agg_hhi", "project_unpivot", "event_attribution_first",
    "agg_pareto_8020", "sink_json", "join_cross",
    "vec_label_outliers", "event_conversion_lag",
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
