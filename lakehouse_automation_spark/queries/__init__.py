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
# derives it — never hand-count). Round-12 priority, in order
# (VERDICT r11 ask #2: steady-state rotation, registry frozen):
#
#   1. The entire 47-key r7-gated cohort (round 11's
#      _NEXT_SWEEP_QUEUE — every key whose newest official gate entry
#      is round 7). After this round's sweep the oldest official
#      entry is >= r8.
#   2. The 3 spare slots go to changed-key re-confirmation
#      (changed-keys-first rule), ranked by RESULT impact:
#      ts_monthly_growth (the r12 composed kitchen-sink found its
#      zero-base growth divide — both engine and oracle now NULLIF
#      the base), win_frame_range (the r12 sf1 replica caught the
#      engine's second-truncated frame key diverging from the
#      oracle's fractional epoch on sub-second boundary pairs; both
#      sides now order on exact epoch microseconds), and vec_knn_join
#      (its SQL oracle now re-derives the LSH banding tier from
#      count(*) like adaptive_banding, closing the fixed-tier replay
#      gap the sf1 record had carried since r8 — vec_neardup_lsh, the
#      other consumer of that CTE, is already in the r7 cohort above).
#      Displaced from the spare list: tf_zorder and tf_acid_append —
#      their r12 changes are performance/plumbing with semantics
#      pinned by pytest (zorder persist; publish protocol), both carry
#      fresh official gates (r11/r9), and both passed the full r12
#      robustness matrix; result-changing keys outrank them.
#
# Growth freeze: round 12 adds ZERO new keys.
#
# Wedge isolation: no live-stream key ({tf_stream_ingest,
# lifecycle_daemon, stream_custom_state, stream_stream_join}) is in
# this fold (all re-gated r9), so the rule holds vacuously — the
# stream_* keys below are batch-restatement forms.
_SWEEP_ORDER = [
    # --- 1: the 47-key r7 cohort ---
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
    # --- 2: the 3 changed-key spares ---
    "ts_monthly_growth", "win_frame_range", "vec_knn_join",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-13 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-13 fold front, machine-readable: the stalest official
# greens once the r12 fold lands — the 50-key r8-gated cohort minus
# ts_monthly_growth (pulled forward into the r12 fold as a
# changed-key spare). tests/test_smoke.py recomputes the cohort from
# the CORRECTNESS_r*.json files and enforces that this list is
# exactly the stalest-not-in-fold set, so the rotation cannot
# silently drop a stale key. Any NEW key must be inserted into the
# fold itself (growth-freeze rule above), not here.
_NEXT_SWEEP_QUEUE = [
    "agg_benford_digits", "agg_entropy", "agg_exact_deciles",
    "agg_freq_histogram", "agg_gini", "agg_hhi", "agg_mad_outliers",
    "agg_pareto_8020", "agg_sample_estimate", "agg_skew_kurt",
    "agg_topk_share", "agg_weighted_median", "curate_pipeline",
    "event_ab_test", "event_active_users", "event_attribution_first",
    "event_attribution_linear", "event_conversion_lag",
    "event_cooccurrence", "event_interarrival_stats",
    "graph_assortativity", "graph_jaccard_neighbors", "graph_pagerank",
    "graph_shortest_paths", "graph_triangles", "join_asof_nearest",
    "join_cross", "mm_exact_dedup", "order_basket_lift",
    "project_unpivot", "rfm_segments", "sink_json",
    "text_collocations", "text_rake_keywords", "text_vocab_coverage",
    "text_vocab_stats", "ts_changepoint", "ts_crosscorr",
    "ts_linreg_trend", "ts_seasonality",
    "vec_centroid_drift", "vec_cluster_quality", "vec_dispersion",
    "vec_ivf_index_refresh", "vec_label_outliers",
    "win_cumulative_distinct",
    "win_intervals_overlap", "win_skyline", "win_streaks",
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
