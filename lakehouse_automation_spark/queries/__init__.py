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
# derives it — never hand-count). Round-8 priority, in order
# (VERDICT r7 asks #1-#2: drain the never-swept backlog completely and
# freeze registry growth below sweep capacity):
#
#   1. The entire 48-key never-swept backlog (round 7's
#      _NEXT_SWEEP_QUEUE, verbatim order). After this round's sweep
#      the never-swept count is 0.
#   2. The 2 spare fold slots go to curate_pipeline (this round's
#      bench watch item, re-measured per BASELINE.md §4, and an
#      r4-stale green — re-greening it starts the r4 freshness wave)
#      and flagship_regional_revenue (the oldest r4 green in
#      registration order).
#
# Growth freeze: round 8 adds at most the spare-slot count of new
# keys; any r8-new key must displace a slot-2 key so it lands INSIDE
# the fold (VERDICT r7 ask #2: never-swept backlog must not regrow).
#
# All 50 fold keys are batch-checked — the wedge-isolation tail rule
# (live-stream keys {tf_stream_ingest, lifecycle_daemon,
# stream_custom_state, stream_stream_join} last) is vacuously
# satisfied; none of the fold keys are live streams.
_SWEEP_ORDER = [
    # --- 1: the 48-key never-swept backlog, round-7 queue order ---
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
    # --- 2: the spare slots — the round's one NEW key (growth-freeze
    # rule: a new key must land inside the fold) and the r4-wave head
    # (this round's bench watch item, re-measured per BASELINE.md §4) ---
    "curate_pipeline", "vec_ivf_index_refresh",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-9 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-9 fold front (VERDICT r7 ask #5), machine-readable. With
# the never-swept backlog fully inside the r8 fold, the queue's job
# changes from "never-swept keys" to "stalest official greens": these
# are the r4-cohort keys (latest official green = round 4) that did
# NOT fit in the r8 fold, in registration order. tests/test_smoke.py
# recomputes the cohort from the CORRECTNESS_r*.json files and
# enforces that this list is exactly the stalest-not-in-fold set, so
# the rotation cannot silently drop a stale key. Any key added after
# the r8 fold froze would be never-swept and must be inserted into
# the fold itself (growth-freeze rule above), not here.
_NEXT_SWEEP_QUEUE = [
    "flagship_regional_revenue", "join_skew_salted", "join_bucketed",
    "join_asof", "join_interval_bucketed", "subq_scalar", "subq_in",
    "subq_exists_correlated", "cte_recursive", "win_rank_pct",
    "fn_bitwise", "agg_median", "fn_levenshtein",
    "agg_approx_distinct", "agg_percentile_approx",
    "sample_hash_split", "fn_datetime", "fn_math", "fn_cond_null",
    "fn_json", "fn_array_map", "fn_explode", "fn_hash", "gen_rows",
    "retention_delete", "poll_new_files", "schedule_microbatch",
    "lifecycle_daemon", "stream_custom_state", "stream_stream_join",
    "text_minhash_pairs", "text_bm25_rank", "vec_ivf_kmeans_topk",
    "vec_neardup_lsh", "vec_pq_topk", "vec_ivf_pq_topk",
    "vec_knn_join", "vec_semantic_doc_dedup", "mm_frame_sample",
    "mm_resize", "mm_audio_resample", "sink_orc", "tf_acid_append",
    "tf_cdc_feed", "tf_schema_evolve", "tf_time_travel",
    "tf_stream_ingest",
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
